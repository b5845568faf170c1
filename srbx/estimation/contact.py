"""Contact estimation / domain-switch logic as masked fixed-shape ops.

Functional port of the reference's bit-mask debouncer
(`src/ContactEst.cpp:3-93`): per leg, a CON_MIN_TIME=10-tick history of the
thresholded foot force; a leg's estimated contact latches on after 10
consecutive contact ticks and off after 10 consecutive airborne ticks;
touchdown only counts toward domain switching after phase 0.7; the domain
changes when all four legs' control bits latch.

The C version packs legs into one integer's bits; here each leg is a lane of
a (4,)-shaped array so the whole estimator vmaps across agents/scenarios.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

CON_MIN_TIME = 10
HIST_MASK = (1 << CON_MIN_TIME) - 1


class ConState(NamedTuple):
    hist: jax.Array        # (4,) int32 — last 10 thresholded samples
    est: jax.Array         # (4,) bool  — debounced contact estimate
    rise: jax.Array        # (4,) bool  — leg has left the ground this domain
    stance: jax.Array      # (4,) bool  — latched stance
    ind: jax.Array         # (4,) int32 — control contact index
    ind_prev: jax.Array    # (4,) int32
    des: jax.Array         # (4,) int32 — desired domain
    change_domain: jax.Array  # () bool
    cnt: jax.Array         # () int32


def init(des=(1, 1, 1, 1)) -> ConState:
    des_arr = jnp.asarray(des, jnp.int32)
    return ConState(
        hist=jnp.full((4,), HIST_MASK, jnp.int32),
        est=jnp.ones((4,), bool),
        rise=jnp.ones((4,), bool),
        stance=jnp.ones((4,), bool),
        ind=des_arr,
        ind_prev=des_arr,
        des=des_arr,
        change_domain=jnp.asarray(False),
        cnt=jnp.asarray(4, jnp.int32),
    )


def update(state: ConState, force, phase, thresh: float = 8000.0) -> ConState:
    """One 1 kHz tick (`ContactEst::updateConState`, `src/ContactEst.cpp:20-67`).

    force: (4,) foot force measurements; phase: scalar phase variable.
    """
    con_now = (force > thresh).astype(jnp.int32)
    hist = ((state.hist << 1) + con_now) & HIST_MASK

    all_on = hist == HIST_MASK
    all_off = hist == 0
    est = jnp.where(all_on, True, jnp.where(all_off, False, state.est))

    phase_gate = phase > 0.7
    stance = jnp.logical_or(state.stance, jnp.logical_and(state.ind > 0, state.rise))
    rise = jnp.logical_or(state.rise, jnp.logical_not(est))
    ctrl = jnp.logical_and(jnp.logical_and(rise, est), phase_gate)
    ctrl = jnp.logical_or(ctrl, stance)

    ind = ctrl.astype(jnp.int32)
    return ConState(
        hist=hist,
        est=est,
        rise=rise,
        stance=stance,
        ind=ind,
        ind_prev=state.ind,
        des=state.des,
        change_domain=jnp.all(ctrl),
        cnt=jnp.sum(ind).astype(jnp.int32),
    )


def set_des_domain(state: ConState, des) -> ConState:
    """Start a new domain (`ContactEst::setDesDomain`, `src/ContactEst.cpp:77-89`)."""
    des_arr = jnp.asarray(des, jnp.int32)
    return ConState(
        hist=state.hist,
        est=state.est,
        rise=des_arr > 0,
        stance=des_arr > 0,
        ind=des_arr,
        ind_prev=state.ind,
        des=des_arr,
        change_domain=jnp.asarray(False),
        cnt=jnp.sum(des_arr).astype(jnp.int32),
    )


def force_domain_change(state: ConState) -> ConState:
    return state._replace(change_domain=jnp.asarray(True))


def impact_detection(phase, total_contact, joint_vel, joint_vel_prev,
                     is_stand, rel_jump: float = 0.02):
    """Legacy impact detector (`FastMPC::impactDetection`,
    `src/fast_MPC.cpp:588-619`): flag an impact — which resets the phase
    clock — when (a) a joint-velocity jump exceeds 2% of the velocity norm
    near phase 1, (b) the phase overruns 1.05, or (c) all four legs are in
    contact mid-swing (early impact). Returns a () bool; callers reset their
    tick counter where the reference zeroes `locoTick_`.
    """
    vel_jump = (
        jnp.linalg.norm(joint_vel - joint_vel_prev)
        > rel_jump * jnp.linalg.norm(joint_vel)
    )
    near_end = jnp.logical_and(phase > 0.95, phase <= 1.05)
    impact = jnp.logical_or(
        jnp.logical_and(near_end, vel_jump),
        jnp.logical_or(phase >= 1.05, total_contact == 4),
    )
    return jnp.logical_and(impact, jnp.logical_not(is_stand))


def prob_contact_update(p_prev, force, foot_z, phase,
                        f_mid: float = 25.0, f_scale: float = 8.0,
                        z_mid: float = 0.02, z_scale: float = 0.01,
                        trans_stay: float = 0.98):
    """Probabilistic contact estimator — the filter the reference stubs out
    with a force threshold (`ContactEst::updateConEst`,
    `src/ContactEst.cpp:69-75`, "temporarily in place of prob kalman").

    A discrete two-state Bayes filter per leg: predict with a sticky
    transition model gated by the gait phase (contact is a-priori likely
    late in swing, unlikely early), then update with sigmoid likelihoods of
    the measured normal force and foot height — the standard probabilistic
    contact fusion (cf. MIT Cheetah). All masked fixed-shape ops; vmaps
    across legs/agents/scenarios.

    Args:
      p_prev: (4,) previous contact probabilities.
      force: (4,) foot force measurements (N).
      foot_z: (4,) foot heights above ground (m).
      phase: () gait phase in [0, ~1.05].
    Returns (4,) posterior contact probabilities.
    """
    # phase-gated prior: expected contact probability from the schedule
    p_phase = jax.nn.sigmoid((phase - 0.75) / 0.08)
    trans_gain = 1.0 - trans_stay
    p_pred = trans_stay * p_prev + trans_gain * p_phase

    # measurement likelihoods
    l_force = jax.nn.sigmoid((force - f_mid) / f_scale)
    l_height = jax.nn.sigmoid((z_mid - foot_z) / z_scale)
    like_c = jnp.clip(l_force * l_height, 1e-6, 1.0)
    like_n = jnp.clip((1.0 - l_force) * (1.0 - l_height), 1e-6, 1.0)

    num = p_pred * like_c
    den = num + (1.0 - p_pred) * like_n
    return num / jnp.maximum(den, 1e-12)
