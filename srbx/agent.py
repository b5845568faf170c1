"""Per-agent 1 kHz control tick — the functional `LocoWrapper::calcTau`
(`src/LocoWrapper.cpp:148-227`).

Each tick: update the phase variable, detect domain changes (time-triggered
phase overrun or contact-triggered touchdown), evaluate the MPC COM Bezier
(with the s = 1.05 stale-solution fallback when no fresh MPC data is
available, `src/LocoWrapper.cpp:1168-1174`), run the motion planner, build
virtual constraints, and solve the low-level QP.

The HL MPC itself is *not* called here — the tick returns `run_mpc` and the
caller (srbx.sim.closedloop, or a host runtime) supplies fresh data through
`set_mpc_data`, mirroring the reference's shared-store handshake
(`set_MPC_DATA`, `src/LocoWrapper.cpp:1201-1206`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from srbx import lowlevel, motion
from srbx.config import Gait, LowLevelConfig, MotionConfig, QpConfig
from srbx.estimation import contact
from srbx.models import a1, rbd
from srbx.ops import bezier as bz


class AgentState(NamedTuple):
    loco_tick: jax.Array      # () float
    gait_domain: jax.Array    # () int32
    planner: motion.PlannerState
    con: contact.ConState
    mpc_alpha: jax.Array      # (4, 5) COM Bezier control points
    mpc_states: jax.Array     # (4, 4) MPC solution knots (for Raibert vel)
    mpc_available: jax.Array  # () bool
    prev_ddq: jax.Array       # (18,)


def init(motion_cfg: MotionConfig, model: rbd.Model, q0, dtype=jnp.float64) -> AgentState:
    toe = rbd.site_positions(model, q0)[a1.TOE_SITES]
    alpha0 = jnp.zeros((4, 5), dtype)
    alpha0 = alpha0.at[0].set(q0[0])
    alpha0 = alpha0.at[2].set(q0[1])
    return AgentState(
        loco_tick=jnp.zeros((), dtype),
        gait_domain=jnp.zeros((), jnp.int32),
        planner=motion.init(motion_cfg, q0[0:3], toe, dtype),
        con=contact.init(),
        mpc_alpha=alpha0,
        mpc_states=jnp.zeros((4, 4), dtype),
        mpc_available=jnp.asarray(False),
        prev_ddq=jnp.zeros((18,), dtype),
    )


def set_mpc_data(state: AgentState, alpha_com, mpc_states) -> AgentState:
    return state._replace(
        mpc_alpha=alpha_com, mpc_states=mpc_states,
        mpc_available=jnp.asarray(True),
    )


def eval_com_traj(state: AgentState, phase, max_phase=1.05):
    """COM Bezier evaluation with stale fallback: fresh data -> phase,
    otherwise the previous solution clamped at s = 1.05."""
    s = jnp.where(state.mpc_available, phase, max_phase)
    vals = bz.bezier(state.mpc_alpha, s)          # (4,): x, dx, y, dy
    return vals


class TickCtx(NamedTuple):
    """Context carried from tick_build to tick_finish."""

    vc: lowlevel.VcOut
    ll_ctx: lowlevel.LLCtx
    state_pre: AgentState     # new state with prev_ddq not yet updated
    run_mpc: jax.Array


def tick_build(
    ll_cfg: LowLevelConfig,
    motion_cfg: MotionConfig,
    model: rbd.Model,
    gait: Gait,
    state: AgentState,
    q,
    qd,
    foot_force,
    force_new_domain=None,
    # Touchdown threshold: a lightly-resting swing foot at the -1 cm aim
    # point carries ~25-30 N against the compliant ground, stance legs
    # ~60-100 N; 15 N separates touchdown from free swing with margin on
    # both sides (the reference's 8000 is in RaiSim impulse units).
    force_thresh: float = 15.0,
    f_des=None,
    allow_contact_trigger: bool = True,
    reduced: bool = False,
    d_inv=None,
):
    """Everything in a control tick up to (but excluding) the LL-QP solve:
    phase/domain logic, planning, virtual constraints, QP assembly.

    d_inv: optional precomputed D(q)^-1 for the LL build (batch callers
    invert all lanes through one lanes-last SPD kernel, srbx.ops.spd).

    Returns (lowlevel.LLQpData, TickCtx). tick == build -> qp.solve ->
    tick_finish; batch callers vmap this, run ONE batched/fused solve over
    all lanes, then vmap tick_finish (srbx.sim.closedloop batch variants).

    reduced (static): assemble the aux-eliminated LL QP
    (lowlevel.ll_qp_build_reduced, n 43->25) — same eps-optimal solutions,
    much cheaper factorization in the fused kernel; pass the same flag to
    tick_finish.
    """
    dtype = q.dtype
    dom_ticks_gait = float(motion_cfg.trot_dom_ticks)
    if force_new_domain is None:
        force_new_domain = jnp.asarray(False)

    if gait == Gait.TROT:
        phase = state.loco_tick / dom_ticks_gait
    else:
        # every other gait carries its domain length in the planner (stand:
        # timeToStand; walk/pace: 0.2/0.1 s; inplace trot/walk: 0.16/0.3 s;
        # tap: 1.5 s — set on domain change by its plan_* update)
        phase = state.loco_tick / state.planner.dom_ticks

    # ---- domain-change detection (`src/LocoWrapper.cpp:165-200`) ---- #
    time_trigger = jnp.logical_and(
        phase > motion_cfg.max_phase,
        gait not in (Gait.STAND, Gait.POSE),
    )
    time_trigger = jnp.logical_or(time_trigger, force_new_domain)

    con = contact.update(state.con, foot_force, phase, force_thresh)
    contact_trigger = jnp.logical_and(
        con.change_domain, gait not in (Gait.STAND, Gait.POSE)
    )
    if not allow_contact_trigger:
        # fixed-cadence (batched) mode: touchdown still updates the stance
        # mask, but domain advancing is the 172 ms timer (SURVEY.md §7:
        # the contact trigger reduces to the timer in nominal trot).
        contact_trigger = jnp.asarray(False)
    change = jnp.logical_or(time_trigger, contact_trigger)

    run_mpc = change
    mpc_available = jnp.logical_and(state.mpc_available, jnp.logical_not(change))
    gait_domain = state.gait_domain + change.astype(jnp.int32)
    loco_tick = jnp.where(change, 0.0, state.loco_tick)
    phase = jnp.where(change, 0.0, phase)

    # ---- COM trajectory + planning ---- #
    sites = rbd.site_positions(model, q)
    toe_pos = sites[a1.TOE_SITES]
    hip_pos = sites[a1.HIP_SITES]
    planner = state.planner

    if gait == Gait.STAND:
        com_des = motion.stand_com(motion_cfg, planner, phase)
        planner = planner._replace(
            com_des=com_des,
            toe_init=toe_pos.T,
            toe_final=toe_pos.T,
        )
        con = contact.set_des_domain(con, jnp.ones((4,), jnp.int32))
    elif gait in (Gait.WALK, Gait.PACE):
        # velocity-commanded gaits: no MPC — COM reference integrates the
        # ramped desired velocity (`MotionPlanner::updateVel` + the
        # standalone comDes update, `src/MotionPlanner.cpp:188-226,269-305`)
        from srbx.utils import transforms as tf

        rot = tf.rot_xyz(q[3:6])
        planner = motion.com_des_from_velocity(
            planner, q[0:2], rot, motion_cfg.stand_height
        )
        com_f = qd[0:3]
        if gait == Gait.WALK:
            planner = motion.plan_walk(
                motion_cfg, planner, change, toe_pos, com_f, rot,
                motion_cfg.fwd_speed, motion_cfg.lat_speed,
            )
        else:
            planner = motion.plan_pace(
                motion_cfg, planner, change, con.des, toe_pos, com_f, rot,
                motion_cfg.fwd_speed, motion_cfg.lat_speed,
            )
        con = jax.lax.cond(
            change,
            lambda c: contact.set_des_domain(c, planner.des_domain),
            lambda c: c,
            con,
        )
        planner = motion.update_toe_final(
            planner, change, con.ind, con.ind_prev, toe_pos
        )
    elif gait == Gait.POSE:
        # all-stance teach-pendant oscillation about the locked stand pose
        # (`src/MotionPlanner.cpp:99-154`); no domain cycling
        lock = jnp.zeros_like(planner.com_des)
        lock = lock.at[0].set(planner.stand_from[0])
        lock = lock.at[1].set(planner.stand_from[1])
        lock = lock.at[2].set(motion_cfg.stand_height)
        com_des = motion.pose_com(
            motion_cfg, motion_cfg.pose_type, state.loco_tick * 1e-3,
            0.0, lock,
        )
        planner = planner._replace(
            com_des=com_des,
            toe_init=jnp.where(change, toe_pos.T, planner.toe_init),
        )
        con = contact.set_des_domain(con, jnp.ones((4,), jnp.int32))
    elif gait in (Gait.INPLACE_TROT, Gait.INPLACE_WALK, Gait.TAP):
        # in-place bring-up gaits: COM reference held at the stand target
        # (zero-velocity end of the stand Bezier); only the stance table
        # and toe anchors cycle (`src/MotionPlanner.cpp:155-187`)
        if gait == Gait.INPLACE_TROT:
            planner = motion.plan_inplace_trot(
                motion_cfg, planner, change, con.des, toe_pos, hip_pos
            )
        elif gait == Gait.INPLACE_WALK:
            planner = motion.plan_inplace_walk(
                motion_cfg, planner, change, toe_pos
            )
        else:
            planner = motion.plan_tap(motion_cfg, planner, change, toe_pos)
        con = jax.lax.cond(
            change,
            lambda c: contact.set_des_domain(c, planner.des_domain),
            lambda c: c,
            con,
        )
        planner = motion.update_toe_final(
            planner, change, con.ind, con.ind_prev, toe_pos
        )
    else:
        com_vals = eval_com_traj(
            state._replace(mpc_available=mpc_available), phase, motion_cfg.max_phase
        )
        com_traj = jnp.stack(
            [q[0] + 0.001 * com_vals[1], q[1] + 0.001 * com_vals[3],
             com_vals[1], com_vals[3]]
        )
        planner = motion.set_com_des(planner, com_traj, motion_cfg.stand_height)
        planner = motion.plan_trot(
            motion_cfg, planner, change, con.des, toe_pos, qd[0:2],
            state.mpc_states,
        )
        con = jax.lax.cond(
            change,
            lambda c: contact.set_des_domain(c, planner.des_domain),
            lambda c: c,
            con,
        )
        planner = motion.update_toe_final(planner, change, con.ind, con.ind_prev, toe_pos)

    # ---- virtual constraints + low-level QP ---- #
    ci = con.ind.astype(dtype)
    sj = rbd.site_jacobians(model, q)
    jdqd = rbd.site_jdot_qd(model, q, qd)
    traj = lowlevel.TrajIn(
        com_des=planner.com_des,
        toe_init=planner.toe_init,
        step_len=planner.step_len,
        dom_ticks=jnp.asarray(dom_ticks_gait, dtype)
        if gait == Gait.TROT else planner.dom_ticks,
        toe_offset_z=jnp.asarray(motion_cfg.toe_offset_z, dtype),
    )
    vc = lowlevel.virtual_constraints(
        ll_cfg, motion_cfg, q, qd, ci, phase, traj, state.prev_ddq,
        toe_pos, sj[a1.TOE_SITES], jdqd[a1.TOE_SITES],
        hip_pos, sj[a1.HIP_SITES], jdqd[a1.HIP_SITES],
    )
    if f_des is None:
        f_des = jnp.zeros((12,), dtype)
    build = lowlevel.ll_qp_build_reduced if reduced else lowlevel.ll_qp_build
    with jax.default_matmul_precision("highest"):
        data, ll_ctx = build(ll_cfg, model, q, qd, ci, vc, f_des,
                             d_inv=d_inv)

    state_pre = AgentState(
        loco_tick=loco_tick + 1.0,
        gait_domain=gait_domain,
        planner=planner,
        con=con,
        mpc_alpha=state.mpc_alpha,
        mpc_states=state.mpc_states,
        mpc_available=mpc_available,
        prev_ddq=state.prev_ddq,
    )
    return data, TickCtx(vc, ll_ctx, state_pre, run_mpc)


def tick_finish(
    ll_cfg: LowLevelConfig,
    ctx: TickCtx,
    q,
    qd,
    sol_x,
    converged,
    reduced: bool = False,
    delta=None,
):
    """Complete a tick from the solved LL QP: torque math + state update.
    Returns (ll_out, new_state, run_mpc).

    delta: optional precomputed swing operational-space inertia inverse
    (lowlevel.swing_delta_inv), batch-inverted by srbx.ops.spd."""
    finish = lowlevel.ll_qp_finish_reduced if reduced else lowlevel.ll_qp_finish
    with jax.default_matmul_precision("highest"):
        ll_out = finish(ll_cfg, ctx.ll_ctx, q, qd, ctx.vc, sol_x, converged,
                        delta=delta)
    return ll_out, ctx.state_pre._replace(prev_ddq=ll_out.ddq), ctx.run_mpc


def tick(
    ll_cfg: LowLevelConfig,
    motion_cfg: MotionConfig,
    qp_cfg: QpConfig,
    model: rbd.Model,
    gait: Gait,
    state: AgentState,
    q,
    qd,
    foot_force,
    force_new_domain=None,
    force_thresh: float = 15.0,
    f_des=None,
    allow_contact_trigger: bool = True,
):
    """One control tick. gait is static (trace-time); everything else traced.

    Returns (ll_out, new_state, run_mpc).
    """
    from srbx.ops import qp

    data, ctx = tick_build(
        ll_cfg, motion_cfg, model, gait, state, q, qd, foot_force,
        force_new_domain=force_new_domain, force_thresh=force_thresh,
        f_des=f_des, allow_contact_trigger=allow_contact_trigger,
    )
    with jax.default_matmul_precision("highest"):
        sol = qp.solve(data.P, data.c, data.A, data.b, data.G, data.h, qp_cfg)
    return tick_finish(ll_cfg, ctx, q, qd, sol.x, sol.converged)
