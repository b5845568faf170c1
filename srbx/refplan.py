"""Artificial-potential-field multi-agent reference planner.

Replaces the reference's init-time APF rollouts (`src/MPC_dist.cpp:930-1104`,
4-agent; `src/LocoWrapper.cpp:254-432`, 2-agent): a 100k-step damped
double-integrator rollout under attractive / repulsive / Lennard-Jones
forces, downsampled 40x into per-grid reference knots (Pr, Prd).

The reference hard-codes its discrete matrices; they correspond exactly to
the ZOH discretization of  q̈ = (F - c q̇)/m  with (c=600, m=8) for the
2-agent planner and (c=550, m=8) for the 4-agent one, at T ≈ 1.063 ms
(verified to ~1e-12 on the A entries; the reference's B position coupling
differs ~1.4% from exact ZOH — we use the exact closed form).

TPU-native structure: the time loop is a `lax.scan`; per-step forces are a
handful of vectorized ops over the agent axis; scenarios batch with vmap.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from srbx.config import RefPlanConfig


class RefTraj(NamedTuple):
    pr: jax.Array    # (2*n_agents, T) downsampled positions
    prd: jax.Array   # (2*n_agents, T) downsampled velocities


@functools.lru_cache(maxsize=None)
def discretize(c: float, m: float, ts: float):
    """Exact ZOH of the damped double integrator, per axis:
    Ad = [[1, (1-e)/a], [0, e]], Bd = [[(a ts - 1 + e)/(a^2 m)], [(1-e)/(a m)]]
    with a = c/m, e = exp(-a ts)."""
    a = c / m
    e = np.exp(-a * ts)
    ad = np.array([[1.0, (1.0 - e) / a], [0.0, e]])
    bd = np.array([[(a * ts - 1.0 + e) / (a * a * m)], [(1.0 - e) / (a * m)]])
    return ad, bd


def _forces(cfg: RefPlanConfig, pos, vel, pobs):
    """APF force per agent. pos, vel: (n_agents, 2); pobs: (n_obs, 2).

    Matches `src/MPC_dist.cpp:986-1036`: attraction to the goal, obstacle
    repulsion inside dmin, Lennard-Jones 6-12 inter-agent interaction, and
    force zeroing within 1 mm of the goal.
    """
    goal = jnp.asarray(cfg.goal, pos.dtype)
    to_goal = pos - goal
    d_goal = jnp.linalg.norm(to_goal, axis=-1, keepdims=True)
    f_att = -cfg.alpha * to_goal / jnp.maximum(d_goal, 1e-12)

    # obstacles: (n_agents, n_obs, 2)
    diff = pos[:, None, :] - pobs[None, :, :]
    d = jnp.linalg.norm(diff, axis=-1)
    rep_mag = jnp.where(
        d < cfg.dmin,
        cfg.eta * (1.0 / jnp.maximum(d, 1e-9) - 1.0 / cfg.dmin) / jnp.maximum(d, 1e-9) ** 2,
        0.0,
    )
    f_rep = jnp.sum(
        rep_mag[..., None] * diff / jnp.maximum(d, 1e-9)[..., None], axis=1
    )

    # Lennard-Jones inter-agent: (n_agents, n_agents, 2). Self-pairs are
    # masked out, but their distance must be set to a benign value BEFORE
    # the high powers — d^13 at the tiny guard underflows f32 to 0 and the
    # resulting inf would turn into NaN under the 0-mask.
    adiff = pos[:, None, :] - pos[None, :, :]
    ad = jnp.linalg.norm(adiff, axis=-1)
    not_self = 1.0 - jnp.eye(pos.shape[0], dtype=pos.dtype)
    ad_safe = jnp.maximum(jnp.where(not_self > 0, ad, 1.0), 1e-4)
    eps, sig = cfg.lj_epsilon, cfg.lj_sigma
    lj_mag = -4.0 * eps * (
        6.0 * sig**6 / ad_safe**7 - 12.0 * sig**12 / ad_safe**13
    )
    f_agent = jnp.sum(
        (lj_mag * not_self)[..., None] * adiff / ad_safe[..., None], axis=1
    )

    f = f_att + f_rep + f_agent
    return jnp.where(d_goal < 0.001, 0.0, f)


def resolve_matrices(cfg: RefPlanConfig, dtype=jnp.float64):
    """Resolve the per-axis discrete (Ad, Bd) for a planner config.

    Reference-matrix mode (cfg.ad_ref set) uses the literal hard-coded
    discretization (`src/MPC_dist.cpp:945-960` / `src/LocoWrapper.cpp:265-279`)
    for bit-reproduction of the checked-in Sim_Outputs logs; otherwise the
    exact ZOH closed form. Shared by `generate` and `rollout_window` so the
    production planner and the parity-validation path cannot desynchronize.
    """
    if cfg.ad_ref:
        ad = np.array([[1.0, cfg.ad_ref[0]], [0.0, cfg.ad_ref[1]]])
        bd = np.array([[cfg.bd_ref[0]], [cfg.bd_ref[1]]])
    else:
        ad, bd = discretize(cfg.damping_c, cfg.mass_m, cfg.ts)
    return jnp.asarray(ad, dtype), jnp.asarray(bd, dtype)


def _make_step(cfg: RefPlanConfig, ad, bd, pobs_t, dtype, record: bool):
    """One APF rollout step (forces + ramp + damped double integrator),
    shared by `generate` (record=True: emits the pre-step state for the
    downsampled history) and `rollout_window` (record=False)."""

    def step(carry, i):
        pos, vel = carry
        f = _forces(cfg, pos, vel, pobs_t)
        if cfg.ramp_up_iters > 0:
            scale = jnp.minimum(i.astype(dtype) / cfg.ramp_up_iters, 1.0)
            f = f * scale
        # per-axis damped double integrator
        pos_n = ad[0, 0] * pos + ad[0, 1] * vel + bd[0, 0] * f
        vel_n = ad[1, 1] * vel + bd[1, 0] * f
        return (pos_n, vel_n), ((pos, vel) if record else None)

    return step


def generate(cfg: RefPlanConfig, p_start, pobs, dtype=jnp.float64,
             return_raw: bool = False) -> RefTraj:
    """Roll the APF planner and downsample.

    p_start: (2*n_agents,) starting xy per agent; pobs: (2, n_obs).
    Returns RefTraj with T = loop_size // downsample knots.
    return_raw additionally returns the full (loop_size, na, 2) position /
    velocity rollouts (used by scripts/reproduce_hlpath.py to reproduce the
    reference log's off-by-one tail knots, which are RAW rollout states —
    `src/MPC_dist.cpp:1045-1061` reads two columns past the downsampled
    prefix of its in-place-overwritten buffer).
    """
    na = cfg.n_agents
    ad, bd = resolve_matrices(cfg, dtype)
    pobs_t = pobs.T.astype(dtype)              # (n_obs, 2)

    pos0 = p_start.reshape(na, 2).astype(dtype)
    vel0 = jnp.zeros_like(pos0)

    step = _make_step(cfg, ad, bd, pobs_t, dtype, record=True)
    _, (pos_hist, vel_hist) = jax.lax.scan(
        step, (pos0, vel0), jnp.arange(cfg.loop_size)
    )
    # downsample 40x; the reference then reads knots starting at downsampled
    # column 2 (`src/MPC_dist.cpp:1044-1061` reads q cols 2..), a 2-knot
    # lead-in we reproduce by shifting and edge-padding the tail.
    ds = pos_hist[:: cfg.downsample]           # (T, na, 2)
    dsv = vel_hist[:: cfg.downsample]
    ds = jnp.concatenate([ds[2:], ds[-1:], ds[-1:]], axis=0)
    dsv = jnp.concatenate([dsv[2:], dsv[-1:], dsv[-1:]], axis=0)

    pr = ds.transpose(1, 2, 0).reshape(2 * na, -1)
    prd = dsv.transpose(1, 2, 0).reshape(2 * na, -1)
    if return_raw:
        return RefTraj(pr, prd), (pos_hist, vel_hist)
    return RefTraj(pr, prd)


def rollout_window(cfg: RefPlanConfig, pos0, vel0, pobs, n_steps: int,
                   start_iter: int = 0, dtype=jnp.float64):
    """Integrate the APF dynamics for `n_steps` from an arbitrary state.

    pos0, vel0: (n_agents, 2); pobs: (2, n_obs). Used for multiple-shooting
    validation against the reference's checked-in `Sim_Outputs/HLPath.txt` /
    `HLVelocity.txt` knots (40 rollout steps separate consecutive knots).
    Returns (pos, vel) after n_steps.
    """
    ad, bd = resolve_matrices(cfg, dtype)
    pobs_t = jnp.asarray(pobs, dtype).T

    step = _make_step(cfg, ad, bd, pobs_t, dtype, record=False)
    (pos, vel), _ = jax.lax.scan(
        step, (jnp.asarray(pos0, dtype), jnp.asarray(vel0, dtype)),
        jnp.arange(start_iter, start_iter + n_steps))
    return pos, vel


# The obstacle field that generated the checked-in `Sim_Outputs/HLPath.txt` /
# `HLVelocity.txt` logs. The field is recorded NOWHERE in the reference
# source — the active "EXP 03" field (`src/A1_Sim_4_agents.cpp:869-870`)
# does not reproduce the logs (agents pass within 0.19 m of its obstacles,
# which the published repulsion law forbids). It was RECOVERED from the log
# itself by inverse optimization (fitting pipeline:
# scripts/recover_hlpath_scenario.py; validation: scripts/reproduce_hlpath.py):
# per-knot implied forces identify the published constants exactly
# (alpha=150, eta=400, eps=60, sigma=1, dmin=1 — `src/MPC_dist.cpp:932-933`)
# and a 9-obstacle field fitted by multiple shooting over all 2420 knots
# reproduces every knot-to-knot transition to 0.57 mm rms / 5.6 mm max
# (docs/HLPATH_REPRO.json).
HLPATH_RECOVERED_POBS = np.array([
    [3.4161, 3.3749, 6.4204, 1.4440, 3.0490, 0.4636, 7.0913, 5.1301, 10.9549],
    [-0.3334, 0.7543, -0.9941, 0.6260, 1.7799, -1.2532, 1.6365, 1.9120, -0.4131],
])


def two_agent_config(reference_matrices: bool = False, **kw) -> RefPlanConfig:
    """2-agent planner constants (`src/LocoWrapper.cpp:256-257` + derived
    discretization, see module docstring). reference_matrices=True uses the
    literal hard-coded Ad/Bd (`src/LocoWrapper.cpp:265-279`) instead of
    exact ZOH."""
    base = dict(
        n_agents=2, alpha=100.0, eta=200.0, dmin=2.0, lj_epsilon=1.0,
        lj_sigma=0.75, ramp_up_iters=0, damping_c=600.0, mass_m=8.0,
        ts=0.0010630627843875393,
    )
    if reference_matrices:
        base.update(
            ad_ref=(0.001021788129226, 0.923365890308039),
            bd_ref=(0.000000067853117956, 0.000127723516153268),
        )
    base.update(kw)
    return RefPlanConfig(**base)


def four_agent_config(reference_matrices: bool = False, **kw) -> RefPlanConfig:
    """4-agent planner constants (`src/MPC_dist.cpp:932-933,942-960`).
    reference_matrices=True uses the literal hard-coded Ad/Bd
    (`src/MPC_dist.cpp:945-960`) instead of exact ZOH."""
    base = dict(
        n_agents=4, alpha=150.0, eta=400.0, dmin=1.0, lj_epsilon=60.0,
        lj_sigma=1.0, ramp_up_iters=1000, damping_c=550.0, mass_m=8.0,
        ts=0.0010629728231878717,
    )
    if reference_matrices:
        base.update(
            ad_ref=(0.001025061239872, 0.929527039758809),
            bd_ref=(0.000000068070472960, 0.000128132654983983),
        )
    base.update(kw)
    return RefPlanConfig(**base)
