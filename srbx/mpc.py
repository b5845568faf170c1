"""Per-cycle event-based NMPC — the functional equivalent of
`MPC_dist::run_NMPC` (`src/MPC_dist.cpp:81-454`).

One call = one gait-domain replan for one agent:
  1. slice the N-knot reference window from the APF trajectory
     (copPlanner_eventbase, `:95,702-782`);
  2. pick footholds: nominal stance offsets before locomotion starts,
     current toe xy afterwards (footholdsPlanner, `:97,1204-1266`);
  3. assemble and solve the LIP tracking QP (iSWIFT stage, `:99-361`);
  4. select the closest obstacle as the active CBF circle (`:371-396`),
     optionally adding neighbor agents as circles;
  5. (use_sqp) refine with the CBF/velocity SCP stage (SNOPT stage,
     `:402-427`);
  6. fit the per-domain degree-4 Bezier with continuity through the alpha
     buffer (fitComTrajectory_eventbase, `:450,784-855`).

The function is pure: all evolving quantities live in `MpcCarry`; batch over
agents/scenarios with vmap.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from srbx.config import MpcConfig, QpConfig
from srbx.ocp import (
    assemble,
    condense,
    default_footholds,
    expand,
    expansion,
    reference_window,
    unpack,
)
from srbx.ops import qp
from srbx.ops.bezier import fit_domain_bezier
from srbx import sqp


class MpcCarry(NamedTuple):
    """State that persists across NMPC cycles."""

    gait_domain: jax.Array     # int32 — current domain counter
    alpha_buffer: jax.Array    # (4,) previous cycle's terminal LIP state


class MpcOutput(NamedTuple):
    alpha_com: jax.Array       # (4, 5) Bezier control points for this domain
    states: jax.Array          # (N, 4) planned LIP knots
    inputs: jax.Array          # (N, 2) planned COP knots
    carry: MpcCarry
    qp_converged: jax.Array
    qp_iters: jax.Array
    cbf_margin: jax.Array      # min squared-distance margin over knots
    x: jax.Array | None = None  # full decision vector (batch path; for
    #                             cross-domain warm starts)


def init_carry(agent_initial, dtype=jnp.float64) -> MpcCarry:
    """Fresh carry: alpha buffer at the agent's start pose with zero velocity
    (`MPC_dist::setPstart`, `src/MPC_dist.cpp:1106-1112`)."""
    buf = jnp.asarray(
        [agent_initial[0], 0.0, agent_initial[1], 0.0], dtype=dtype
    )
    return MpcCarry(jnp.zeros((), jnp.int32), buf)


def hold_position_x(cfg: MpcConfig, x0, contact_ind):
    """Emergency 'hold position' decision vector: states pinned at the
    current position with zero velocity, COP at the COM, uniform lambda
    over present legs, zero slack — the safe-fallback target when a lane's
    solve goes non-finite."""
    dtype = x0.dtype
    zero = jnp.zeros((), dtype)
    st = jnp.stack([x0[0], zero, x0[2], zero])
    states = jnp.tile(st, cfg.horizon)
    cop = jnp.tile(jnp.stack([x0[0], x0[2]]), cfg.horizon)
    ci = contact_ind.astype(dtype)
    lam = jnp.tile(ci / jnp.maximum(jnp.sum(ci), 1.0), cfg.ndomain)
    return jnp.concatenate([states, cop, lam, jnp.zeros((1,), dtype)])


def closest_obstacle(q_xy, pobs):
    """Index & position of the obstacle closest to the agent
    (`src/MPC_dist.cpp:371-396`). pobs: (2, n_obs)."""
    d2 = jnp.sum((pobs - q_xy[:, None]) ** 2, axis=0)
    idx = jnp.argmin(d2)
    return pobs[:, idx], jnp.sqrt(d2[idx])


def nmpc_qp_inputs(cfg: MpcConfig, carry: MpcCarry, q_xy, dq_xy, toe_xy,
                   contact_ind, pr_agent, prd_agent, agent_initial):
    """The (x0, ref, foothold_xy, ci) quadruple run_nmpc hands to
    ocp.assemble — exposed so cross-validation harnesses (the iSWIFT parity
    study, srbx.eval.parity) can capture the EXACT QP instances the closed
    loop solves.  Nominal-foothold handoff matches `footholdsPlanner`'s
    start-of-run branch (`src/MPC_dist.cpp:1230-1246`)."""
    dtype = q_xy.dtype
    x0 = jnp.stack([q_xy[0], dq_xy[0], q_xy[1], dq_xy[1]])
    ref = reference_window(pr_agent, prd_agent, 0, carry.gait_domain,
                           cfg.horizon)
    nominal = default_footholds(agent_initial.astype(dtype))
    use_nominal = carry.gait_domain <= 1
    foothold_xy = jnp.where(use_nominal, nominal, toe_xy)
    ci = jnp.where(use_nominal, jnp.ones_like(contact_ind), contact_ind)
    return x0, ref, foothold_xy, ci


def run_nmpc(
    cfg: MpcConfig,
    qp_cfg: QpConfig,
    carry: MpcCarry,
    q_xy,
    dq_xy,
    toe_xy,
    contact_ind,
    pr_agent,
    prd_agent,
    agent_initial,
    pobs_real,
    state_other: Optional[jax.Array] = None,
    agent_circle_eps: float = 0.0,
) -> MpcOutput:
    """One NMPC cycle.

    Args:
      carry: MpcCarry from the previous cycle (or init_carry).
      q_xy, dq_xy: (2,) current COM position / velocity.
      toe_xy: (2, 4) current foothold xy per leg.
      contact_ind: (4,) 0/1 stance mask for the upcoming domain.
      pr_agent, prd_agent: (2, T) this agent's APF position/velocity refs.
      agent_initial: (2,) start position (for the pre-locomotion footholds).
      pobs_real: (2, n_obs) true obstacle positions.
      state_other: optional (4,) neighbor state (x, y, dx, dy) — when given,
        the neighbor is added as a second CBF circle (the distributed
        inter-agent safety constraint).
    """
    dtype = q_xy.dtype
    x0, ref, foothold_xy, ci = nmpc_qp_inputs(
        cfg, carry, q_xy, dq_xy, toe_xy, contact_ind,
        pr_agent, prd_agent, agent_initial)

    data = assemble(cfg, x0, ref, foothold_xy, ci, dtype=dtype)
    if cfg.condensed:
        e_mat, e0 = expansion(cfg, x0, foothold_xy, ci, dtype=dtype)
        data_s = condense(cfg, data, e_mat, e0)
        qp_sol = qp.solve(*data_s, qp_cfg)
        x = expand(e_mat, e0, qp_sol.x)
    else:
        e_mat = e0 = None
        data_s = data
        qp_sol = qp.solve(*data, qp_cfg)
        x = qp_sol.x

    obs_xy, _ = closest_obstacle(q_xy, pobs_real.astype(dtype))
    if state_other is None:
        circles = obs_xy[None, :]
        mask = jnp.ones((1,), dtype)
    else:
        circles = jnp.stack([obs_xy, state_other[:2].astype(dtype)])
        mask = jnp.asarray([1.0, 1.0 if agent_circle_eps > 0 else 0.0], dtype)

    if cfg.use_sqp:
        res = sqp.solve(cfg, qp_cfg, data_s, x, circles, mask,
                        full_data=data, e_mat=e_mat, e0=e0, contact_ind=ci)
        x = res.x

    # Per-lane elasticity (the batched analogue of the reference's
    # stale-solution fallback, `src/LocoWrapper.cpp:1168-1174`): if a lane's
    # solve is non-finite (rare f32 conditioning events through the
    # condensed elimination, or garbage inputs), hold position this cycle
    # instead of poisoning the closed loop.
    x = jnp.where(jnp.isfinite(x).all(), x, hold_position_x(cfg, x0, ci))

    states, inputs, _, _ = unpack(cfg, x)

    knots = jnp.concatenate([carry.alpha_buffer[:, None], states.T], axis=1)
    alpha_com = fit_domain_bezier(knots)
    new_carry = MpcCarry(carry.gait_domain + 1, states[-1])

    margin = jnp.min(sqp.cbf_margins(cfg, x, circles))
    return MpcOutput(
        alpha_com, states, inputs, new_carry, qp_sol.converged, qp_sol.iters, margin
    )


def eval_com_traj(alpha_com, s):
    """Evaluate the fitted domain Bezier at phase s.

    Returns (com_xy (2,), dcom_xy (2,), ddcom_xy (2,)): position rows (0, 2)
    and velocity rows (1, 3) are separate fitted channels; acceleration is
    the phase-derivative of the velocity channel — exactly the convention of
    `getComTrajectoryEventbase` (`src/LocoWrapper.cpp:1147-1174`).
    """
    from srbx.ops.bezier import bezier, bezier_d

    vals = bezier(alpha_com, s)            # (4,)
    dvel = bezier_d(alpha_com[jnp.asarray([1, 3])], s)
    com = vals[jnp.asarray([0, 2])]
    dcom = vals[jnp.asarray([1, 3])]
    return com, dcom, dvel
