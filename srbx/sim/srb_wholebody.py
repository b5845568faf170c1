"""SRB-MPC driving the whole-body plant — the FastMPC control stack.

The legacy FastMPC controller maps reduced-model desired ground-reaction
forces to joint torques and runs them on the full robot
(`src/fast_MPC.cpp:506-584` force distribution; `compute` at `:1038-1071`;
the standalone SRB force-update thread `src/forceUpdate.cpp:3-70`). Here the
force source is the convex SRB-MPC (srbx.mpc_srb) and the plant is the
batched 18-DoF compliant-ground simulator (srbx.sim.wholebody):

  MPC grid (cfg.dt):   pack SRB state from (q, qd) -> run_mpc -> GRF plan
  1 kHz ticks:         tau = -J_leg^T f  (stance) + joint PD (swing),
                       zero-order hold on the first-knot forces.

The Jacobian-transpose law is the standard SRB torque mapping (foot pushes
the ground with -f so the ground reacts with f); swing legs track a nominal
joint pose with PD exactly like the reference's swing fallback.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from srbx import mpc_srb
from srbx.config import QpConfig, SrbConfig
from srbx.models import a1, rbd
from srbx.sim import wholebody as wb


class SrbLoopState(NamedTuple):
    sim: wb.SimState
    forces: jax.Array        # (4, 3) zero-order-held GRF command
    x_mpc: jax.Array         # (12,) last packed SRB state


def pack_from_wholebody(model: rbd.Model, q, qd):
    """(q, qd) -> the SRB-MPC 12-state [p v rpy omega].

    COM is approximated by the trunk frame origin (the reference's SRB
    template also anchors at the trunk, `src/forceUpdate.cpp:5-9`)."""
    rpy = q[3:6]
    return jnp.concatenate([q[0:3], qd[0:3], rpy, qd[3:6]])


def torques_from_forces(model: rbd.Model, q, forces, contact_ind,
                        q_ref_joints, qd, kp: float = 25.0, kd: float = 1.0):
    """tau (12,) = -J_leg^T f per stance leg + PD toward q_ref for swing."""
    f_sites = jnp.zeros((len(model.sites), 3), q.dtype).at[a1.TOE_SITES].set(
        forces * contact_ind[:, None]
    )
    tau_full = -rbd.apply_site_forces(model, q, f_sites)
    tau = tau_full[6:]
    swing = 1.0 - contact_ind
    swing_j = jnp.repeat(swing, 3)
    pd = kp * (q_ref_joints - q[6:]) - kd * qd[6:]
    return tau * jnp.repeat(contact_ind, 3) + swing_j * pd


def run_standing(
    cfg: mpc_srb.SrbMpcConfig,
    qp_cfg: QpConfig,
    sim_cfg: wb.SimConfig,
    model: rbd.Model,
    p_des,
    n_mpc_cycles: int = 20,
    push=None,
    push_cycle: int = -1,
):
    """Stand-up-free standing balance: all four legs in stance, the SRB-MPC
    replans every cfg.dt seconds, torques held between plans.

    push: optional (3,) world trunk force applied during `push_cycle` — the
    disturbance-injection hook (`src/A1_Sim.cpp:84-107` analogue).
    Returns (final SimState, (n_cycles, 12) packed-state history).
    """
    dtype = p_des.dtype
    q0 = wb.default_crouch(model, dtype)
    sim = wb.SimState(q0, jnp.zeros((18,), dtype))
    q_ref_joints = q0[6:]
    sched = jnp.ones((cfg.horizon, 4), jnp.int32)
    ci = jnp.ones((4,), dtype)
    ticks_per_cycle = max(1, int(round(cfg.dt * 1000)))
    x_ref = mpc_srb.hold_reference(
        cfg, p_des, jnp.asarray(0.0, dtype), jnp.zeros(3, dtype), dtype
    )

    @jax.jit
    def cycle(sim, base_force):
        x0 = pack_from_wholebody(model, sim.q, sim.qd)
        foot = rbd.site_positions(model, sim.q)[a1.TOE_SITES]
        out = mpc_srb.run_mpc(cfg, qp_cfg, x0, foot, sched, x_ref)

        def tick(s, _):
            tau = torques_from_forces(
                model, s.q, out.forces[0], ci, q_ref_joints, s.qd
            )
            return wb.step(sim_cfg, model, s, tau, base_force=base_force), None

        sim2, _ = jax.lax.scan(tick, sim, None, length=ticks_per_cycle)
        return sim2, x0

    zero = jnp.zeros(3, dtype)
    hist = []
    for k in range(n_mpc_cycles):
        bf = push if (push is not None and k == push_cycle) else zero
        sim, x0 = cycle(sim, bf)
        hist.append(x0)
    return sim, jnp.stack(hist)
