"""Event-driven single-lane closed loop — the faithful reproduction of the
reference's sim semantics (`src/A1_Sim.cpp:1193-1217` + `controller0`).

Unlike the batched fixed-cadence loops (srbx.sim.closedloop), domains here
end when the CONTACT TRIGGER fires (all stance legs latch after the phase
gate) or on phase overrun — exactly `LocoWrapper::calcTau`'s event logic —
and the NMPC replans at that event, optionally `mpc_delay_ticks` later (the
HL thread latency) with the stale-Bezier fallback covering the gap.

Host-driven (a Python loop over jitted ticks): this is the deployment shape
for a single robot — the analogue of running on the robot's host PC — and
the validation harness for the event machinery that the batched loops
approximate with timers.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from srbx import agent as agent_mod
from srbx import mpc as mpc_mod
from srbx.config import Gait, LowLevelConfig, MotionConfig, MpcConfig, QpConfig
from srbx.models import a1, rbd
from srbx.sim import wholebody as wb


@dataclasses.dataclass
class EventLoopStats:
    domain_lengths: list
    contact_triggers: int
    time_triggers: int
    mpc_solves: int
    com_track: np.ndarray


def run(
    mpc_cfg: MpcConfig,
    ll_cfg: LowLevelConfig,
    motion_cfg: MotionConfig,
    qp_cfg: QpConfig,
    sim_cfg: wb.SimConfig,
    model: rbd.Model,
    pr_agent,
    prd_agent,
    agent_initial,
    pobs_real,
    stand_ticks: int = 800,
    trot_ticks: int = 2000,
    mpc_delay_ticks: int = 0,
):
    """Stand up, then trot with event-based domain switching."""
    dtype = pr_agent.dtype
    q0 = wb.default_crouch(model, dtype)
    q0 = q0.at[0:2].add(agent_initial)
    sim = wb.SimState(q0, jnp.zeros((18,), dtype))
    ast = agent_mod.init(motion_cfg, model, q0, dtype)
    ast = ast._replace(planner=ast.planner._replace(
        stand_from=q0[0:3], dom_ticks=jnp.asarray(float(stand_ticks), dtype)))
    mcarry = mpc_mod.init_carry(agent_initial, dtype)

    @jax.jit
    def stand_tick(sim, ast):
        force = wb.foot_force_measurement(sim_cfg, model, sim)
        ll_out, ast, _ = agent_mod.tick(
            ll_cfg, motion_cfg, qp_cfg, model, Gait.STAND, ast,
            sim.q, sim.qd, force)
        return wb.step(sim_cfg, model, sim, ll_out.tau), ast

    @jax.jit
    def trot_tick(sim, ast, force_new):
        force = wb.foot_force_measurement(sim_cfg, model, sim)
        ll_out, ast, run_mpc = agent_mod.tick(
            ll_cfg, motion_cfg, qp_cfg, model, Gait.TROT, ast,
            sim.q, sim.qd, force,
            force_new_domain=force_new, allow_contact_trigger=True)
        return wb.step(sim_cfg, model, sim, ll_out.tau), ast, run_mpc

    @jax.jit
    def replan(sim, ast, mcarry):
        toe_xy = rbd.site_positions(model, sim.q)[a1.TOE_SITES][:, 0:2].T
        # the replan runs AFTER the tick that switched the domain, so
        # con.des already holds the stance diagonal the MPC must plan with
        # (the reference order: setDesDomain then run_NMPC,
        # `src/A1_Sim.cpp:227-234`).
        ci = ast.con.des.astype(dtype)
        out = mpc_mod.run_nmpc(
            mpc_cfg, qp_cfg, mcarry, sim.q[0:2], sim.qd[0:2], toe_xy, ci,
            pr_agent, prd_agent, agent_initial, pobs_real)
        return out

    for _ in range(stand_ticks):
        sim, ast = stand_tick(sim, ast)

    stats = EventLoopStats([], 0, 0, 0, None)
    com = []
    pending_mpc = None      # (ticks_until_available, output)
    last_dom = int(ast.gait_domain)
    ticks_in_domain = 0
    force_new = True
    for k in range(trot_ticks):
        prev_phase = float(ast.loco_tick) / motion_cfg.trot_dom_ticks
        sim, ast, run_mpc = trot_tick(sim, ast, jnp.asarray(force_new))
        force_new = False
        ticks_in_domain += 1
        com.append(np.asarray(sim.q[0:3]))

        if bool(run_mpc):
            if prev_phase > motion_cfg.max_phase or ticks_in_domain <= 1:
                stats.time_triggers += 1
            else:
                stats.contact_triggers += 1
            stats.domain_lengths.append(ticks_in_domain)
            ticks_in_domain = 0
            out = replan(sim, ast, mcarry)
            mcarry = out.carry
            stats.mpc_solves += 1
            pending_mpc = (mpc_delay_ticks, out)

        if pending_mpc is not None:
            delay, out = pending_mpc
            if delay <= 0:
                ast = agent_mod.set_mpc_data(ast, out.alpha_com, out.states)
                pending_mpc = None
            else:
                pending_mpc = (delay - 1, out)

    stats.com_track = np.stack(com)
    return sim, ast, stats
