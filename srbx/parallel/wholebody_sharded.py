"""Whole-body closed loops on the device mesh (scenario data-parallel).

The 18-DoF whole-body loops (srbx.sim.closedloop) are per-lane programs: the
only cross-lane coupling is the team loops' neighbor exchange, which lives
INSIDE a scenario. Scenario DP is therefore a pure shard_map over the lane
axis — the RaiSim-fidelity workload (`src/A1_Sim_4_agents.cpp`) scaled over
chips the same way the template campaign already is
(srbx.eval.campaign.run_campaign_batch_sharded), with zero collectives until
the host-side summary.

Semantics notes:
  * run_batch / run_batch_event / run_velocity_gait: every lane independent;
    sharded == unsharded exactly (test-enforced on the virtual mesh).
  * run_batch_event's HL-poll gate (`req.any()`) becomes per-shard: each
    device fires its batched NMPC when any of ITS lanes triggered — the
    natural distributed semantics (each host serves its own robots), and
    per-lane results are unchanged because the poll output is masked to
    triggered lanes anyway.
  * run_team_batch: lanes are (scenario, agent) pairs; scenarios must split
    evenly across devices so each scenario's agent ring stays local to one
    device (the inter-agent broadcast is intra-scenario by construction,
    `include/shared_structs.hpp:94,104`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from srbx.sim import closedloop


def make_scen_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(np.asarray(devs), axis_names=("scen",))


def _check_divisible(b: int, mesh: Mesh, what: str):
    n = mesh.shape["scen"]
    if b % n:
        raise ValueError(f"{what}={b} not divisible by {n} 'scen' devices")


def run_batch_sharded(mesh: Mesh, mpc_cfg, ll_cfg, motion_cfg, qp_cfg,
                      sim_cfg, loop, model, pr_agent, prd_agent,
                      agent_initial, pobs_real, **kwargs):
    """closedloop.run_batch with the lane axis sharded over `mesh` ('scen').
    Same LoopResult, lane for lane."""
    _check_divisible(agent_initial.shape[0], mesh, "batch")

    def local(pr, prd, a0, pobs):
        return closedloop.run_batch(
            mpc_cfg, ll_cfg, motion_cfg, qp_cfg, sim_cfg, loop, model,
            pr, prd, a0, pobs, **kwargs)

    f = jax.jit(jax.shard_map(local, mesh=mesh,
                              in_specs=(P("scen"),) * 4,
                              out_specs=P("scen"), check_vma=False))
    return f(pr_agent, prd_agent, agent_initial, pobs_real)


def run_batch_event_sharded(mesh: Mesh, mpc_cfg, ll_cfg, motion_cfg, qp_cfg,
                            sim_cfg, loop, model, pr_agent, prd_agent,
                            agent_initial, pobs_real, n_ticks: int, **kwargs):
    """closedloop.run_batch_event under scenario DP. The HL poll fires
    per-device (see module docstring); per-lane outputs are unchanged."""
    _check_divisible(agent_initial.shape[0], mesh, "batch")

    def local(pr, prd, a0, pobs):
        return closedloop.run_batch_event(
            mpc_cfg, ll_cfg, motion_cfg, qp_cfg, sim_cfg, loop, model,
            pr, prd, a0, pobs, n_ticks=n_ticks, **kwargs)

    f = jax.jit(jax.shard_map(local, mesh=mesh,
                              in_specs=(P("scen"),) * 4,
                              out_specs=P("scen"), check_vma=False))
    return f(pr_agent, prd_agent, agent_initial, pobs_real)


def run_team_batch_sharded(mesh: Mesh, mpc_cfg, ll_cfg, motion_cfg, qp_cfg,
                           sim_cfg, loop, model, pr, prd, agent_initials,
                           pobs_real, **kwargs):
    """closedloop.run_team_batch under scenario DP: whole scenarios (with
    their agent rings) per device. Returns the same
    (sims, com_ends (D, S, A, 3), margins (D, S, A), llok (D, S))."""
    _check_divisible(agent_initials.shape[0], mesh, "scenarios")

    def local(pr_d, prd_d, a0_d, pobs_d):
        return closedloop.run_team_batch(
            mpc_cfg, ll_cfg, motion_cfg, qp_cfg, sim_cfg, loop, model,
            pr_d, prd_d, a0_d, pobs_d, **kwargs)

    f = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("scen"),) * 4,
        # sims: lane-leading pytree; com_ends/margins (D, S, A); llok (D, S)
        out_specs=(P("scen"), P(None, "scen"), P(None, "scen"),
                   P(None, "scen")),
        check_vma=False))
    return f(pr, prd, agent_initials, pobs_real)


def dryrun(n_devices: int) -> None:
    """Tiny-shape compile+execute of all three sharded whole-body loops on an
    n-device mesh — the driver's multichip validation of the RaiSim-fidelity
    workload (one lane per device, a handful of ticks)."""
    from srbx import refplan
    from srbx.config import (LowLevelConfig, MotionConfig, MpcConfig,
                             QpConfig)
    from srbx.models import a1
    from srbx.sim import wholebody as wb

    dtype = jnp.float32
    model = a1.model()
    mesh = make_scen_mesh(n_devices)
    B = n_devices
    mpc_cfg = MpcConfig(use_sqp=False)
    qp_cfg = QpConfig(max_iters=6)
    cfgs = (mpc_cfg, LowLevelConfig(), MotionConfig(), qp_cfg,
            wb.SimConfig())
    loop = closedloop.LoopConfig(stand_ticks=4, n_domains=1,
                                 ticks_per_domain=4)

    ref = refplan.generate(
        refplan.two_agent_config(loop_size=2_000),
        jnp.asarray([0.0, 0.0, 0.0, -1.0], dtype),
        jnp.full((2, 20), 100.0, dtype), dtype=dtype)
    pr = jnp.broadcast_to(ref.pr[0:2], (B, 2, ref.pr.shape[-1]))
    prd = jnp.broadcast_to(ref.prd[0:2], (B, 2, ref.pr.shape[-1]))
    a0 = jnp.zeros((B, 2), dtype)
    pobs = jnp.full((B, 2, 20), 100.0, dtype)

    n_agents = 2
    prt = jnp.broadcast_to(pr[:, None], (B, n_agents, 2, pr.shape[-1]))
    prdt = jnp.broadcast_to(prd[:, None], (B, n_agents, 2, pr.shape[-1]))
    a0t = jnp.stack([a0, a0 + jnp.asarray([0.0, -1.0], dtype)], axis=1)

    # the three loop programs are independent; trace+compile them on
    # threads (XLA compilation releases the GIL) to bound dryrun latency
    # by the slowest program instead of the sum
    import concurrent.futures as cf

    def _batch():
        res = run_batch_sharded(mesh, *cfgs, loop, model, pr, prd, a0,
                                pobs, dtype=dtype, backend="xla")
        assert bool(jnp.isfinite(res.com_hist).all())
        return ("batch", res.com_hist.shape)

    def _event():
        ev = run_batch_event_sharded(mesh, *cfgs, loop, model, pr, prd, a0,
                                     pobs, n_ticks=4, dtype=dtype,
                                     backend="xla")
        assert bool(jnp.isfinite(ev.com_hist).all())
        return ("event", ev.com_hist.shape)

    def _team():
        sims, com_ends, margins, llok = run_team_batch_sharded(
            mesh, *cfgs, loop, model, prt, prdt, a0t, pobs,
            dtype=dtype, backend="xla")
        assert bool(jnp.isfinite(com_ends).all())
        return ("team", com_ends.shape)

    with cf.ThreadPoolExecutor(max_workers=3) as ex:
        shapes = [f.result() for f in
                  [ex.submit(_batch), ex.submit(_event), ex.submit(_team)]]
    print(f"wholebody_sharded dryrun ok over {n_devices} devices: "
          + ", ".join(f"{k} {s}" for k, s in shapes))
