"""Whole-body loops under scenario-DP shard_map: sharded == unsharded on the
virtual 8-device mesh (the multichip path for the RaiSim-fidelity workload,
`src/A1_Sim_4_agents.cpp`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srbx import refplan
from srbx.config import LowLevelConfig, MotionConfig, MpcConfig, QpConfig
from srbx.models import a1
from srbx.parallel import wholebody_sharded as wbs
from srbx.sim import closedloop
from srbx.sim import wholebody as wb

M = a1.model()
CFGS = (MpcConfig(use_sqp=False), LowLevelConfig(), MotionConfig(),
        QpConfig(max_iters=8), wb.SimConfig())


def _inputs(B):
    ref = refplan.generate(
        refplan.two_agent_config(loop_size=2_000),
        jnp.asarray([0.0, 0.0, 0.0, -1.0]), jnp.full((2, 20), 100.0))
    pr = jnp.broadcast_to(ref.pr[0:2], (B, 2, ref.pr.shape[-1]))
    prd = jnp.broadcast_to(ref.prd[0:2], (B, 2, ref.pr.shape[-1]))
    a0 = jnp.stack([jnp.linspace(0.0, 0.01, B), jnp.zeros(B)], axis=1)
    pobs = jnp.full((B, 2, 20), 100.0)
    return pr, prd, a0, pobs


# --- fast tiny-shape variants (VERDICT r2 item 8): the default suite must
# --- catch sharded != unsharded drift; the slow tests below keep the
# --- larger shapes/coverage.

def test_run_batch_sharded_matches_unsharded_fast():
    B = 8
    loop = closedloop.LoopConfig(stand_ticks=12, n_domains=1,
                                 ticks_per_domain=8)
    pr, prd, a0, pobs = _inputs(B)
    mesh = wbs.make_scen_mesh(8)
    res_s = wbs.run_batch_sharded(mesh, *CFGS, loop, M, pr, prd, a0, pobs,
                                  backend="xla")
    res_u = jax.jit(lambda: closedloop.run_batch(
        *CFGS, loop, M, pr, prd, a0, pobs, backend="xla"))()
    np.testing.assert_allclose(np.asarray(res_s.com_hist),
                               np.asarray(res_u.com_hist), atol=1e-9)
    np.testing.assert_allclose(np.asarray(res_s.sim.q),
                               np.asarray(res_u.sim.q), atol=1e-9)


def test_run_batch_event_sharded_matches_unsharded_fast():
    B = 8
    loop = closedloop.LoopConfig(stand_ticks=12, mpc_latency_ticks=2)
    pr, prd, a0, pobs = _inputs(B)
    mesh = wbs.make_scen_mesh(8)
    res_s = wbs.run_batch_event_sharded(mesh, *CFGS, loop, M, pr, prd, a0,
                                        pobs, n_ticks=12, backend="xla",
                                        mpc_period_ticks=4)
    res_u = jax.jit(lambda: closedloop.run_batch_event(
        *CFGS, loop, M, pr, prd, a0, pobs, n_ticks=12, backend="xla",
        mpc_period_ticks=4))()
    np.testing.assert_allclose(np.asarray(res_s.com_hist),
                               np.asarray(res_u.com_hist), atol=1e-9)
    np.testing.assert_array_equal(np.asarray(res_s.domains),
                                  np.asarray(res_u.domains))


@pytest.mark.xdist_group("heavy")
def test_run_team_batch_sharded_matches_unsharded_fast():
    S, A = 4, 2
    loop = closedloop.LoopConfig(stand_ticks=12, n_domains=1,
                                 ticks_per_domain=8)
    pr1, prd1, _, _ = _inputs(S)
    pr = jnp.broadcast_to(pr1[:, None], (S, A, 2, pr1.shape[-1]))
    prd = jnp.broadcast_to(prd1[:, None], (S, A, 2, pr1.shape[-1]))
    a0 = jnp.broadcast_to(
        jnp.asarray([[0.0, 0.5], [0.0, -0.5]]), (S, A, 2))
    pobs = jnp.full((S, 2, 20), 100.0)
    mesh = wbs.make_scen_mesh(4)
    out_s = wbs.run_team_batch_sharded(mesh, *CFGS, loop, M, pr, prd, a0,
                                       pobs, backend="xla")
    out_u = jax.jit(lambda: closedloop.run_team_batch(
        *CFGS, loop, M, pr, prd, a0, pobs, backend="xla"))()
    for s, u in zip(out_s[1:], out_u[1:]):
        np.testing.assert_allclose(np.asarray(s), np.asarray(u), atol=1e-9)


@pytest.mark.slow
def test_run_batch_sharded_matches_unsharded():
    B = 8
    loop = closedloop.LoopConfig(stand_ticks=60, n_domains=1,
                                 ticks_per_domain=30)
    pr, prd, a0, pobs = _inputs(B)
    mesh = wbs.make_scen_mesh(8)
    res_s = wbs.run_batch_sharded(mesh, *CFGS, loop, M, pr, prd, a0, pobs,
                                  backend="xla")
    res_u = jax.jit(lambda: closedloop.run_batch(
        *CFGS, loop, M, pr, prd, a0, pobs, backend="xla"))()
    np.testing.assert_allclose(np.asarray(res_s.com_hist),
                               np.asarray(res_u.com_hist), atol=1e-9)
    np.testing.assert_allclose(np.asarray(res_s.qp_ok),
                               np.asarray(res_u.qp_ok), atol=1e-12)
    np.testing.assert_allclose(np.asarray(res_s.sim.q),
                               np.asarray(res_u.sim.q), atol=1e-9)


@pytest.mark.slow
def test_run_batch_event_sharded_matches_unsharded():
    """Event loop: per-shard HL-poll gating must leave per-lane results
    identical to the single-device program (the poll output is masked to
    triggered lanes, so extra/missing polls for OTHER lanes don't leak)."""
    B = 8
    loop = closedloop.LoopConfig(stand_ticks=60, mpc_latency_ticks=2)
    pr, prd, a0, pobs = _inputs(B)
    mesh = wbs.make_scen_mesh(8)
    res_s = wbs.run_batch_event_sharded(mesh, *CFGS, loop, M, pr, prd, a0,
                                        pobs, n_ticks=40, backend="xla",
                                        mpc_period_ticks=5)
    res_u = jax.jit(lambda: closedloop.run_batch_event(
        *CFGS, loop, M, pr, prd, a0, pobs, n_ticks=40, backend="xla",
        mpc_period_ticks=5))()
    np.testing.assert_allclose(np.asarray(res_s.com_hist),
                               np.asarray(res_u.com_hist), atol=1e-9)
    np.testing.assert_array_equal(np.asarray(res_s.domains),
                                  np.asarray(res_u.domains))
    np.testing.assert_array_equal(np.asarray(res_s.mpc_solves),
                                  np.asarray(res_u.mpc_solves))


@pytest.mark.slow
def test_run_team_batch_sharded_matches_unsharded():
    S, A = 4, 2
    loop = closedloop.LoopConfig(stand_ticks=60, n_domains=1,
                                 ticks_per_domain=30)
    pr1, prd1, _, _ = _inputs(S)
    pr = jnp.broadcast_to(pr1[:, None], (S, A, 2, pr1.shape[-1]))
    prd = jnp.broadcast_to(prd1[:, None], (S, A, 2, pr1.shape[-1]))
    a0 = jnp.broadcast_to(
        jnp.asarray([[0.0, 0.5], [0.0, -0.5]]), (S, A, 2))
    pobs = jnp.full((S, 2, 20), 100.0)
    mesh = wbs.make_scen_mesh(4)
    out_s = wbs.run_team_batch_sharded(mesh, *CFGS, loop, M, pr, prd, a0,
                                       pobs, backend="xla")
    out_u = jax.jit(lambda: closedloop.run_team_batch(
        *CFGS, loop, M, pr, prd, a0, pobs, backend="xla"))()
    for s, u in zip(out_s[1:], out_u[1:]):
        np.testing.assert_allclose(np.asarray(s), np.asarray(u), atol=1e-9)
