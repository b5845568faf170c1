"""Multi-agent full-fidelity integration: 2 whole-body robots with
inter-agent CBF coupling (the distributed constraint of the paper)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srbx import refplan
from srbx.config import LowLevelConfig, MotionConfig, MpcConfig, QpConfig
from srbx.models import a1
from srbx.sim import closedloop
from srbx.sim import wholebody as wb


@pytest.mark.slow
def test_two_agent_team_trots_without_collision():
    model = a1.model()
    p_start = jnp.asarray([0.0, 0.6, 0.0, -0.6])
    pobs = jnp.asarray([[100.0] * 20, [100.0] * 20])
    traj = refplan.generate(
        refplan.two_agent_config(loop_size=20_000), p_start, pobs
    )
    pr = traj.pr.reshape(2, 2, -1)
    prd = traj.prd.reshape(2, 2, -1)
    agent_initials = p_start.reshape(2, 2)

    sims, com_ends, margins, llok = jax.jit(lambda: closedloop.run_team(
        MpcConfig(use_sqp=True, sqp_iters=2), LowLevelConfig(), MotionConfig(),
        QpConfig(), wb.SimConfig(),
        closedloop.LoopConfig(stand_ticks=800, n_domains=8), model,
        pr, prd, agent_initials, pobs,
    ))()

    q = np.asarray(sims.q)            # (2, 18)
    assert np.isfinite(q).all()
    # both agents advance and stay upright
    assert (q[:, 0] > 0.1).all(), f"x: {q[:, 0]}"
    assert np.abs(q[:, 3:6]).max() < 0.15
    assert np.abs(q[:, 2] - 0.28).max() < 0.03
    # inter-agent separation retained (started 1.2 m apart)
    sep = np.linalg.norm(q[0, 0:2] - q[1, 0:2])
    assert sep > 0.8, f"agents converged dangerously: sep={sep}"
    # planned-knot CBF margins respected every domain
    assert float(np.asarray(margins).min()) >= MpcConfig().cbf_eps - 1e-3
    assert float(np.asarray(llok).min()) > 0.95


@pytest.mark.slow
def test_run_team_batch_matches_run_team():
    """Scenario-batched team loop (S=2 copies of the same scenario) matches
    the single-scenario run_team closed loop."""
    import numpy as np
    from srbx import refplan
    from srbx.config import (LowLevelConfig, MotionConfig, MpcConfig,
                             QpConfig)
    from srbx.models import a1
    from srbx.sim import closedloop, wholebody as wb

    M = a1.model()
    na = 2
    p_start = jnp.asarray([0.0, 0.5, 0.0, -0.5])
    pobs = jnp.asarray([[100.0] * 20, [100.0] * 20])
    ref = refplan.generate(refplan.two_agent_config(loop_size=8_000),
                           p_start, pobs)
    pr = ref.pr.reshape(na, 2, -1)
    prd = ref.prd.reshape(na, 2, -1)
    a0 = p_start.reshape(na, 2)
    loop = closedloop.LoopConfig(stand_ticks=150, n_domains=2,
                                 ticks_per_domain=30)
    cfgs = (MpcConfig(use_sqp=False), LowLevelConfig(), MotionConfig(),
            QpConfig(), wb.SimConfig())

    sims1, com1, mar1, ok1 = jax.jit(lambda: closedloop.run_team(
        cfgs[0], cfgs[1], cfgs[2], cfgs[3], cfgs[4], loop, M,
        pr, prd, a0, pobs))()

    S = 2
    prb = jnp.stack([pr] * S)
    prdb = jnp.stack([prd] * S)
    a0b = jnp.stack([a0] * S)
    pobsb = jnp.stack([pobs] * S)
    sims2, com2, mar2, ok2 = jax.jit(lambda: closedloop.run_team_batch(
        cfgs[0], cfgs[1], cfgs[2], cfgs[3], cfgs[4], loop, M,
        prb, prdb, a0b, pobsb, backend="xla"))()

    # both scenario copies identical, and equal to the per-lane loop
    np.testing.assert_allclose(np.asarray(com2[:, 0]), np.asarray(com2[:, 1]),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(com2[:, 0]), np.asarray(com1),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(mar2[:, 0]), np.asarray(mar1),
                               atol=1e-2)
    assert float(jnp.mean(ok2)) > 0.95
