"""Event-driven closed loop: contact-triggered domains + latency elasticity."""

import jax.numpy as jnp
import numpy as np
import pytest

from srbx import refplan
from srbx.config import LowLevelConfig, MotionConfig, MpcConfig, QpConfig
from srbx.models import a1
from srbx.sim import eventloop
from srbx.sim import wholebody as wb


@pytest.mark.slow
def test_contact_triggered_domains_and_latency_robustness():
    traj = refplan.generate(
        refplan.two_agent_config(loop_size=20_000),
        jnp.asarray([0.0, 0.0, 0.0, -1.0]),
        jnp.asarray([[100.0] * 20, [100.0] * 20]),
    )
    args = (
        MpcConfig(use_sqp=False), LowLevelConfig(), MotionConfig(), QpConfig(),
        wb.SimConfig(), a1.model(), traj.pr[0:2], traj.prd[0:2],
        jnp.asarray([0.0, 0.0]), jnp.asarray([[100.0] * 20, [100.0] * 20]),
    )
    sim, ast, stats = eventloop.run(*args, stand_ticks=800, trot_ticks=1400,
                                    mpc_delay_ticks=0)
    # touchdown fires the domain switch before the 181-tick phase overrun
    assert stats.contact_triggers >= stats.time_triggers
    inner = stats.domain_lengths[1:]
    assert inner and max(inner) < 181 and min(inner) > 120
    q = np.asarray(sim.q)
    assert q[0] > 0.1 and abs(q[1]) < 0.1 and abs(q[2] - 0.28) < 0.02

    # 20 ms HL latency: the stale-Bezier fallback keeps the gait healthy
    sim2, _, stats2 = eventloop.run(*args, stand_ticks=800, trot_ticks=1400,
                                    mpc_delay_ticks=20)
    q2 = np.asarray(sim2.q)
    assert q2[0] > 0.1 and abs(q2[2] - 0.28) < 0.02
    assert stats2.contact_triggers >= 1


@pytest.mark.slow
def test_batched_event_loop_contact_triggers():
    """run_batch_event: per-lane contact triggers fire BEFORE the phase
    overrun (touchdown ~phase 0.94), solutions deliver after the HL latency
    with the stale fallback covering the gap, LL QPs converge."""
    import jax

    from srbx.sim import closedloop as cl

    dtype = jnp.float64
    model = a1.model()
    ref_cfg = refplan.two_agent_config(loop_size=4_000)
    p_start = jnp.asarray([0.0, 0.5, 0.0, -0.5], dtype)
    pobs = jnp.asarray([[100.0] * 20, [100.0] * 20], dtype)
    ref = refplan.generate(ref_cfg, p_start, pobs, dtype=dtype)
    B = 2
    loop = cl.LoopConfig(stand_ticks=400, mpc_latency_ticks=20)
    qp_cfg = QpConfig(abstol=2e-3, reltol=1e-4, reg_primal=1e-6,
                      reg_dual=1e-6, max_iters=12)
    prb = jnp.broadcast_to(ref.pr[0:2], (B, 2, ref.pr.shape[-1]))
    prdb = jnp.broadcast_to(ref.prd[0:2], (B, 2, ref.prd.shape[-1]))
    pobsb = jnp.broadcast_to(pobs, (B,) + pobs.shape)
    a0 = p_start[:2] + jnp.linspace(0, 0.01, B, dtype=dtype)[:, None] \
        * jnp.asarray([1.0, 0.0], dtype)
    res = jax.jit(lambda s: cl.run_batch_event(
        MpcConfig(use_sqp=True, sqp_iters=1), LowLevelConfig(),
        MotionConfig(), qp_cfg, wb.SimConfig(), loop, model,
        prb, prdb, s, pobsb, n_ticks=600, dtype=dtype, backend="xla",
        ll_reduced=True, mpc_period_ticks=20))(a0)

    trig = np.asarray(res.trigger_hist)
    for lane in range(B):
        ticks = np.nonzero(trig[lane])[0]
        assert ticks[0] == 0                      # kick-off replan
        gaps = np.diff(ticks)
        # contact-triggered: every domain ends before the 1.05*172 = 181
        # tick phase overrun, and after the 0.7 phase gate (~120 ticks)
        assert (gaps > 120).all() and (gaps < 181).all(), gaps
    assert int(res.domains.min()) >= 3
    assert float(res.qp_ok.min()) > 0.95
    assert bool(np.isfinite(np.asarray(res.com_hist)).all())
    # standing height held through every event transition
    assert float(np.asarray(res.sim.q)[:, 2].min()) > 0.2
