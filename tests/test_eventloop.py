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
