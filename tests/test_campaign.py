import jax
import jax.numpy as jnp
import numpy as np

from srbx import refplan
from srbx.config import MpcConfig, QpConfig
from srbx.eval import campaign


def test_sample_obstacles_distribution_and_clamp():
    pobs, real = campaign.sample_obstacles(jax.random.PRNGKey(0), 16, 20)
    assert pobs.shape == (16, 2, 20) and real.shape == (16, 2, 20)
    p = np.asarray(pobs)
    assert p[:, 0].min() >= 0.0 and p[:, 0].max() <= 9.0
    assert p[:, 1].min() >= -2.0 and p[:, 1].max() <= 2.0
    r = np.asarray(real)
    assert r[:, 0].min() >= 1.0 and r[:, 0].max() <= 9.0
    assert r[:, 1].min() >= -3.0 and r[:, 1].max() <= 3.0
    assert np.abs(r - p).max() <= 0.6 + 1.0  # clamping can exceed raw noise


def test_small_campaign_runs_and_reports():
    cfg = MpcConfig(use_sqp=True, sqp_iters=2)
    qp_cfg = QpConfig()
    camp = campaign.CampaignConfig(n_agents=2, n_domains=20)
    ref_cfg = refplan.two_agent_config(loop_size=20_000)
    p_start = jnp.asarray([0.0, 0.5, 0.0, -0.5])

    res = jax.jit(
        lambda k: campaign.run_campaign(cfg, qp_cfg, camp, ref_cfg, p_start, k, 4)
    )(jax.random.PRNGKey(1))

    assert res.success.shape == (4, 2)
    assert res.traj.shape == (4, 20, 2, 2)
    assert bool(jnp.isfinite(res.traj).all())
    assert float(res.qp_ok_frac.min()) > 0.9
    # agents start clear of real obstacles (>= 1.0 in x), so the stand phase
    # shouldn't instantly fail every lane
    assert float(res.success.mean()) > 0.0


def test_failure_detector_latches():
    """Place an obstacle on top of agent 0's start: it must fail, with
    fail_distance ~ ||q||, while agent 1 survives."""
    cfg = MpcConfig(use_sqp=False)
    qp_cfg = QpConfig()
    camp = campaign.CampaignConfig(n_agents=2, n_domains=6)
    ref_cfg = refplan.two_agent_config(loop_size=8_000)
    p_start = jnp.asarray([0.0, 0.0, 0.0, -3.0])

    pobs = jnp.asarray([[0.1] + [100.0] * 19, [0.0] + [100.0] * 19])
    ref = refplan.generate(ref_cfg, p_start, pobs)
    res = campaign.run_scenario(
        cfg, qp_cfg, camp, ref, p_start, pobs, jax.random.PRNGKey(2)
    )
    assert not bool(res.success[0])
    assert bool(res.success[1])
    assert float(res.min_clearance[0]) < 0.5
