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


def test_chunked_campaign_matches_direct():
    """run_campaign_chunked == per-chunk direct calls, concatenated."""
    import jax

    cfg = MpcConfig(use_sqp=False)
    qp_cfg = QpConfig(max_iters=8, abstol=1e-6, reltol=1e-6,
                      reg_primal=1e-9, reg_dual=1e-9)
    camp = campaign.CampaignConfig(n_agents=2, n_domains=3)
    ref_cfg = refplan.two_agent_config(loop_size=2_000)
    p_start = jnp.asarray([0.0, 0.5, 0.0, -0.5])
    key = jax.random.key(7)

    chunked = campaign.run_campaign_chunked(
        cfg, qp_cfg, camp, ref_cfg, p_start, key, 4, max_chunk=2
    )
    keys = jax.random.split(key, 2)
    direct = [
        campaign.run_campaign(cfg, qp_cfg, camp, ref_cfg, p_start, k, 2)
        for k in keys
    ]
    assert chunked.success.shape[0] == 4
    np.testing.assert_allclose(
        np.asarray(chunked.min_clearance[0:2]),
        np.asarray(direct[0].min_clearance),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(chunked.min_clearance[2:4]),
        np.asarray(direct[1].min_clearance),
        rtol=1e-6,
    )


def test_batch_campaign_matches_per_agent():
    """run_campaign_batch (the fused-path restructure) must reproduce
    run_campaign: same wiring (agent/scenario lane layout, obstacle mapping,
    neighbor roll), same failure accounting.

    Tolerances: with an ACTIVE CBF constraint the 2-iteration SCP amplifies
    batching-order rounding — vmapped vs unbatched runs of the *identical*
    per-agent math already differ by ~3e-3 per domain (measured; the
    linearization point moves, the active knot set flips). So exact
    agreement is asserted only for the well-conditioned stand domains; the
    rest at closed-loop tolerance. A wiring bug (swapped lanes, wrong
    obstacles) would show as O(1) error."""
    cfg = MpcConfig(use_sqp=True, sqp_iters=2)
    qp_cfg = QpConfig()
    camp = campaign.CampaignConfig(n_agents=2, n_domains=12)
    ref_cfg = refplan.two_agent_config(loop_size=8_000)
    p_start = jnp.asarray([0.0, 0.5, 0.0, -0.5])
    key = jax.random.PRNGKey(3)

    ref = campaign.run_campaign(cfg, qp_cfg, camp, ref_cfg, p_start, key, 4)
    bat = campaign.run_campaign_batch(
        cfg, qp_cfg, camp, ref_cfg, p_start, key, 4, backend="xla"
    )
    np.testing.assert_array_equal(np.asarray(ref.success), np.asarray(bat.success))
    # 1e-7: the KKT refinement rounds (QpConfig.kkt_refine_iters) add extra
    # vmapped-vs-unbatched matmul chains, lifting the benign rounding floor
    # of the stand domains from ~1e-12 to ~1e-8.
    np.testing.assert_allclose(
        np.asarray(ref.traj[:, :2]), np.asarray(bat.traj[:, :2]), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(ref.traj), np.asarray(bat.traj), atol=3e-2
    )
    np.testing.assert_allclose(
        np.asarray(ref.min_clearance), np.asarray(bat.min_clearance), atol=3e-2
    )
    np.testing.assert_allclose(
        np.asarray(ref.qp_ok_frac), np.asarray(bat.qp_ok_frac), atol=1e-9
    )


def test_batch_campaign_inter_agent_cbf_runs():
    cfg = MpcConfig(use_sqp=True, sqp_iters=1)
    qp_cfg = QpConfig()
    camp = campaign.CampaignConfig(
        n_agents=2, n_domains=8, inter_agent_cbf=True
    )
    ref_cfg = refplan.two_agent_config(loop_size=8_000)
    p_start = jnp.asarray([0.0, 0.5, 0.0, -0.5])
    res = campaign.run_campaign_batch(
        cfg, qp_cfg, camp, ref_cfg, p_start, jax.random.PRNGKey(4), 2,
        backend="xla",
    )
    assert bool(jnp.isfinite(res.traj).all())
    assert res.success.shape == (2, 2)


def test_batch_campaign_warm_start_runs_and_agrees():
    """warm_start_qp threads the previous domain's solution into the first
    QP; statistics must agree with the cold path (same optima)."""
    cfg = MpcConfig(use_sqp=False)
    qp_cfg = QpConfig()
    camp = campaign.CampaignConfig(n_agents=2, n_domains=8)
    ref_cfg = refplan.two_agent_config(loop_size=8_000)
    p_start = jnp.asarray([0.0, 0.5, 0.0, -0.5])
    key = jax.random.PRNGKey(9)

    cold = campaign.run_campaign_batch(
        cfg, qp_cfg, camp, ref_cfg, p_start, key, 4, backend="xla")
    warm = campaign.run_campaign_batch(
        cfg, qp_cfg, camp, ref_cfg, p_start, key, 4, backend="xla",
        warm_start_qp=True)
    np.testing.assert_array_equal(
        np.asarray(cold.success), np.asarray(warm.success))
    np.testing.assert_allclose(
        np.asarray(cold.traj), np.asarray(warm.traj), atol=1e-4)
