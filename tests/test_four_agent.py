"""4-agent team configuration (the A1_Sim_4_agents workload, BASELINE
config 4): APF planning, campaign scenario, and inter-agent CBF circles."""

import jax
import jax.numpy as jnp
import numpy as np

from srbx import refplan
from srbx.config import MpcConfig, QpConfig
from srbx.eval import campaign


def test_four_agent_apf_and_campaign_scenario():
    ref_cfg = refplan.four_agent_config(loop_size=20_000)
    p_start = jnp.asarray([0.0, 1.5, 0.0, 0.5, 0.0, -0.5, 0.0, -1.5])
    pobs = jnp.asarray(
        np.stack(
            [
                np.random.default_rng(0).uniform(3.0, 8.0, 20),
                np.random.default_rng(1).uniform(-2.0, 2.0, 20),
            ]
        )
    )
    ref = refplan.generate(ref_cfg, p_start, pobs)
    assert ref.pr.shape == (8, 500)
    assert bool(jnp.isfinite(ref.pr).all())

    cfg = MpcConfig(use_sqp=True, sqp_iters=2)
    camp = campaign.CampaignConfig(n_agents=4, n_domains=15, inter_agent_cbf=True)
    res = jax.jit(
        lambda k: campaign.run_scenario(
            cfg, QpConfig(), camp, ref, p_start, pobs, k
        )
    )(jax.random.PRNGKey(0))
    assert res.success.shape == (4,)
    assert res.traj.shape == (15, 4, 2)
    assert bool(jnp.isfinite(res.traj).all())
    # agents remain separated (inter-agent CBF + APF spacing)
    final = np.asarray(res.final_xy)
    d01 = np.linalg.norm(final[0] - final[1])
    assert d01 > 0.3, f"agents 0/1 too close: {d01}"


def test_four_agent_neighbor_ring():
    """The neighbor exchange rolls around all 4 agents (ring topology)."""
    states = jnp.arange(16.0).reshape(4, 4)
    rolled = jnp.roll(states, shift=-1, axis=0)
    np.testing.assert_allclose(np.asarray(rolled[-1]), np.asarray(states[0]))
