"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from srbx import mpc, refplan
from srbx.config import MpcConfig, QpConfig
from srbx.parallel import team


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_ring_roll_matches_global_roll():
    mesh = team.make_mesh(4, n_agent_shards=4)
    x = jnp.arange(8.0).reshape(8, 1)

    rolled = jax.jit(
        jax.shard_map(
            lambda v: team.ring_roll(v, "agent"),
            mesh=mesh,
            in_specs=jax.sharding.PartitionSpec("agent"),
            out_specs=jax.sharding.PartitionSpec("agent"),
        )
    )(x)
    np.testing.assert_allclose(np.asarray(rolled), np.roll(np.asarray(x), -1, axis=0))


def test_team_cycle_sharded_matches_unsharded():
    cfg = MpcConfig(use_sqp=True, sqp_iters=2)
    qp_cfg = QpConfig()
    n_scen, n_agents = 4, 2
    mesh = team.make_mesh(8, n_agent_shards=2)

    ref_cfg = refplan.two_agent_config(loop_size=4_000)
    p_start = jnp.asarray([0.0, 0.5, 0.0, -0.5])
    pobs = jnp.asarray([[5.0] * 20, [50.0] * 20])
    ref = refplan.generate(ref_cfg, p_start, pobs)
    pr = jnp.broadcast_to(ref.pr.reshape(2, 2, -1), (n_scen, 2, 2, ref.pr.shape[-1]))
    prd = jnp.broadcast_to(ref.prd.reshape(2, 2, -1), (n_scen, 2, 2, ref.pr.shape[-1]))

    agent0 = jnp.broadcast_to(p_start.reshape(2, 2), (n_scen, 2, 2))
    q = agent0 + jnp.linspace(0, 0.01, n_scen)[:, None, None]
    dq = jnp.zeros((n_scen, n_agents, 2))
    dom = jnp.zeros((n_scen, n_agents), jnp.int32)
    alpha = jnp.concatenate(
        [q[..., :1], jnp.zeros_like(q[..., :1]), q[..., 1:], jnp.zeros_like(q[..., :1])],
        axis=-1,
    )
    ci = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 1.0, 0.0]), (n_scen, n_agents, 4))
    pobs_b = jnp.broadcast_to(pobs, (n_scen, 2, 20))

    fn = team.team_cycle_fn(cfg, qp_cfg, mesh, n_agents)
    dom2, alpha2, q2, dq2, states = fn(dom, alpha, q, dq, ci, pr, prd, agent0, pobs_b)
    assert states.shape == (n_scen, n_agents, 4, 4)
    assert bool(jnp.isfinite(states).all())
    assert (np.asarray(dom2) == 1).all()

    # unsharded reference computation for scenario 0, agent 0
    carry = mpc.MpcCarry(dom[0, 0], alpha[0, 0])
    other = jnp.concatenate([q[0, 1], dq[0, 1]])
    from srbx.ocp import default_footholds

    out = mpc.run_nmpc(
        cfg, qp_cfg, carry, q[0, 0], dq[0, 0], default_footholds(q[0, 0]),
        ci[0, 0], pr[0, 0], prd[0, 0], agent0[0, 0], pobs_b[0],
        state_other=other, agent_circle_eps=cfg.cbf_eps,
    )
    np.testing.assert_allclose(
        np.asarray(states[0, 0]), np.asarray(out.states), atol=1e-7
    )


def test_sharded_campaign_matches_unsharded():
    """Scenario-sharded campaign (shard_map over the 8-device virtual mesh)
    equals the single-device vmap campaign lane for lane."""
    from srbx.eval import campaign as camp_mod

    cfg = MpcConfig(use_sqp=False)
    qp_cfg = QpConfig(max_iters=8)
    camp = camp_mod.CampaignConfig(n_agents=2, n_domains=3)
    ref_cfg = refplan.two_agent_config(loop_size=2_000)
    p_start = jnp.asarray([0.0, 0.5, 0.0, -0.5])
    key = jax.random.key(3)

    plain = jax.jit(lambda k: camp_mod.run_campaign(
        cfg, qp_cfg, camp, ref_cfg, p_start, k, 8))(key)
    sharded = jax.jit(lambda k: camp_mod.run_campaign_sharded(
        cfg, qp_cfg, camp, ref_cfg, p_start, k, 8))(key)

    np.testing.assert_allclose(
        np.asarray(sharded.min_clearance), np.asarray(plain.min_clearance),
        rtol=1e-7, atol=1e-9,
    )
    np.testing.assert_array_equal(
        np.asarray(sharded.success), np.asarray(plain.success)
    )


def test_sharded_batch_campaign_matches_unsharded():
    """run_campaign_batch_sharded (scenario DP over the 8-device virtual
    mesh, fused-path lane structure per device) equals run_campaign_batch
    lane for lane (disturbance off -> run keys unused)."""
    from srbx.eval import campaign as camp_mod

    cfg = MpcConfig(use_sqp=False)
    qp_cfg = QpConfig(max_iters=8)
    camp = camp_mod.CampaignConfig(n_agents=2, n_domains=3)
    ref_cfg = refplan.two_agent_config(loop_size=2_000)
    p_start = jnp.asarray([0.0, 0.5, 0.0, -0.5])
    key = jax.random.key(5)

    plain = jax.jit(lambda k: camp_mod.run_campaign_batch(
        cfg, qp_cfg, camp, ref_cfg, p_start, k, 8, backend="xla"))(key)
    sharded = jax.jit(lambda k: camp_mod.run_campaign_batch_sharded(
        cfg, qp_cfg, camp, ref_cfg, p_start, k, 8, backend="xla"))(key)

    np.testing.assert_allclose(
        np.asarray(sharded.min_clearance), np.asarray(plain.min_clearance),
        rtol=1e-6, atol=1e-8,
    )
    np.testing.assert_array_equal(
        np.asarray(sharded.success), np.asarray(plain.success)
    )
    np.testing.assert_allclose(
        np.asarray(sharded.traj), np.asarray(plain.traj), atol=1e-7
    )


def test_team_cycle_batch_matches_per_agent_cycle():
    """team_cycle_batch_fn (fused-production shape per shard) matches
    team_cycle_fn at the xla backend on the virtual mesh."""
    cfg = MpcConfig(use_sqp=True, sqp_iters=2)
    qp_cfg = QpConfig()
    n_scen, n_agents = 4, 2
    mesh = team.make_mesh(8, n_agent_shards=2)

    ref_cfg = refplan.two_agent_config(loop_size=4_000)
    p_start = jnp.asarray([0.0, 0.5, 0.0, -0.5])
    pobs = jnp.asarray([[5.0] * 20, [50.0] * 20])
    ref = refplan.generate(ref_cfg, p_start, pobs)
    pr = jnp.broadcast_to(ref.pr.reshape(2, 2, -1), (n_scen, 2, 2, ref.pr.shape[-1]))
    prd = jnp.broadcast_to(ref.prd.reshape(2, 2, -1), (n_scen, 2, 2, ref.pr.shape[-1]))

    agent0 = jnp.broadcast_to(p_start.reshape(2, 2), (n_scen, 2, 2))
    q = agent0 + jnp.linspace(0, 0.01, n_scen)[:, None, None]
    dq = jnp.zeros((n_scen, n_agents, 2))
    dom = jnp.zeros((n_scen, n_agents), jnp.int32)
    alpha = jnp.concatenate(
        [q[..., :1], jnp.zeros_like(q[..., :1]), q[..., 1:],
         jnp.zeros_like(q[..., :1])], axis=-1)
    ci = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 1.0, 0.0]), (n_scen, n_agents, 4))
    pobs_b = jnp.broadcast_to(pobs, (n_scen, 2, 20))

    args = (dom, alpha, q, dq, ci, pr, prd, agent0, pobs_b)
    ref_out = team.team_cycle_fn(cfg, qp_cfg, mesh, n_agents)(*args)
    bat_out = team.team_cycle_batch_fn(
        cfg, qp_cfg, mesh, n_agents, backend="xla")(*args)
    for r, b in zip(ref_out, bat_out):
        np.testing.assert_allclose(np.asarray(b), np.asarray(r), atol=1e-7)
