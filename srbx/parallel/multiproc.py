"""Multi-process (multi-host) distributed runtime over `jax.distributed`.

The reference's cross-machine path is point-to-point UDP between per-robot
PCs (`include/multi_pc_comm.h:7-22`, endpoints at
`driver_scripts/qp_only_exp.cpp:29,94`) plus LCM pub-sub for obstacles
(`lcm_obs/obs.lcm`). The TPU-native equivalent (SURVEY.md §2.3) is the
`jax.distributed` multi-controller runtime: every process owns a slice of
the global device mesh, arrays are globally sharded, and the neighbor-state
exchange that UDP carried rides the mesh collectives (ring `ppermute` over
the agent axis, scenario DP over the rest).

This module is process-count agnostic: the same functions run single-process
(tests, virtual CPU meshes) and under N processes launched by
`scripts/run_multiprocess.py`, which is how the true cross-host code path —
global array construction, SPMD jit across processes, collectives over the
process boundary — is exercised on one machine (N CPU processes) without a
multi-host TPU slice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from srbx import mpc, refplan
from srbx.config import MpcConfig, QpConfig
from srbx.ocp import default_footholds


def initialize(coordinator: str, num_processes: int, process_id: int) -> None:
    """Join the jax.distributed cluster (the multi-controller runtime)."""
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_array(mesh: Mesh, spec: P, value: np.ndarray) -> jax.Array:
    """Build a globally-sharded array from a host-replicated numpy value.

    Every process computes the same `value` deterministically (the way every
    reference PC derives the same obstacle field from the LCM broadcast) and
    contributes only its addressable shards.
    """
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        value.shape, sharding, lambda idx: value[idx]
    )


def _team_inputs(n_scen: int, n_agents: int, dtype):
    """Deterministic team-step inputs, identical in every process."""
    ref_cfg = refplan.two_agent_config(loop_size=4_000)
    p_start = np.asarray([0.0, 0.5, 0.0, -0.5], np.float64)
    rng0 = np.random.default_rng(0)
    rng1 = np.random.default_rng(1)
    pobs = np.stack([rng0.uniform(2.0, 8.0, 20), rng1.uniform(-2.0, 2.0, 20)])
    ref = refplan.generate(ref_cfg, jnp.asarray(p_start, dtype),
                           jnp.asarray(pobs, dtype), dtype=dtype)
    pr1 = np.asarray(ref.pr).reshape(2, 2, -1)
    prd1 = np.asarray(ref.prd).reshape(2, 2, -1)

    rng = np.random.default_rng(7)
    q = np.tile(p_start[:2], (n_scen, n_agents, 1))
    q += rng.uniform(-0.02, 0.02, q.shape)
    dq = 0.01 * rng.standard_normal((n_scen, n_agents, 2))
    dom = np.zeros((n_scen, n_agents), np.int32)
    alpha = np.stack(
        [q[..., 0], np.zeros_like(q[..., 0]), q[..., 1],
         np.zeros_like(q[..., 0])], axis=-1)
    ci = np.tile(np.asarray([0.0, 1.0, 1.0, 0.0]), (n_scen, n_agents, 1))
    pr = np.broadcast_to(pr1[:1], (n_agents, 2, pr1.shape[-1]))
    pr = np.broadcast_to(pr, (n_scen,) + pr.shape).copy()
    prd = np.broadcast_to(prd1[:1], (n_agents, 2, prd1.shape[-1]))
    prd = np.broadcast_to(prd, (n_scen,) + prd.shape).copy()
    agent0 = np.broadcast_to(p_start[:2], (n_scen, n_agents, 2)).copy()
    pobs_b = np.broadcast_to(pobs, (n_scen, 2, 20)).copy()
    f = lambda x: x.astype(np.dtype(jnp.dtype(dtype)))
    return (dom, f(alpha), f(q), f(dq), f(ci), f(pr), f(prd), f(agent0),
            f(pobs_b))


def _team_reference(cfg: MpcConfig, qp_cfg: QpConfig, inputs, dtype):
    """Unsharded single-device reference of the team step: the same math as
    `team.team_cycle_fn`'s shard_map body with the ring ppermute replaced by
    a global roll over the agent axis."""
    dom, alpha, q, dq, ci, pr, prd, agent0, pobs = (
        jnp.asarray(x) for x in inputs)

    other = jnp.concatenate([q, dq], axis=-1)
    other = jnp.roll(other, shift=-1, axis=1)

    def agent_one(dom_a, alpha_a, q_a, dq_a, ci_a, oth, pr_a, prd_a, a0,
                  pobs_s):
        out = mpc.run_nmpc(
            cfg, qp_cfg, mpc.MpcCarry(dom_a, alpha_a), q_a, dq_a,
            default_footholds(q_a), ci_a, pr_a, prd_a, a0, pobs_s,
            state_other=oth, agent_circle_eps=cfg.cbf_eps,
        )
        return out.states

    inner = jax.vmap(agent_one,
                     in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, None))
    states = jax.jit(jax.vmap(inner))(
        dom, alpha, q, dq, ci, other, pr, prd, agent0, pobs)
    return states


def team_step_check(
    cfg: MpcConfig | None = None,
    qp_cfg: QpConfig | None = None,
    scen_per_shard: int = 2,
    n_agent_shards: int | None = None,
    dtype=None,
    atol: float | None = None,
) -> dict:
    """Run the sharded team step over the GLOBAL mesh (all processes) and
    assert every addressable shard equals the locally-computed unsharded
    reference. Returns a stats dict; raises AssertionError on mismatch.

    Under N processes this exercises the full cross-host path: global-array
    construction from process-local shards, one SPMD jit across processes,
    and the ring `ppermute` neighbor exchange crossing process boundaries.
    """
    from srbx.parallel import team

    if dtype is None:
        x64 = jax.config.jax_enable_x64
        dtype = jnp.float64 if x64 else jnp.float32
        # the IPM/SQP iteration amplifies reduction-order differences between
        # the sharded and unsharded programs; in f64 they stay ~1e-9, in f32
        # a few 1e-3 — the check is exact-math equality, so prefer f64
        if atol is None:
            atol = 1e-7 if x64 else 2e-2
    elif atol is None:
        atol = 1e-7
    cfg = cfg or MpcConfig(use_sqp=True, sqp_iters=1, condensed=True,
                           elide_box_rows=True, elide_simplex=True)
    qp_cfg = qp_cfg or QpConfig(max_iters=8, abstol=1e-4, reltol=1e-4,
                                reg_primal=1e-7, reg_dual=1e-7)
    n_dev = len(jax.devices())
    if n_agent_shards is None:
        n_agent_shards = 2 if n_dev % 2 == 0 else 1
    mesh = team.make_mesh(n_agent_shards=n_agent_shards)
    n_scen = mesh.shape["scen"] * scen_per_shard
    n_agents = max(mesh.shape["agent"], 2)

    inputs = _team_inputs(n_scen, n_agents, dtype)
    spec_sa = P("scen", "agent")
    spec_s = P("scen")
    specs = (spec_sa,) * 8 + (spec_s,)
    garrs = tuple(global_array(mesh, s, v) for s, v in zip(specs, inputs))

    fn = team.team_cycle_fn(cfg, qp_cfg, mesh, n_agents)
    _, _, _, _, states = fn(*garrs)
    states.block_until_ready()

    ref = np.asarray(_team_reference(cfg, qp_cfg, inputs, dtype))
    max_err = 0.0
    n_shards = 0
    for shard in states.addressable_shards:
        got = np.asarray(shard.data)
        want = ref[shard.index]
        assert np.isfinite(got).all(), "non-finite states in sharded step"
        err = float(np.abs(got - want).max())
        max_err = max(max_err, err)
        n_shards += 1
        assert err < atol, (
            f"sharded team step diverges from unsharded reference: "
            f"shard {shard.index} max err {err:.2e} (atol {atol:.0e})")
    return {
        "process_index": jax.process_index(),
        "n_processes": jax.process_count(),
        "n_devices_global": n_dev,
        "mesh": dict(mesh.shape),
        "n_scenarios": n_scen,
        "n_agents": n_agents,
        "local_shards": n_shards,
        "max_err": max_err,
    }


def campaign_dp_check(
    n_scen_per_dev: int = 1,
    atol: float | None = None,
) -> dict:
    """Scenario-DP campaign over the global mesh (`shard_map`, every process
    running its local lanes of ONE SPMD program) checked against the
    single-device unsharded campaign — the multi-host production topology
    for success-rate batches (SURVEY.md §2.3 scenario axis)."""
    from srbx.eval import campaign

    if atol is None:
        atol = 1e-7 if jax.config.jax_enable_x64 else 5e-3
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    cfg = MpcConfig(use_sqp=True, sqp_iters=1, condensed=True,
                    elide_box_rows=True, elide_simplex=True)
    qp_cfg = QpConfig(max_iters=8, abstol=1e-4, reltol=1e-4,
                      reg_primal=1e-7, reg_dual=1e-7)
    camp = campaign.CampaignConfig(n_agents=2, n_domains=2)
    ref_cfg = refplan.two_agent_config(loop_size=2_000)
    p_start = jnp.asarray([0.0, 0.5, 0.0, -0.5], dtype)
    key = jax.random.key(0)

    n_dev = len(jax.devices())
    n_scen = n_dev * n_scen_per_dev
    mesh = Mesh(np.asarray(jax.devices()), axis_names=("scen",))
    res = campaign.run_campaign_batch_sharded(
        cfg, qp_cfg, camp, ref_cfg, p_start, key, n_scen, mesh=mesh,
        backend="xla",
    )
    traj = res.traj
    jax.block_until_ready(traj)

    # unsharded local reference (same key -> same obstacle draws)
    ref = campaign.run_campaign_batch(
        cfg, qp_cfg, camp, ref_cfg, p_start, key, n_scen, backend="xla",
    )
    ref_traj = np.asarray(ref.traj)

    max_err = 0.0
    for shard in traj.addressable_shards:
        got = np.asarray(shard.data)
        want = ref_traj[shard.index]
        assert np.isfinite(got).all()
        err = float(np.abs(got - want).max())
        max_err = max(max_err, err)
        assert err < atol, (
            f"sharded campaign diverges: shard {shard.index} "
            f"max err {err:.2e}")
    return {
        "process_index": jax.process_index(),
        "n_processes": jax.process_count(),
        "n_scenarios": n_scen,
        "max_err": max_err,
    }
