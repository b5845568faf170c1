"""Batched success-rate campaigns — the de-facto integration test of the
reference (`src/A1_Sim.cpp:811-1274`), redesigned as one jitted program.

The reference runs NUMBER_OF_SIMS randomized-obstacle scenarios serially,
each 60 s of 1 kHz sim, under both solvers (QP-only vs SNOPT A/B,
`src/A1_Sim.cpp:983,1167-1176`), with failure = any agent within 0.5 m of a
real obstacle (`src/MPC_dist.cpp:21-40`). Here:

  * scenarios are a batch axis (vmap / shard_map over devices);
  * the per-scenario loop over gait domains is a lax.scan whose carry is the
    full multi-agent controller state;
  * the closed loop runs at template level: the plant is the LIP itself
    landing on the planned terminal knot, plus an optional per-domain
    disturbance (the analogue of the reference's external-force
    disturbance generator, `src/A1_Sim.cpp:84-107`);
  * neighbor-state exchange is a gather along the agent axis (the in-chip
    form of the `shared_structs` cross-reads; the multi-chip form lowers to
    collectives in srbx.parallel).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from srbx import gait as gaitmod
from srbx import mpc, refplan
from srbx.config import Gait, MpcConfig, QpConfig
from srbx.ocp import default_footholds


@dataclasses.dataclass(frozen=True)
class CampaignConfig:
    n_agents: int = 2
    n_domains: int = 120          # ~ 60 s / 172 ms-per-domain + stand
    n_obstacles: int = 20
    disturbance: float = 0.0      # per-domain velocity kick (m/s, std)
    fail_radius: float = 0.5
    obstacle_uncertainty: float = 0.6
    inter_agent_cbf: bool = False


class CampaignResult(NamedTuple):
    success: jax.Array        # (..., n_agents) bool — never within fail radius
    fail_distance: jax.Array  # (..., n_agents) ||q|| at first failure (0 if none)
    min_clearance: jax.Array  # (..., n_agents) min obstacle distance over run
    final_xy: jax.Array       # (..., n_agents, 2)
    qp_ok_frac: jax.Array     # (...,) fraction of converged cycles
    traj: jax.Array           # (..., n_domains, n_agents, 2) COM track


def sample_obstacles(key, n_scenarios: int, n_obstacles: int, uncertainty: float = 0.6):
    """Randomized obstacle fields (reference `src/A1_Sim.cpp:940-981`):
    nominal positions U([0,9] x [-2,2]); real positions = nominal + U(+-0.6)
    clamped to [1,9] x [-3,3]."""
    k1, k2, k3 = jax.random.split(key, 3)
    xs = jax.random.uniform(k1, (n_scenarios, n_obstacles), minval=0.0, maxval=9.0)
    ys = jax.random.uniform(k2, (n_scenarios, n_obstacles), minval=-2.0, maxval=2.0)
    pobs = jnp.stack([xs, ys], axis=1)                    # (S, 2, n_obs)
    noise = jax.random.uniform(
        k3, (n_scenarios, 2, n_obstacles), minval=-uncertainty, maxval=uncertainty
    )
    real = pobs + noise
    real = real.at[:, 0].set(jnp.clip(real[:, 0], 1.0, 9.0))
    real = real.at[:, 1].set(jnp.clip(real[:, 1], -3.0, 3.0))
    return pobs, real


def _contact_table(n_domains: int, dtype):
    """(n_domains, 4) trot stance table starting after the stand domain."""
    m = max(n_domains + 2, 12)
    m += (-(m - 2)) % 4  # round up to a valid schedule length
    sched = gaitmod.contact_schedule(Gait.TROT, m)
    return jnp.asarray(sched[:n_domains], dtype)


def run_scenario(
    cfg: MpcConfig,
    qp_cfg: QpConfig,
    camp: CampaignConfig,
    ref: refplan.RefTraj,
    p_start,
    pobs_real,
    key,
):
    """One scenario, all agents, scanned over gait domains. vmap me."""
    dtype = ref.pr.dtype
    na = camp.n_agents
    agent0 = p_start.reshape(na, 2).astype(dtype)
    contacts = _contact_table(camp.n_domains, dtype)

    pr = ref.pr.reshape(na, 2, -1)
    prd = ref.prd.reshape(na, 2, -1)

    def agent_cycle(carry_a, q_a, dq_a, ci, other_state, init_a, pr_a, prd_a):
        return mpc.run_nmpc(
            cfg, qp_cfg, carry_a, q_a, dq_a,
            default_footholds(q_a), ci,
            pr_a, prd_a, init_a, pobs_real,
            state_other=other_state,
            agent_circle_eps=cfg.cbf_eps if camp.inter_agent_cbf else 0.0,
        )

    def step(carry, inp):
        carries, q, dq, failed, fail_dist, min_clear, ok_cnt = carry
        ci, key_d = inp
        # neighbor exchange: each agent sees the next agent's (x, y, dx, dy)
        other = jnp.concatenate([q, dq], axis=1)          # (na, 4)
        other = jnp.roll(other, shift=-1, axis=0)
        out = jax.vmap(agent_cycle, in_axes=(0, 0, 0, None, 0, 0, 0, 0))(
            carries, q, dq, ci, other, agent0, pr, prd
        )
        q_n = out.states[:, -1, jnp.asarray([0, 2])]
        dq_n = out.states[:, -1, jnp.asarray([1, 3])]
        if camp.disturbance > 0:
            dq_n = dq_n + camp.disturbance * jax.random.normal(key_d, dq_n.shape, dtype)

        # failure detector (`src/MPC_dist.cpp:21-40`), latched per agent
        d_obs = jnp.linalg.norm(
            q_n[:, :, None] - pobs_real[None, :, :], axis=1
        )                                                  # (na, n_obs)
        clear = jnp.min(d_obs, axis=1)
        newly_failed = jnp.logical_and(clear < camp.fail_radius, ~failed)
        fail_dist = jnp.where(
            newly_failed, jnp.linalg.norm(q_n, axis=1), fail_dist
        )
        failed = jnp.logical_or(failed, newly_failed)
        min_clear = jnp.minimum(min_clear, clear)
        ok_cnt = ok_cnt + jnp.sum(out.qp_converged).astype(jnp.int32)

        new_carry = (out.carry, q_n, dq_n, failed, fail_dist, min_clear, ok_cnt)
        return new_carry, q_n

    carries0 = jax.vmap(lambda a: mpc.init_carry(a, dtype))(agent0)
    init = (
        carries0,
        agent0,
        jnp.zeros((na, 2), dtype),
        jnp.zeros((na,), bool),
        jnp.zeros((na,), dtype),
        jnp.full((na,), jnp.inf, dtype),
        jnp.zeros((), jnp.int32),
    )
    keys = jax.random.split(key, camp.n_domains)
    (carries, q, dq, failed, fail_dist, min_clear, ok_cnt), traj = jax.lax.scan(
        step, init, (contacts, keys)
    )
    return CampaignResult(
        success=~failed,
        fail_distance=fail_dist,
        min_clearance=min_clear,
        final_xy=q,
        qp_ok_frac=ok_cnt.astype(dtype) / (camp.n_domains * na),
        traj=traj,
    )


def run_campaign(
    cfg: MpcConfig,
    qp_cfg: QpConfig,
    camp: CampaignConfig,
    ref_cfg: refplan.RefPlanConfig,
    p_start,
    key,
    n_scenarios: int,
):
    """Full batched campaign: sample obstacle fields, plan APF references,
    and run every scenario's closed loop — one jitted program."""
    k_obs, k_run = jax.random.split(key)
    pobs, pobs_real = sample_obstacles(
        k_obs, n_scenarios, camp.n_obstacles, camp.obstacle_uncertainty
    )

    def one(pobs_s, pobs_real_s, k):
        ref = refplan.generate(ref_cfg, p_start, pobs_s, dtype=jnp.float64
                               if jax.config.jax_enable_x64 else jnp.float32)
        return run_scenario(cfg, qp_cfg, camp, ref, p_start, pobs_real_s, k)

    keys = jax.random.split(k_run, n_scenarios)
    return jax.vmap(one)(pobs, pobs_real, keys)


def run_campaign_batch(
    cfg: MpcConfig,
    qp_cfg: QpConfig,
    camp: CampaignConfig,
    ref_cfg: refplan.RefPlanConfig,
    p_start,
    key,
    n_scenarios: int,
    backend: str = "fused",
    tile: int = 256,
    warm_start_qp: bool = False,
) -> CampaignResult:
    """run_campaign restructured for the fused-kernel solver path.

    Mathematically identical to run_campaign (test-enforced at
    disturbance=0), but the QP/SQP solves of ALL (scenario x agent) lanes
    per domain run through ONE batch-native solve (srbx.mpc_batch /
    srbx.ops.qp_fused) instead of vmapping the per-agent cycle — the lane
    axis reaches the Pallas IPM as the TPU lane dimension rather than as an
    XLA batched-op axis. Neighbor exchange is a roll on the agent sub-axis
    of the flattened lane axis.

    With camp.disturbance > 0 the random streams differ from run_campaign
    (one key per domain shared across lanes here vs per-scenario key
    trees there): statistically equivalent, not bitwise.
    """
    k_obs, k_run = jax.random.split(key)
    pobs, pobs_real = sample_obstacles(
        k_obs, n_scenarios, camp.n_obstacles, camp.obstacle_uncertainty
    )
    return _run_campaign_batch_core(
        cfg, qp_cfg, camp, ref_cfg, p_start, pobs, pobs_real, k_run,
        backend, tile, warm_start_qp=warm_start_qp,
    )


def _run_campaign_batch_core(
    cfg: MpcConfig,
    qp_cfg: QpConfig,
    camp: CampaignConfig,
    ref_cfg: refplan.RefPlanConfig,
    p_start,
    pobs,          # (S, 2, n_obs) nominal fields (APF input)
    pobs_real,     # (S, 2, n_obs) true fields (CBF + failure detection)
    k_run,
    backend: str,
    tile: int,
    warm_start_qp: bool = False,
) -> CampaignResult:
    from srbx import mpc_batch

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    n_scenarios = pobs.shape[0]
    na = camp.n_agents
    n_lanes = n_scenarios * na
    agent0 = p_start.reshape(na, 2).astype(dtype)

    def plan(pobs_s):
        ref = refplan.generate(ref_cfg, p_start, pobs_s, dtype=dtype)
        return ref.pr.reshape(na, 2, -1), ref.prd.reshape(na, 2, -1)

    pr, prd = jax.vmap(plan)(pobs)                       # (S, na, 2, T)
    pr_l = pr.reshape(n_lanes, 2, -1)
    prd_l = prd.reshape(n_lanes, 2, -1)
    pobs_l = jnp.repeat(pobs_real.astype(dtype), na, axis=0)   # (L, 2, n_obs)
    agent0_l = jnp.tile(agent0, (n_scenarios, 1))        # (L, 2)
    contacts = _contact_table(camp.n_domains, dtype)

    def step(carry, inp):
        carries, q, dq, failed, fail_dist, min_clear, ok_cnt, x_prev = carry
        ci, key_d = inp
        other = jnp.concatenate([q, dq], axis=1).reshape(n_scenarios, na, 4)
        other = jnp.roll(other, shift=-1, axis=1).reshape(n_lanes, 4)
        # state_other is always threaded (as in run_scenario's agent_cycle);
        # the eps gate masks the neighbor circle's rows when the inter-agent
        # CBF is off, keeping the IPM iterate path identical to run_campaign
        out = mpc_batch.run_nmpc_batch(
            cfg, qp_cfg, carries, q, dq,
            jax.vmap(default_footholds)(q),
            jnp.broadcast_to(ci, (n_lanes, 4)),
            pr_l, prd_l, agent0_l, pobs_l,
            backend=backend, tile=tile,
            state_other=other,
            agent_circle_eps=cfg.cbf_eps if camp.inter_agent_cbf else 0.0,
            x0_warm=x_prev if warm_start_qp else None,
        )
        q_n = out.states[:, -1, jnp.asarray([0, 2])]
        dq_n = out.states[:, -1, jnp.asarray([1, 3])]
        if camp.disturbance > 0:
            dq_n = dq_n + camp.disturbance * jax.random.normal(
                key_d, dq_n.shape, dtype
            )

        d_obs = jnp.linalg.norm(
            q_n[:, :, None] - pobs_l, axis=1
        )                                                # (L, n_obs)
        clear = jnp.min(d_obs, axis=1)
        newly_failed = jnp.logical_and(clear < camp.fail_radius, ~failed)
        fail_dist = jnp.where(
            newly_failed, jnp.linalg.norm(q_n, axis=1), fail_dist
        )
        failed = jnp.logical_or(failed, newly_failed)
        min_clear = jnp.minimum(min_clear, clear)
        ok_cnt = ok_cnt + out.qp_converged.astype(jnp.int32)

        new_carry = (out.carry, q_n, dq_n, failed, fail_dist, min_clear,
                     ok_cnt, out.x)
        return new_carry, q_n

    carries0 = jax.vmap(lambda a: mpc.init_carry(a, dtype))(agent0_l)
    x0s0 = jnp.stack(
        [agent0_l[:, 0], jnp.zeros((n_lanes,), dtype),
         agent0_l[:, 1], jnp.zeros((n_lanes,), dtype)], axis=1)
    x_prev0 = jax.vmap(
        lambda x0: mpc.hold_position_x(cfg, x0, jnp.ones((4,), dtype))
    )(x0s0)
    init = (
        carries0,
        agent0_l,
        jnp.zeros((n_lanes, 2), dtype),
        jnp.zeros((n_lanes,), bool),
        jnp.zeros((n_lanes,), dtype),
        jnp.full((n_lanes,), jnp.inf, dtype),
        jnp.zeros((n_lanes,), jnp.int32),
        x_prev0,
    )
    keys = jax.random.split(k_run, camp.n_domains)
    (carries, q, dq, failed, fail_dist, min_clear, ok_cnt, _), traj = jax.lax.scan(
        step, init, (contacts, keys)
    )

    def unlane(arr):
        return arr.reshape((n_scenarios, na) + arr.shape[1:])

    return CampaignResult(
        success=unlane(~failed),
        fail_distance=unlane(fail_dist),
        min_clearance=unlane(min_clear),
        final_xy=unlane(q),
        qp_ok_frac=unlane(ok_cnt).sum(1).astype(dtype)
        / (camp.n_domains * na),
        traj=jnp.moveaxis(
            traj.reshape(camp.n_domains, n_scenarios, na, 2), 0, 1
        ),
    )


def run_campaign_batch_sharded(
    cfg: MpcConfig,
    qp_cfg: QpConfig,
    camp: CampaignConfig,
    ref_cfg: refplan.RefPlanConfig,
    p_start,
    key,
    n_scenarios: int,
    mesh=None,
    backend: str = "fused",
    tile: int = 256,
) -> CampaignResult:
    """run_campaign_batch with the scenario axis sharded over a device mesh
    (the multi-host production shape: pure DP over scenarios, the fused
    solver running per-device on its local lanes; no collectives until the
    host-side summary).

    Multi-process safe: when the mesh spans devices of several processes
    (`jax.distributed` runtime, srbx.parallel.multiproc), every process
    samples the same global fields from `key` and contributes only its
    addressable shards — the jax analogue of each reference PC deriving the
    same obstacle field from the LCM broadcast (`lcm_obs/obs.lcm`)."""
    from jax import shard_map
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if mesh is None:
        devs = np.asarray(jax.devices())
        mesh = Mesh(devs, axis_names=("scen",))
    n_dev = mesh.shape["scen"]
    if n_scenarios % n_dev:
        raise ValueError(f"n_scenarios={n_scenarios} not divisible by "
                         f"{n_dev} devices")

    # sample globally (same draws as the unsharded path), shard the fields;
    # per-shard run keys (identical results to unsharded when the
    # disturbance is off — test-enforced on the virtual mesh)
    k_obs, k_run = jax.random.split(key)
    pobs, pobs_real = sample_obstacles(
        k_obs, n_scenarios, camp.n_obstacles, camp.obstacle_uncertainty
    )
    # raw key bits so the operands are plain arrays (shardable across
    # processes); wrapped back inside the shard body
    keys_data = jax.random.key_data(jax.random.split(k_run, n_dev))

    def local(pobs_d, pobs_real_d, kd):
        return _run_campaign_batch_core(
            cfg, qp_cfg, camp, ref_cfg, p_start, pobs_d, pobs_real_d,
            jax.random.wrap_key_data(kd[0]), backend, tile,
        )

    multiproc = any(d.process_index != jax.process_index()
                    for d in mesh.devices.flat)
    if multiproc:
        def garr(spec, v):
            v = np.asarray(v)
            return jax.make_array_from_callback(
                v.shape, NamedSharding(mesh, spec), lambda idx: v[idx])

        pobs = garr(P("scen"), pobs)
        pobs_real = garr(P("scen"), pobs_real)
        keys_data = garr(P("scen"), keys_data)

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P("scen"), P("scen"), P("scen")),
        out_specs=P("scen"),
        check_vma=False,
    )
    return sharded(pobs, pobs_real, keys_data)


def run_campaign_chunked(
    cfg: MpcConfig,
    qp_cfg: QpConfig,
    camp: CampaignConfig,
    ref_cfg: refplan.RefPlanConfig,
    p_start,
    key,
    n_scenarios: int,
    max_chunk: int = 512,
    batch_backend: str | None = None,
) -> CampaignResult:
    """run_campaign split into <=max_chunk-scenario jitted programs.

    History: round 1 recorded "1024 scenarios deterministically crashes the
    remote TPU worker; 512 runs clean" and max_chunk=512 was folklore.
    Round 3 measured it (scripts/probe_program_limits.py, srbx/eval/limits
    .py, docs/ROUND3.md §1): the campaign program is statically tiny —
    ~1.22 MB HBM per scenario on both solver paths (1.25 GB at S=1024) and
    a size-independent 0.3 MB HLO proto — so neither the compile-request
    limit nor HBM explains it. Live reruns reproduced the boundary
    exactly: S=512 runs, S=1024 kills the worker from a verified-healthy
    state — a runtime kernel fault specific to this per-agent vmapped
    (non-fused) program, not statically predictable. max_chunk=512 is
    therefore a MEASURED boundary for this path. The production
    fused/condensed path (run_campaign_batch) is immune — it runs
    4096 x 120 domains in one program — and chunking remains the honest
    production shape regardless (each chunk reuses one compiled program).
    Use srbx.eval.limits.preflight to check any new program against the
    statically-predictable limits before running it.

    batch_backend: when set (e.g. "fused"), chunks run through
    run_campaign_batch with that solver backend instead of the per-agent
    vmapped path.
    """
    if batch_backend is None:
        runner = run_campaign
    else:
        runner = lambda *a: run_campaign_batch(*a, backend=batch_backend)
    if n_scenarios <= max_chunk:
        return runner(cfg, qp_cfg, camp, ref_cfg, p_start, key, n_scenarios)
    fn = jax.jit(
        lambda k: runner(cfg, qp_cfg, camp, ref_cfg, p_start, k, max_chunk)
    )
    n_chunks, rem = divmod(n_scenarios, max_chunk)
    if rem:
        raise ValueError(f"n_scenarios={n_scenarios} not divisible by {max_chunk}")
    outs = [fn(k) for k in jax.random.split(key, n_chunks)]
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)


def run_campaign_sharded(
    cfg: MpcConfig,
    qp_cfg: QpConfig,
    camp: CampaignConfig,
    ref_cfg: refplan.RefPlanConfig,
    p_start,
    key,
    n_scenarios: int,
    mesh=None,
) -> CampaignResult:
    """run_campaign with the scenario axis sharded over a device mesh.

    Campaigns are pure data-parallel (the reference runs them as a serial
    for-loop, `src/A1_Sim.cpp:931`): each device gets a contiguous slice of
    obstacle fields / keys via shard_map and runs the identical vmapped
    closed loop; no collectives are needed until the host-side summary.
    This is the multi-host scaling shape of the north star — scenario
    slices over DCN, agents within a scenario on-chip.
    """
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    if mesh is None:
        devs = np.asarray(jax.devices())
        mesh = Mesh(devs, axis_names=("scen",))
    n_dev = mesh.shape["scen"]
    if n_scenarios % n_dev:
        raise ValueError(f"n_scenarios={n_scenarios} not divisible by "
                         f"{n_dev} devices")

    k_obs, k_run = jax.random.split(key)
    pobs, pobs_real = sample_obstacles(
        k_obs, n_scenarios, camp.n_obstacles, camp.obstacle_uncertainty
    )
    keys = jax.random.split(k_run, n_scenarios)

    def one(pobs_s, pobs_real_s, k):
        ref = refplan.generate(ref_cfg, p_start, pobs_s, dtype=jnp.float64
                               if jax.config.jax_enable_x64 else jnp.float32)
        return run_scenario(cfg, qp_cfg, camp, ref, p_start, pobs_real_s, k)

    local = jax.vmap(one)
    # check_vma off: the closed-loop scan carries mix replicated constants
    # (p_start, gait tables) with per-shard state, which the varying-axes
    # checker rejects even though the program is correct (pure DP — no
    # cross-shard communication exists to get wrong).
    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P("scen"), P("scen"), P("scen")),
        out_specs=P("scen"),
        check_vma=False,
    )
    return sharded(pobs, pobs_real, keys)
