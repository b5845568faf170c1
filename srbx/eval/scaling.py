"""Multi-device scaling-efficiency measurement.

The north-star asks for solves/s scaling efficiency at 1 chip, 1 host, and
N>=2 hosts (>85%). This harness runs the sharded team cycle on meshes of
1..n devices and reports weak-scaling throughput and efficiency.

IMPORTANT: efficiency numbers are only meaningful on real multi-device
hardware. On the virtual CPU mesh (xla_force_host_platform_device_count)
all "devices" share one physical CPU, so per-device throughput necessarily
degrades ~1/n — the virtual mesh validates the MECHANISM (sharding
compiles, collectives execute, results match unsharded), not the scaling.
This round's environment has a single real TPU chip; run this harness on a
pod slice to obtain the real ICI/DCN numbers.
"""

from __future__ import annotations

import time

import jax.numpy as jnp
import numpy as np

from srbx import refplan
from srbx.config import MpcConfig, QpConfig
from srbx.parallel import team


def measure(
    device_counts,
    scen_per_device: int = 8,
    n_agents: int = 2,
    reps: int = 3,
    dtype=jnp.float32,
):
    """Throughput of the sharded one-domain team step vs device count.

    Returns {n_devices: {"cycles_per_s": ..., "efficiency": ...}} with
    efficiency relative to the single-device rate (weak scaling: the
    per-device problem size is constant).
    """
    cfg = MpcConfig(use_sqp=True, sqp_iters=1)
    qp_cfg = QpConfig(abstol=2e-3, reltol=1e-4, reg_primal=1e-6,
                      reg_dual=1e-6, max_iters=10)

    ref_cfg = refplan.two_agent_config(loop_size=4_000)
    p_start = jnp.asarray([0.0, 0.5, 0.0, -0.5], dtype)
    pobs = jnp.asarray([[5.0] * 20, [50.0] * 20], dtype)
    ref = refplan.generate(ref_cfg, p_start, pobs, dtype=dtype)
    pr1 = ref.pr.reshape(2, 2, -1)
    prd1 = ref.prd.reshape(2, 2, -1)

    out = {}
    base_rate = None
    for nd in device_counts:
        n_shards = 2 if (nd % 2 == 0 and n_agents % 2 == 0) else 1
        mesh = team.make_mesh(nd, n_agent_shards=n_shards)
        n_scen = mesh.shape["scen"] * scen_per_device

        agent0 = jnp.broadcast_to(p_start.reshape(2, 2), (n_scen, n_agents, 2))
        q = agent0
        dq = jnp.zeros((n_scen, n_agents, 2), dtype)
        dom = jnp.zeros((n_scen, n_agents), jnp.int32)
        alpha = jnp.stack(
            [q[..., 0], jnp.zeros_like(q[..., 0]), q[..., 1],
             jnp.zeros_like(q[..., 0])], axis=-1)
        ci = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 1.0, 0.0], dtype),
                              (n_scen, n_agents, 4))
        pr = jnp.broadcast_to(pr1, (n_scen,) + pr1.shape)
        prd = jnp.broadcast_to(prd1, (n_scen,) + prd1.shape)
        pobs_b = jnp.broadcast_to(pobs, (n_scen, 2, 20))

        fn = team.team_cycle_fn(cfg, qp_cfg, mesh, n_agents)
        args = (dom, alpha, q, dq, ci, pr, prd, agent0, pobs_b)
        res = fn(*args)
        _ = np.asarray(res[4][:1])          # hard sync
        t0 = time.perf_counter()
        for _ in range(reps):
            res = fn(*args)
            _ = np.asarray(res[4][:1])
        dt = (time.perf_counter() - t0) / reps
        rate = n_scen * n_agents / dt
        if base_rate is None:
            base_rate = rate / nd
        out[nd] = {
            "cycles_per_s": round(rate, 1),
            "efficiency": round(rate / (base_rate * nd), 3),
        }
    return out


def measure_campaign(
    device_counts,
    scen_per_device: int = 64,
    n_domains: int = 20,
    reps: int = 2,
):
    """Weak-scaling throughput of the PRODUCTION campaign path
    (campaign.run_campaign_batch_sharded: fused solves per device, scenario
    DP across the mesh) vs device count. Same virtual-mesh caveat as
    `measure` — run on a pod slice for real numbers."""
    import jax
    from jax.sharding import Mesh

    from srbx.config import MpcConfig, QpConfig
    from srbx.eval import campaign

    cfg = MpcConfig(use_sqp=True, sqp_iters=2, condensed=True,
                    elide_box_rows=True)
    qp_cfg = QpConfig(abstol=2e-3, reltol=1e-4, reg_primal=1e-6,
                      reg_dual=1e-6, max_iters=12)
    camp = campaign.CampaignConfig(n_agents=2, n_domains=n_domains)
    ref_cfg = refplan.two_agent_config(loop_size=8_000)
    p_start = jnp.asarray([0.0, 0.5, 0.0, -0.5], jnp.float32)
    on_tpu = jax.devices()[0].platform not in ("cpu", "gpu")
    backend = "fused" if on_tpu else "xla"

    out = {}
    base_rate = None
    for nd in device_counts:
        mesh = Mesh(np.asarray(jax.devices()[:nd]), axis_names=("scen",))
        n_scen = nd * scen_per_device
        fn = jax.jit(lambda k: campaign.run_campaign_batch_sharded(
            cfg, qp_cfg, camp, ref_cfg, p_start, k, n_scen,
            mesh=mesh, backend=backend))
        key = jax.random.key(0)
        np.asarray(fn(key).success)
        t0 = time.perf_counter()
        for _ in range(reps):
            np.asarray(fn(key).success)
        dt = (time.perf_counter() - t0) / reps
        rate = n_scen * camp.n_agents * n_domains / dt
        if base_rate is None:
            base_rate = rate / nd
        out[nd] = {
            "domains_per_s": round(rate, 1),
            "efficiency": round(rate / (base_rate * nd), 3),
        }
    return out
