"""Program-size probe for the two historical remote-worker crash points.

Round 1 folklore (srbx/eval/campaign.py): a 1024-scenario CBF-SQP campaign
(2048 agent-lanes x 120 domains, per-agent vmapped XLA solver path) in ONE
jitted program "deterministically crashes the remote TPU worker; 512 runs
clean"; and bench.py at B=262144 crashes while B=131072 runs. This script
replaces the folklore with a measured size model:

  * `analyze` mode AOT-compiles the exact programs at a ladder of sizes and
    prints XLA's static memory assignment (argument/output/temp/peak bytes,
    generated code size). Compilation allocates no device memory, so
    analyzing a crashing size is safe.
  * `run <name>` mode executes one point (invoke under a subprocess +
    timeout from the driver script so a worker crash cannot take down the
    parent session).

The resulting model (docs/ROUND3.md + srbx/eval/campaign.py docstring):
crash <=> XLA peak_memory (arguments + outputs + temps) exceeds the
v5e HBM capacity minus the runtime-reserved slice. Through the axon tunnel
an HBM OOM surfaces as a hard worker crash rather than a friendly
RESOURCE_EXHAUSTED, which is why it looked like folklore.
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

from srbx import mpc, mpc_batch, refplan
from srbx.config import MpcConfig, QpConfig
from srbx.eval import campaign
from srbx.ocp import default_footholds


QP_CFG = QpConfig(abstol=2e-3, reltol=1e-4, reg_primal=1e-6,
                  reg_dual=1e-6, max_iters=12)


def campaign_xla_program(n_scenarios: int, n_domains: int = 120):
    """The round-1 crashing program: per-agent vmapped, reference-shape
    (non-condensed) CBF-SQP campaign in one jitted program."""
    cfg = MpcConfig(use_sqp=True, sqp_iters=2)
    camp = campaign.CampaignConfig(n_agents=2, n_domains=n_domains)
    ref_cfg = refplan.two_agent_config(loop_size=40_000)
    p_start = jnp.asarray([0.0, 0.5, 0.0, -0.5], jnp.float32)
    fn = jax.jit(lambda k: campaign.run_campaign(
        cfg, QP_CFG, camp, ref_cfg, p_start, k, n_scenarios))
    return fn, (jax.random.key(0),)


def campaign_fused_program(n_scenarios: int, n_domains: int = 120):
    """The production-shape leg (condensed+fused) known to run at 4096."""
    cfg = MpcConfig(use_sqp=True, sqp_iters=2, condensed=True,
                    elide_box_rows=True, elide_simplex=True)
    camp = campaign.CampaignConfig(n_agents=2, n_domains=n_domains)
    ref_cfg = refplan.two_agent_config(loop_size=40_000)
    p_start = jnp.asarray([0.0, 0.5, 0.0, -0.5], jnp.float32)
    fn = jax.jit(lambda k: campaign.run_campaign_batch(
        cfg, QP_CFG, camp, ref_cfg, p_start, k, n_scenarios,
        backend="fused", tile=256))
    return fn, (jax.random.key(0),)


def bench_program(batch: int, tile: int = 512):
    """bench.py's exact program at the given lane count."""
    dtype = jnp.float32
    cfg = MpcConfig(use_sqp=True, sqp_iters=2, elide_box_rows=True,
                    elide_simplex=True)
    ref_cfg = refplan.two_agent_config(loop_size=4_000)
    p_start = jnp.asarray([0.0, 0.5, 0.0, -0.5], dtype)
    pobs = jnp.asarray(
        np.stack([np.random.default_rng(0).uniform(2.0, 8.0, 20),
                  np.random.default_rng(1).uniform(-2.0, 2.0, 20)]), dtype)
    ref = refplan.generate(ref_cfg, p_start, pobs, dtype=dtype)
    agent0 = p_start[:2]
    q = jnp.tile(agent0, (batch, 1)) + jnp.linspace(
        0, 0.01, batch, dtype=dtype)[:, None]
    dq = jnp.zeros((batch, 2), dtype)
    dom = jnp.zeros((batch,), jnp.int32)
    alpha = jnp.stack([q[:, 0], jnp.zeros(batch, dtype), q[:, 1],
                       jnp.zeros(batch, dtype)], axis=1)
    ci = jnp.tile(jnp.asarray([0.0, 1.0, 1.0, 0.0], dtype), (batch, 1))

    # bench.py's production shape: big per-lane operands tiled INSIDE the
    # jit from small constants (host-side embedded constants blow the
    # ~256 MiB remote_compile body limit; jit arguments re-ship ~117 MB
    # through the tunnel per call — measured 368k -> 17k solves/s)
    pr2, prd2 = ref.pr[0:2], ref.prd[0:2]
    toes0 = default_footholds(agent0)

    def fn(dom, alpha, q, dq, ci):
        out = mpc_batch.run_nmpc_batch(
            cfg, QP_CFG, mpc.MpcCarry(dom, alpha), q, dq,
            jnp.tile(toes0, (batch, 1, 1)), ci,
            jnp.tile(pr2, (batch, 1, 1)), jnp.tile(prd2, (batch, 1, 1)),
            jnp.tile(agent0, (batch, 1)), jnp.tile(pobs, (batch, 1, 1)),
            backend="fused", tile=tile, condensed=True)
        return out.states, out.alpha_com

    return jax.jit(fn), (dom, alpha, q, dq, ci)


def wholebody_program(n_scen: int, n_domains: int = 20):
    """scripts/campaign_wholebody.py's batch-mode CBF-SQP program (folklore:
    256 x 20 runs clean, 512 crashes the worker)."""
    from srbx.config import LowLevelConfig, MotionConfig
    from srbx.models import a1
    from srbx.sim import closedloop, wholebody as wb

    dtype = jnp.float32
    model = a1.model()
    key = jax.random.key(42)
    k1, k2, _ = jax.random.split(key, 3)
    xs = jax.random.uniform(k1, (n_scen, 20), minval=1.0, maxval=4.0)
    ys = jax.random.uniform(k2, (n_scen, 20), minval=-1.5, maxval=1.5)
    pobs = jnp.stack([xs, ys], axis=1).astype(dtype)
    loop = closedloop.LoopConfig(stand_ticks=800, n_domains=n_domains)
    mpc_cfg = MpcConfig(use_sqp=True, sqp_iters=1, condensed=True,
                        elide_box_rows=True, elide_simplex=True)
    ref_cfg = refplan.two_agent_config(loop_size=8_000)
    p_start = jnp.asarray([0.0, 0.0, 0.0, -1.0], dtype)

    def fn(pobs_b):
        refs = jax.vmap(lambda p: refplan.generate(ref_cfg, p_start, p,
                                                   dtype=dtype))(pobs_b)
        a0 = jnp.broadcast_to(p_start[:2], (n_scen, 2))
        return closedloop.run_batch(
            mpc_cfg, LowLevelConfig(), MotionConfig(), QP_CFG,
            wb.SimConfig(), loop, model, refs.pr[:, 0:2], refs.prd[:, 0:2],
            a0, pobs_b, dtype=dtype, backend="fused",
            tile=256 if n_scen >= 256 else 128, ll_reduced=True)

    return jax.jit(fn), (pobs,)


POINTS = {
    # name: (builder, kwargs)
    "camp_xla_256": (campaign_xla_program, dict(n_scenarios=256)),
    "camp_xla_512": (campaign_xla_program, dict(n_scenarios=512)),
    "camp_xla_768": (campaign_xla_program, dict(n_scenarios=768)),
    "camp_xla_1024": (campaign_xla_program, dict(n_scenarios=1024)),
    "camp_fused_1024": (campaign_fused_program, dict(n_scenarios=1024)),
    "camp_fused_4096": (campaign_fused_program, dict(n_scenarios=4096)),
    "bench_65536": (bench_program, dict(batch=65536)),
    "bench_131072": (bench_program, dict(batch=131072)),
    "bench_163840": (bench_program, dict(batch=163840)),
    "bench_196608": (bench_program, dict(batch=196608)),
    "bench_262144": (bench_program, dict(batch=262144)),
    "bench_327680": (bench_program, dict(batch=327680)),
    "wb_256": (wholebody_program, dict(n_scen=256)),
    "wb_384": (wholebody_program, dict(n_scen=384)),
    "wb_512": (wholebody_program, dict(n_scen=512)),
}


def analyze(names):
    rows = []
    for name in names:
        builder, kw = POINTS[name]
        row_pre = {}
        fn, args = builder(**kw)
        try:
            lowered = fn.lower(*args)
            try:
                proto = lowered.compiler_ir("hlo").as_serialized_hlo_module_proto()
                row_pre["hlo_proto_mb"] = round(len(proto) / 2**20, 1)
            except Exception as e:
                row_pre["hlo_proto_mb"] = f"err: {type(e).__name__}"
            compiled = lowered.compile()
            ma = compiled.memory_analysis()
            row = {
                "name": name,
                **row_pre,
                "argument_mb": round(ma.argument_size_in_bytes / 2**20, 1),
                "output_mb": round(ma.output_size_in_bytes / 2**20, 1),
                "temp_mb": round(ma.temp_size_in_bytes / 2**20, 1),
                "peak_mb": round(ma.peak_memory_in_bytes / 2**20, 1),
                "code_mb": round(
                    ma.generated_code_size_in_bytes / 2**20, 2),
            }
            # total live = args + outputs + temps (peak_memory_in_bytes is
            # the temp arena peak only on some backends; report both)
            row["total_mb"] = round(
                (ma.argument_size_in_bytes + ma.output_size_in_bytes
                 + ma.temp_size_in_bytes) / 2**20, 1)
        except Exception as e:  # compile-time failure is itself a datum
            row = {"name": name, **row_pre,
                   "error": f"{type(e).__name__}: {e}"[:400]}
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def run_one(name):
    builder, kw = POINTS[name]
    fn, args = builder(**kw)
    out = fn(*args)
    flat = jax.tree.leaves(out)
    _ = np.asarray(flat[0]).ravel()[:1]  # hard host sync through the tunnel
    print(json.dumps({"name": name, "ran": True}), flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "run":
        run_one(sys.argv[2])
    else:
        names = sys.argv[1:] or list(POINTS)
        analyze(names)
