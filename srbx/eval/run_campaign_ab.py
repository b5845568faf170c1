"""1024-scenario A/B campaign runner — the batch analogue of the reference's
NUMBER_OF_SIMS loop with its per-scenario QP-only vs SNOPT A/B
(`src/A1_Sim.cpp:931,983,1167-1176`), run as two jitted programs on one chip.

Usage (TPU):  python -m srbx.eval.run_campaign_ab [n_scenarios] [n_domains]
Writes docs/CAMPAIGN_<n>.json and prints the A/B summary.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from srbx import refplan
from srbx.config import MpcConfig, QpConfig
from srbx.eval import analysis, campaign


def main(n_scenarios: int = 1024, n_domains: int = 120):
    qp_cfg = QpConfig(abstol=2e-3, reltol=1e-4, reg_primal=1e-6,
                      reg_dual=1e-6, max_iters=12)
    camp = campaign.CampaignConfig(n_agents=2, n_domains=n_domains)
    ref_cfg = refplan.two_agent_config(loop_size=40_000)
    p_start = jnp.asarray([0.0, 0.5, 0.0, -0.5], jnp.float32)
    key = jax.random.key(0)

    on_tpu = jax.devices()[0].platform not in ("cpu", "gpu")
    out = {"n_scenarios": n_scenarios, "n_domains": n_domains}
    for label, use_sqp in (("qp_only", False), ("cbf_sqp", True)):
        # Production formulation (measured, scripts/exp_campaign_fused.py at
        # S=256 x 40 domains): batched lanes + fused kernel + condensed QP
        # wins BOTH legs — 8.9x (QP-only) and 23x (CBF-SQP) over the
        # per-agent vmapped path, and the condensed fused kernel compiles
        # 25x faster than the full-shape one (22 s vs 589 s).
        condense = on_tpu
        cfg = MpcConfig(use_sqp=use_sqp, sqp_iters=2,
                        condensed=condense, elide_box_rows=condense,
                        elide_simplex=condense)
        out.setdefault("formulation", {})[label] = (
            "condensed+simplex+elided+fused" if on_tpu else "reference-shape"
        )
        # One single jitted program for the whole leg: the worker crash that
        # forced <=512-scenario chunks was specific to the XLA solver path
        # (campaign.run_campaign_chunked still guards it); the fused-kernel
        # batch path runs 4096 scenarios x 120 domains in one program clean,
        # and chunking costs ~10x in per-chunk tunnel dispatch (measured:
        # 13.7k chunked vs 142k single-program CBF domains/s).
        if on_tpu:
            fn = jax.jit(lambda k, c=cfg: campaign.run_campaign_batch(
                c, qp_cfg, camp, ref_cfg, p_start, k, n_scenarios,
                backend="fused", tile=256,
            ))
        else:
            fn = lambda k, c=cfg: campaign.run_campaign_chunked(
                c, qp_cfg, camp, ref_cfg, p_start, k, n_scenarios,
                max_chunk=512,
            )
        t0 = time.perf_counter()
        res = fn(key)
        _ = np.asarray(res.success)          # hard host sync
        wall = time.perf_counter() - t0
        summ = analysis.campaign_summary(res)
        summ["wall_s_incl_compile"] = round(wall, 1)
        t0 = time.perf_counter()
        res = fn(key)
        _ = np.asarray(res.success)
        summ["wall_s_steady"] = round(time.perf_counter() - t0, 1)
        summ["domains_per_s"] = round(
            n_scenarios * camp.n_agents * n_domains / summ["wall_s_steady"], 1
        )
        out[label] = summ
        print(label, json.dumps(summ), flush=True)

    path = f"docs/CAMPAIGN_{n_scenarios}.json"
    analysis.dump_json(out, path)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
