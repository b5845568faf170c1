"""TPU experiment: fused-backend batched campaign vs the per-agent path.

Moderate scale (S=256, 40 domains) to pick the production configuration for
the A/B runner: per-agent vs batch(fused), condensed on/off per leg.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from srbx import refplan
from srbx.config import MpcConfig, QpConfig
from srbx.eval import analysis, campaign


def run(label, fn, key):
    t0 = time.perf_counter()
    res = fn(key)
    np.asarray(res.success)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = fn(key)
    np.asarray(res.success)
    steady = time.perf_counter() - t0
    s = analysis.campaign_summary(res)
    print(json.dumps({
        "label": label,
        "success_rate": s["success_rate"],
        "qp_ok_frac": s["qp_ok_frac"],
        "compile_s": round(compile_s, 1),
        "steady_s": round(steady, 2),
    }), flush=True)


def main(n_scenarios=256, n_domains=40):
    qp_cfg = QpConfig(abstol=2e-3, reltol=1e-4, reg_primal=1e-6,
                      reg_dual=1e-6, max_iters=12)
    camp = campaign.CampaignConfig(n_agents=2, n_domains=n_domains)
    ref_cfg = refplan.two_agent_config(loop_size=40_000)
    p_start = jnp.asarray([0.0, 0.5, 0.0, -0.5], jnp.float32)
    key = jax.random.key(0)

    for use_sqp in (False, True):
        for mode in ("agent", "batch"):
            for condense in ((False, True) if mode == "batch" else (False,)):
                cfg = MpcConfig(use_sqp=use_sqp, sqp_iters=2,
                                condensed=condense, elide_box_rows=condense)
                if mode == "agent":
                    fn = jax.jit(lambda k, c=cfg: campaign.run_campaign(
                        c, qp_cfg, camp, ref_cfg, p_start, k, n_scenarios))
                else:
                    fn = jax.jit(lambda k, c=cfg: campaign.run_campaign_batch(
                        c, qp_cfg, camp, ref_cfg, p_start, k, n_scenarios,
                        backend="fused", tile=256))
                label = (f"sqp={int(use_sqp)} {mode}"
                         + (f" condensed={int(condense)}" if mode == "batch" else ""))
                run(label, fn, key)


if __name__ == "__main__":
    main()
