"""TPU experiment: cross-domain warm start of the campaign's first QP."""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from srbx import refplan
from srbx.config import MpcConfig, QpConfig
from srbx.eval import analysis, campaign


def main(n_scenarios=256, n_domains=40):
    qp_cfg = QpConfig(abstol=2e-3, reltol=1e-4, reg_primal=1e-6,
                      reg_dual=1e-6, max_iters=12)
    camp = campaign.CampaignConfig(n_agents=2, n_domains=n_domains)
    ref_cfg = refplan.two_agent_config(loop_size=40_000)
    p_start = jnp.asarray([0.0, 0.5, 0.0, -0.5], jnp.float32)
    key = jax.random.key(0)

    for use_sqp in (False, True):
        for warm in (False, True):
            cfg = MpcConfig(use_sqp=use_sqp, sqp_iters=2,
                            condensed=True, elide_box_rows=True)
            fn = jax.jit(lambda k, c=cfg, w=warm: campaign.run_campaign_batch(
                c, qp_cfg, camp, ref_cfg, p_start, k, n_scenarios,
                backend="fused", tile=256, warm_start_qp=w))
            t0 = time.perf_counter()
            res = fn(key); np.asarray(res.success)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            res = fn(key); np.asarray(res.success)
            steady = time.perf_counter() - t0
            s = analysis.campaign_summary(res)
            print(json.dumps({
                "sqp": use_sqp, "warm": warm,
                "success": s["success_rate"], "qp_ok": s["qp_ok_frac"],
                "compile_s": round(compile_s, 1), "steady_s": round(steady, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
