"""A/B of the SCP merit line search on the flagship campaign (TPU):
CBF-SQP leg with sqp_linesearch off vs on, same scenarios."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from srbx import refplan
from srbx.config import MpcConfig, QpConfig
from srbx.eval import campaign

n_scenarios = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
n_domains = int(sys.argv[2]) if len(sys.argv) > 2 else 120

qp_cfg = QpConfig(abstol=2e-3, reltol=1e-4, reg_primal=1e-6,
                  reg_dual=1e-6, max_iters=12)
camp = campaign.CampaignConfig(n_agents=2, n_domains=n_domains)
ref_cfg = refplan.two_agent_config(loop_size=40_000)
p_start = jnp.asarray([0.0, 0.5, 0.0, -0.5], jnp.float32)
key = jax.random.key(0)

for label, ls in (("no-linesearch", False), ("linesearch", True)):
    cfg = MpcConfig(use_sqp=True, sqp_iters=2, condensed=True,
                    elide_box_rows=True, elide_simplex=True,
                    sqp_linesearch=ls)
    fn = jax.jit(lambda k, c=cfg: campaign.run_campaign_batch(
        c, qp_cfg, camp, ref_cfg, p_start, k, n_scenarios,
        backend="fused", tile=256))
    t0 = time.perf_counter()
    res = fn(key)
    succ = np.asarray(res.success)
    clear = np.asarray(res.min_clearance)
    t1 = time.perf_counter()
    # steady timing
    res = fn(key)
    _ = np.asarray(res.success)
    dt = time.perf_counter() - t1
    print(f"{label:14s} success {succ.mean()*100:6.2f}%  "
          f"mean min-clearance {clear.mean():.4f} m  "
          f"worst {clear.min():.3f} m  "
          f"compile+run {t1-t0:6.1f}s steady {dt:5.2f}s  "
          f"domains/s {n_scenarios*n_domains/dt:9.0f}", flush=True)
