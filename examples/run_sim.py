"""Run_Sim equivalent: randomized-obstacle success-rate batches, A/B solvers.

The reference's primary entry point (`src/A1_Sim.cpp:811-1274`) runs
NUMBER_OF_SIMS randomized scenarios, each under BOTH solvers (QP-only vs
SNOPT), and appends the distance-to-goal at failure to failingDistances.txt.
This is the srbx equivalent as one batched TPU program per solver leg:

    python examples/run_sim.py [params/MPC_params.txt ...] \
        --sims 64 --domains 100 --out Sim_Outputs

Reference param files (routed by filename substring, exactly like
`Parameters(argc, argv)`, `src/Parameters.cpp:13-25`) may be passed
unchanged. Writes <out>/failingDistances_<leg>.txt (one distance per
failed agent, `src/A1_Sim.cpp:813,1266`) and prints the A/B summary.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from srbx import refplan
from srbx.config import MpcConfig, QpConfig
from srbx.eval import analysis, campaign
from srbx.utils import params_io


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("param_files", nargs="*",
                    help="reference-format param files (LL/MPC/Walking)")
    ap.add_argument("--sims", type=int, default=64)
    ap.add_argument("--domains", type=int, default=100)
    ap.add_argument("--agents", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="Sim_Outputs")
    args = ap.parse_args(argv)

    _ = params_io.load(args.param_files)   # reference param files accepted
    out_dir = pathlib.Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    on_tpu = jax.devices()[0].platform not in ("cpu", "gpu")
    qp_cfg = QpConfig(abstol=2e-3, reltol=1e-4, reg_primal=1e-6,
                      reg_dual=1e-6, max_iters=12)
    camp = campaign.CampaignConfig(n_agents=args.agents,
                                   n_domains=args.domains)
    ref_cfg = refplan.two_agent_config(loop_size=40_000)
    p_start = jnp.asarray([0.0, 0.5, 0.0, -0.5], jnp.float32)
    key = jax.random.key(args.seed)

    summary = {}
    # the reference's per-scenario solver A/B loop (`src/A1_Sim.cpp:983`),
    # batched: same obstacle draws (same key) under both solver legs
    for leg, use_sqp in (("qp_only", False), ("cbf_sqp", True)):
        cfg = MpcConfig(use_sqp=use_sqp, sqp_iters=2,
                        condensed=on_tpu, elide_box_rows=on_tpu)
        res = campaign.run_campaign_chunked(
            cfg, qp_cfg, camp, ref_cfg, p_start, key, args.sims,
            max_chunk=512, batch_backend="fused" if on_tpu else None,
        )
        summ = analysis.campaign_summary(res)
        fails = summ.pop("failing_distances")
        path = out_dir / f"failingDistances_{leg}.txt"
        path.write_text("".join(f"{d:.6f}\n" for d in fails))
        summary[leg] = summ
        print(leg, json.dumps(summ), "->", path, flush=True)

    (out_dir / "summary.json").write_text(json.dumps(summary, indent=1))
    print("wrote", out_dir / "summary.json")


if __name__ == "__main__":
    main()
