"""Full-fidelity success-rate campaign: randomized obstacle fields evaluated
through the WHOLE-BODY closed loop (18-DoF physics + 1 kHz LL QP +
CBF-NMPC), not the template simulator — the exact shape of the reference's
RaiSim experiment (`src/A1_Sim.cpp:811-1274`), vmapped over scenarios.

    python scripts/campaign_wholebody.py [n_scen] [n_domains] [mode] [est] [ab]

`est`: estimation in the loop (batch modes). `ab`: run BOTH solver legs
(QP-only vs CBF-SQP — the reference's per-scenario A/B at
`src/A1_Sim.cpp:983,1167-1176`) and report both success rates. Campaigns
larger than the worker program-size limit are chunked (same compiled
program per chunk).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from srbx import refplan
from srbx.config import LowLevelConfig, MotionConfig, MpcConfig, QpConfig
from srbx.eval import campaign
from srbx.models import a1
from srbx.sim import closedloop, wholebody as wb

n_scen = int(sys.argv[1]) if len(sys.argv) > 1 else 16
n_domains = int(sys.argv[2]) if len(sys.argv) > 2 else 10
mode = sys.argv[3] if len(sys.argv) > 3 else "vmap"   # vmap | batch | batch-r
# "est": ESTIMATION IN THE LOOP — controller consumes only the
# kinEst/KF/prob-contact estimates driven by the synthetic sensor streams
# (batch modes only). "ab": QP-only vs CBF-SQP legs.
use_est = "est" in sys.argv[4:]
use_ab = "ab" in sys.argv[4:]
# Chunk size: the whole-body campaign program is statically tiny (7.8 MB
# HLO proto, <=220 MB HBM at S=512 — srbx/eval/limits.py); the historical
# "512 crashes the worker" was the load-dependent compile-helper OOM
# (mode B, docs/ROUND3.md §1). 256/chunk keeps each compile small and
# reuses one compiled program across chunks.
dtype = jnp.float32
model = a1.model()

# obstacle fields shifted into the robot's early path (the whole-body run
# covers ~1-2 m in n_domains, so sample x in [1, 4]). "hard": a tight
# corridor right on the path (x in [0.8, 2.5], y in [-0.8, 0.8]) — the
# field density where the QP-only vs CBF-SQP safety contrast shows.
hard = "hard" in sys.argv[4:]
key = jax.random.key(42)
k1, k2, k3 = jax.random.split(key, 3)
if hard:
    xs = jax.random.uniform(k1, (n_scen, 20), minval=0.8, maxval=2.5)
    ys = jax.random.uniform(k2, (n_scen, 20), minval=-0.8, maxval=0.8)
else:
    xs = jax.random.uniform(k1, (n_scen, 20), minval=1.0, maxval=4.0)
    ys = jax.random.uniform(k2, (n_scen, 20), minval=-1.5, maxval=1.5)
pobs = jnp.stack([xs, ys], axis=1).astype(dtype)            # (S, 2, 20)
# Obstacle-position uncertainty (`src/A1_Sim.cpp:970-980`): the APF
# reference plans around the NOMINAL positions; the NMPC's CBF and the
# success metric see the REAL positions (nominal + U(+-0.6)). This is the
# mechanism that makes obstacle avoidance safety-critical — without it the
# planner's own margins keep every run >0.8 m clear and the QP-vs-SQP
# contrast never shows ("uncertainty" opt-out for the legacy behavior).
use_unc = "uncertainty" in sys.argv[4:] or "matrix" in sys.argv[4:]
if use_unc:
    noise = jax.random.uniform(k3, (n_scen, 2, 20), minval=-0.6, maxval=0.6)
    pobs_real = (pobs + noise.astype(dtype))
else:
    pobs_real = pobs

loop = closedloop.LoopConfig(stand_ticks=800, n_domains=n_domains)
qp_cfg = QpConfig(abstol=2e-3, reltol=1e-4, reg_primal=1e-6, reg_dual=1e-6,
                  max_iters=12)
mpc_cfg = MpcConfig(use_sqp=True, sqp_iters=1, condensed=True,
                    elide_box_rows=True, elide_simplex=True)
ref_cfg = refplan.two_agent_config(loop_size=8_000)
p_start = jnp.asarray([0.0, 0.0, 0.0, -1.0], dtype)

# whole-body program-size chunk limit for this worker (documented in
# srbx/eval/campaign.py; the batch program holds 256 x 20 cleanly)
CHUNK = min(n_scen, 256)
assert n_scen % CHUNK == 0


def make_fn(use_sqp, est_leg=None):
    est_on = use_est if est_leg is None else est_leg
    cfg = mpc_cfg if use_sqp else MpcConfig(
        use_sqp=False, condensed=True, elide_box_rows=True,
        elide_simplex=True)
    if mode.startswith("batch"):
        from srbx.estimation import pipeline

        est_cfg = pipeline.EstConfig() if est_on else None

        def fn(pobs_b, pobs_real_b):
            # APF plans on the NOMINAL field; the NMPC CBF sees the REAL one
            refs = jax.vmap(lambda p: refplan.generate(ref_cfg, p_start, p,
                                                       dtype=dtype))(pobs_b)
            a0 = jnp.broadcast_to(p_start[:2], (CHUNK, 2))
            return closedloop.run_batch(
                cfg, LowLevelConfig(), MotionConfig(), qp_cfg,
                wb.SimConfig(), loop, model, refs.pr[:, 0:2],
                refs.prd[:, 0:2], a0, pobs_real_b, dtype=dtype,
                backend="fused" if jax.default_backend() != "cpu" else "xla",
                tile=256 if CHUNK >= 256 else 128,
                ll_reduced=mode.endswith("-r"),
                est_cfg=est_cfg, est_key=jax.random.PRNGKey(11))
        return jax.jit(fn)

    def one_cfg(pobs_s, pobs_real_s):
        ref = refplan.generate(ref_cfg, p_start, pobs_s, dtype=dtype)
        return closedloop.run(
            cfg, LowLevelConfig(), MotionConfig(), qp_cfg, wb.SimConfig(),
            loop, model, ref.pr[0:2], ref.prd[0:2], p_start[:2],
            pobs_real_s, dtype=dtype)
    return jax.jit(jax.vmap(one_cfg))


def run_leg(label, use_sqp, est_leg=None):
    fn = make_fn(use_sqp, est_leg=est_leg)
    t0 = time.perf_counter()
    coms, rmses, qpoks = [], [], []
    for c0 in range(0, n_scen, CHUNK):
        res = fn(pobs[c0:c0 + CHUNK], pobs_real[c0:c0 + CHUNK])
        coms.append(np.asarray(res.com_hist))
        qpoks.append(np.atleast_1d(np.asarray(res.qp_ok)))
        if getattr(res, "est_rmse", None) is not None:
            rmses.append(np.asarray(res.est_rmse))
    com = np.concatenate(coms)                    # (S, D, ticks, 3)
    wall = time.perf_counter() - t0

    xy = com[..., :2].reshape(n_scen, -1, 2)      # (S, T, 2)
    obs = np.asarray(pobs_real)                   # (S, 2, 20)
    d = np.linalg.norm(
        xy[:, :, None, :] - obs.transpose(0, 2, 1)[:, None], axis=-1)
    min_clear = d.min(axis=(1, 2))                # (S,)
    success = min_clear > 0.5
    print(f"[{label}] scenarios={n_scen} domains={n_domains} "
          f"wall {wall:.1f}s (incl compile)"
          + ("  [ESTIMATION IN THE LOOP]" if use_est else ""))
    print(f"[{label}] success {success.mean()*100:.2f}%  min clearance p50 "
          f"{np.median(min_clear):.2f} m  worst {min_clear.min():.2f} m  "
          f"qp_ok {float(np.concatenate(qpoks).mean()):.3f}  "
          f"finite={np.isfinite(com).all()}", flush=True)
    if rmses:
        rmse = np.concatenate(rmses)
        print(f"[{label}] est RMSE: pos p50 {np.median(rmse[:, 0])*1e3:.1f}"
              f" mm (worst {rmse[:, 0].max()*1e3:.1f})  vel p50 "
              f"{np.median(rmse[:, 1]):.3f} m/s "
              f"(worst {rmse[:, 1].max():.3f})", flush=True)
    rmse = np.concatenate(rmses) if rmses else None
    return {"success": success, "min_clear": min_clear, "rmse": rmse,
            "qp_ok": float(np.concatenate(qpoks).mean()), "wall_s": wall}


def _jsonable(leg):
    out = {"success_rate": float(leg["success"].mean()),
           "min_clearance_p50": float(np.median(leg["min_clear"])),
           "min_clearance_worst": float(leg["min_clear"].min()),
           "qp_ok": leg["qp_ok"], "wall_s": leg["wall_s"]}
    if leg["rmse"] is not None:
        out["est_rmse_pos_p50_mm"] = float(np.median(leg["rmse"][:, 0]) * 1e3)
        out["est_rmse_pos_max_mm"] = float(leg["rmse"][:, 0].max() * 1e3)
        out["est_rmse_vel_p50"] = float(np.median(leg["rmse"][:, 1]))
        out["est_rmse_vel_max"] = float(leg["rmse"][:, 1].max())
    return out


if "matrix" in sys.argv[4:]:
    # full ground-truth x estimation x solver matrix (VERDICT r3 #3);
    # per-scenario obstacle fields identical across all four legs.
    import json
    legs = {}
    for est_leg in (False, True):
        tag = "est" if est_leg else "gt"
        for use_sqp in (False, True):
            lbl = f"{tag}/{'cbf-sqp' if use_sqp else 'qp-only'}"
            legs[lbl] = run_leg(lbl, use_sqp, est_leg=est_leg)
    res = {k: _jsonable(v) for k, v in legs.items()}
    res["n_scenarios"] = n_scen
    res["n_domains"] = n_domains
    res["mode"] = mode
    res["hard_field"] = hard
    res["per_scenario_flips"] = {
        "gt_vs_est_qp": int((legs["gt/qp-only"]["success"]
                             != legs["est/qp-only"]["success"]).sum()),
        "gt_vs_est_sqp": int((legs["gt/cbf-sqp"]["success"]
                              != legs["est/cbf-sqp"]["success"]).sum()),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "CAMPAIGN_WB_EST.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1), flush=True)
    print(f"wrote {path}")
elif use_ab:
    s_qp = run_leg("qp-only", False)["success"]
    s_sqp = run_leg("cbf-sqp", True)["success"]
    print(f"A/B: qp-only {s_qp.mean()*100:.2f}%  vs  cbf-sqp "
          f"{s_sqp.mean()*100:.2f}%  (n={n_scen})", flush=True)
else:
    run_leg("cbf-sqp" if mpc_cfg.use_sqp else "qp-only", mpc_cfg.use_sqp)
