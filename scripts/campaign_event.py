"""Full-fidelity obstacle campaign through the EVENT-DRIVEN batched loop:
randomized obstacle fields, 18-DoF physics + 1 kHz LL QP + CBF-NMPC, with
per-lane contact-triggered domains and the 20 ms HL cadence + latency —
the reference's RaiSim experiment (`src/A1_Sim.cpp:811-1274`) under its
TRUE event semantics (`src/LocoWrapper.cpp:165-200`), not the fixed-cadence
approximation."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from srbx import refplan
from srbx.config import LowLevelConfig, MotionConfig, MpcConfig, QpConfig
from srbx.models import a1
from srbx.sim import closedloop, wholebody as wb

n_scen = int(sys.argv[1]) if len(sys.argv) > 1 else 64
n_ticks = int(sys.argv[2]) if len(sys.argv) > 2 else 1720   # ~10 nominal domains
period = int(sys.argv[3]) if len(sys.argv) > 3 else 20
# 4th arg "est": estimator-aware event triggers — the contact debouncer runs
# on the MEASURED foot force and the controller consumes estimates
use_est = len(sys.argv) > 4 and sys.argv[4] == "est"
dtype = jnp.float32
model = a1.model()

key = jax.random.key(42)
k1, k2 = jax.random.split(key)
xs = jax.random.uniform(k1, (n_scen, 20), minval=1.0, maxval=4.0)
ys = jax.random.uniform(k2, (n_scen, 20), minval=-1.5, maxval=1.5)
pobs = jnp.stack([xs, ys], axis=1).astype(dtype)            # (S, 2, 20)

loop = closedloop.LoopConfig(stand_ticks=800, mpc_latency_ticks=period)
qp_cfg = QpConfig(abstol=2e-3, reltol=1e-4, reg_primal=1e-6, reg_dual=1e-6,
                  max_iters=12)
mpc_cfg = MpcConfig(use_sqp=True, sqp_iters=1, condensed=True,
                    elide_box_rows=True, elide_simplex=True)
ref_cfg = refplan.two_agent_config(loop_size=8_000)
p_start = jnp.asarray([0.0, 0.0, 0.0, -1.0], dtype)


from srbx.estimation import pipeline

est_cfg = pipeline.EstConfig() if use_est else None


def fn(pobs_b):
    refs = jax.vmap(lambda p: refplan.generate(ref_cfg, p_start, p,
                                               dtype=dtype))(pobs_b)
    a0 = jnp.broadcast_to(p_start[:2], (n_scen, 2))
    return closedloop.run_batch_event(
        mpc_cfg, LowLevelConfig(), MotionConfig(), qp_cfg, wb.SimConfig(),
        loop, model, refs.pr[:, 0:2], refs.prd[:, 0:2], a0, pobs_b,
        n_ticks=n_ticks, dtype=dtype, backend="fused",
        tile=256 if n_scen >= 256 else 128, ll_reduced=True,
        mpc_period_ticks=period,
        est_cfg=est_cfg, est_key=jax.random.PRNGKey(11))


fn = jax.jit(fn)
t0 = time.perf_counter()
res = fn(pobs)
com = np.asarray(res.com_hist)                    # (S, n_ticks, 3)
wall = time.perf_counter() - t0

xy = com[..., :2]                                 # (S, T, 2)
obs = np.asarray(pobs)
d = np.linalg.norm(xy[:, :, None, :] - obs.transpose(0, 2, 1)[:, None],
                   axis=-1)
min_clear = d.min(axis=(1, 2))
success = min_clear > 0.5
dom = np.asarray(res.domains)
print(f"scenarios={n_scen} ticks={n_ticks} HL period={period} "
      f"wall {wall:.1f}s (incl compile)"
      + ("  [ESTIMATION IN THE LOOP]" if use_est else ""), flush=True)
if getattr(res, "est_rmse", None) is not None:
    rmse = np.asarray(res.est_rmse)
    print(f"est RMSE: pos p50 {np.median(rmse[:, 0])*1e3:.1f} mm "
          f"(worst {rmse[:, 0].max()*1e3:.1f})  vel p50 "
          f"{np.median(rmse[:, 1]):.3f} m/s (worst {rmse[:, 1].max():.3f})",
          flush=True)
print(f"success {success.mean()*100:.1f}%  min clearance p50 "
      f"{np.median(min_clear):.2f} m  worst {min_clear.min():.2f} m  "
      f"domains/lane p50 {int(np.median(dom))}  "
      f"mpc solves/lane p50 {int(np.median(np.asarray(res.mpc_solves)))}  "
      f"qp_ok {float(np.asarray(res.qp_ok).mean()):.3f}  "
      f"finite={np.isfinite(com).all()}", flush=True)
