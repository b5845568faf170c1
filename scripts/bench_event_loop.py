"""TPU throughput of the batched EVENT-DRIVEN whole-body loop
(closedloop.run_batch_event) vs the fixed-cadence run_batch shape: B lanes,
per-lane contact triggers, HL poll every `period` ticks."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from srbx import refplan
from srbx.config import LowLevelConfig, MotionConfig, MpcConfig, QpConfig
from srbx.models import a1
from srbx.sim import closedloop as cl, wholebody as wb

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
n_ticks = int(sys.argv[2]) if len(sys.argv) > 2 else 1032
period = int(sys.argv[3]) if len(sys.argv) > 3 else 20
dtype = jnp.float32
model = a1.model()

ref_cfg = refplan.two_agent_config(loop_size=4_000)
p_start = jnp.asarray([0.0, 0.5, 0.0, -0.5], dtype)
pobs = jnp.asarray([[100.0] * 20, [100.0] * 20], dtype)
ref = refplan.generate(ref_cfg, p_start, pobs, dtype=dtype)

loop = cl.LoopConfig(stand_ticks=800, mpc_latency_ticks=period)
qp_cfg = QpConfig(abstol=2e-3, reltol=1e-4, reg_primal=1e-6, reg_dual=1e-6,
                  max_iters=12)
mpc_cfg = MpcConfig(use_sqp=True, sqp_iters=1)

prb = jnp.broadcast_to(ref.pr[0:2], (B, 2, ref.pr.shape[-1]))
prdb = jnp.broadcast_to(ref.prd[0:2], (B, 2, ref.prd.shape[-1]))
pobsb = jnp.broadcast_to(pobs, (B,) + pobs.shape)
shifts = jnp.linspace(0.0, 0.01, B, dtype=dtype)[:, None] * jnp.asarray(
    [1.0, 0.0], dtype)

fn = jax.jit(lambda s: cl.run_batch_event(
    mpc_cfg, LowLevelConfig(), MotionConfig(), qp_cfg, wb.SimConfig(),
    loop, model, prb, prdb, p_start[:2] + s, pobsb, n_ticks=n_ticks,
    dtype=dtype, backend="fused", tile=256, ll_reduced=True,
    mpc_period_ticks=period))

t0 = time.perf_counter()
res = fn(shifts)
dom = np.asarray(res.domains)
t1 = time.perf_counter()
res = fn(shifts)
dom = np.asarray(res.domains)
dt = time.perf_counter() - t1
trig = np.asarray(res.trigger_hist)
gaps = np.diff(np.nonzero(trig[0])[0])
total = B * (n_ticks + loop.stand_ticks)
print(f"B={B} ticks={n_ticks} period={period} compile {t1-t0:.1f}s "
      f"steady {dt*1e3:.0f} ms", flush=True)
print(f"event-driven LL-ticks/s {total/dt:,.0f}  "
      f"domains/lane p50 {int(np.median(dom))}  "
      f"lane0 domain lengths {gaps.tolist()}  "
      f"qp_ok {float(res.qp_ok.min()):.3f}  "
      f"mpc solves/lane p50 {int(np.median(np.asarray(res.mpc_solves)))}  "
      f"finite {bool(np.isfinite(np.asarray(res.com_hist)).all())}",
      flush=True)
