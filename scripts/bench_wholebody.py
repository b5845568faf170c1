"""TPU throughput of the FULL-FIDELITY closed loop (BASELINE configs 2-3):
vmapped 18-DoF whole-body physics + 1 kHz LL QP + event-cadence NMPC.

Reports LL ticks/s (the 1 kHz unit of work: RBD dynamics + 43-var QP +
physics step per lane) and real-time factor vs the reference's 1 kHz
single-robot budget.
"""
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
n_domains = int(sys.argv[2]) if len(sys.argv) > 2 else 6
mode = sys.argv[3] if len(sys.argv) > 3 else "vmap"   # vmap | batch | batch-r
# "cond": condensed+elided NMPC formulation (the campaign/team scripts'
# production operating point). The full-shape fused SQP kernel at B>=512
# OOM-kills the remote compile helper (SIGKILL, docs/ROUND3.md); the
# condensed kernel compiles ~25x faster and scales past it.
condensed = "cond" in sys.argv[4:]
dtype = jnp.float32
model = a1.model()

ref_cfg = refplan.two_agent_config(loop_size=4_000)
p_start = jnp.asarray([0.0, 0.5, 0.0, -0.5], dtype)
pobs = jnp.asarray([[100.0] * 20, [100.0] * 20], dtype)
ref = refplan.generate(ref_cfg, p_start, pobs, dtype=dtype)

loop = closedloop.LoopConfig(stand_ticks=800, n_domains=n_domains)
qp_cfg = QpConfig(abstol=2e-3, reltol=1e-4, reg_primal=1e-6, reg_dual=1e-6,
                  max_iters=12)
mpc_cfg = MpcConfig(use_sqp=True, sqp_iters=1, condensed=condensed,
                    elide_box_rows=condensed, elide_simplex=condensed)

def one(a0_shift):
    a0 = p_start[:2] + a0_shift
    return closedloop.run(
        mpc_cfg, LowLevelConfig(), MotionConfig(), qp_cfg, wb.SimConfig(),
        loop, model, ref.pr[0:2], ref.prd[0:2], a0, pobs, dtype=dtype)

shifts = jnp.linspace(0.0, 0.01, B, dtype=dtype)[:, None] * jnp.asarray([1.0, 0.0], dtype)
if mode.startswith("batch"):
    prb = jnp.broadcast_to(ref.pr[0:2], (B, 2, ref.pr.shape[-1]))
    prdb = jnp.broadcast_to(ref.prd[0:2], (B, 2, ref.prd.shape[-1]))
    pobsb = jnp.broadcast_to(pobs, (B,) + pobs.shape)
    fn = jax.jit(lambda s: closedloop.run_batch(
        mpc_cfg, LowLevelConfig(), MotionConfig(), qp_cfg, wb.SimConfig(),
        loop, model, prb, prdb, p_start[:2] + s, pobsb, dtype=dtype,
        backend="fused", tile=256 if B >= 256 else 128,
        ll_reduced=mode.endswith("-r")))
else:
    fn = jax.jit(jax.vmap(one))
t0 = time.perf_counter()
res = fn(shifts)
_ = np.asarray(res.com_hist[:1, :1, :1])
compile_s = time.perf_counter() - t0
reps = 3
t0 = time.perf_counter()
for _ in range(reps):
    res = fn(shifts)
    _ = np.asarray(res.com_hist[:1, :1, :1])
dt = (time.perf_counter() - t0) / reps

ticks = loop.stand_ticks + n_domains * loop.ticks_per_domain
com = np.asarray(res.com_hist)
ok = np.isfinite(com).all()
height = com[:, -1, -1, 2]
print(f"B={B} domains={n_domains} ticks/lane={ticks} compile {compile_s:.1f}s")
print(f"wall {dt*1e3:.1f} ms  LL-ticks/s {B*ticks/dt:,.0f}  "
      f"real-time-factor {B*ticks/dt/1000:.1f}x  finite={ok} "
      f"final-z p50 {np.median(height):.3f}  qp_ok {float(res.qp_ok.mean()):.3f}",
      flush=True)
