"""Does the cycle still converge with fewer IPM iterations? Sweep max_iters,
measure conv fraction, state agreement vs max_iters=12, and cycle time."""
import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")
from scripts.bench_cycle_ab import setup

from srbx import mpc, mpc_batch
from srbx.config import MpcConfig, QpConfig

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
cfg = MpcConfig(use_sqp=True, sqp_iters=2)
dom, alpha, q, dq, toes, ci, pr, prd, a0s, pobs_b = setup(B)

ref_states = None
for iters in (12, 10, 9, 8, 7):
    qp_cfg = QpConfig(abstol=2e-3, reltol=1e-4, reg_primal=1e-6,
                      reg_dual=1e-6, max_iters=iters)
    def fn(dom, alpha, q, dq, ci, qc=qp_cfg):
        out = mpc_batch.run_nmpc_batch(
            cfg, qc, mpc.MpcCarry(dom, alpha), q, dq, toes, ci,
            pr, prd, a0s, pobs_b, backend="fused", tile=256, condensed=True)
        return out.states, out.qp_converged
    jfn = jax.jit(fn)
    out = jfn(dom, alpha, q, dq, ci)
    _ = np.asarray(out[0][:1])
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(dom, alpha, q, dq, ci)
        _ = np.asarray(out[0][:1])
    dt = (time.perf_counter() - t0) / reps
    st = np.asarray(out[0])
    conv = float(np.asarray(out[1]).mean())
    if ref_states is None:
        ref_states = st
    d = np.abs(st - ref_states).max()
    print(f"max_iters={iters:2d} cycle {dt*1e3:8.2f} ms solves/s {B/dt:8.0f} "
          f"conv {conv:.4f} |dstate| {d:.2e}", flush=True)
