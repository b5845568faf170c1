"""Find the throughput knee of the fused NMPC cycle vs batch size."""
import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")
import __graft_entry__ as g
from srbx import mpc, mpc_batch
from srbx.config import MpcConfig, QpConfig
from scripts.bench_cycle_ab import setup

cfg0 = MpcConfig(use_sqp=True, sqp_iters=2)
qp_cfg = QpConfig(abstol=2e-3, reltol=1e-4, reg_primal=1e-6,
                  reg_dual=1e-6, max_iters=12)

for batch in [int(a) for a in sys.argv[1:]] or [4096, 8192, 16384]:
    dom, alpha, q, dq, toes, ci, pr, prd, a0s, pobs_b = setup(batch)

    def fn(dom, alpha, q, dq, ci):
        out = mpc_batch.run_nmpc_batch(
            cfg0, qp_cfg, mpc.MpcCarry(dom, alpha), q, dq, toes, ci,
            pr, prd, a0s, pobs_b, backend="fused", tile=256, condensed=True,
        )
        return out.states, out.qp_converged
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    out = jfn(dom, alpha, q, dq, ci)
    _ = np.asarray(out[0][:1])
    compile_s = time.perf_counter() - t0
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(dom, alpha, q, dq, ci)
        _ = np.asarray(out[0][:1])
    dt = (time.perf_counter() - t0) / reps
    conv = float(np.asarray(out[1]).mean())
    print(f"B={batch:6d} compile {compile_s:6.1f}s cycle {dt*1e3:8.2f} ms "
          f"solves/s {batch/dt:9.0f} conv {conv:.3f}", flush=True)
