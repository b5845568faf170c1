"""p50 cycle latency of the NMPC solve at deployment-shaped batches.

The north-star metric tracks p50 latency against the reference's real-time
budgets: 172 ms replan budget per gait domain and the 20 ms HL thread
period (`driver_scripts/qp_only_exp.cpp:666-668`, SURVEY.md §6). Throughput
is bench.py's job; this script answers "how stale is a solution when a
single robot (or a small team) asks for one replan?".

Note on the measurement floor: through the remote-TPU tunnel a host sync
costs ~1-2 ms; on-device latency is lower than every number printed here.
"""

import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")
from scripts.bench_cycle_ab import setup

from srbx import mpc, mpc_batch
from srbx.config import MpcConfig, QpConfig


def main():
    cfg = MpcConfig(use_sqp=True, sqp_iters=2)
    qp_cfg = QpConfig(abstol=2e-3, reltol=1e-4, reg_primal=1e-6,
                      reg_dual=1e-6, max_iters=12)
    on_tpu = jax.devices()[0].platform not in ("cpu", "gpu")
    backend = "fused" if on_tpu else "xla"

    for batch in (1, 4, 64, 256):
        dom, alpha, q, dq, toes, ci, pr, prd, a0s, pobs_b = setup(batch)

        def fn(dom, alpha, q, dq, ci):
            out = mpc_batch.run_nmpc_batch(
                cfg, qp_cfg, mpc.MpcCarry(dom, alpha), q, dq, toes, ci,
                pr, prd, a0s, pobs_b, backend=backend, tile=128,
                condensed=True,
            )
            return out.states

        jfn = jax.jit(fn)
        out = jfn(dom, alpha, q, dq, ci)
        _ = np.asarray(out[:1])
        lat = []
        for _ in range(30):
            t0 = time.perf_counter()
            out = jfn(dom, alpha, q, dq, ci)
            _ = np.asarray(out[:1])
            lat.append(time.perf_counter() - t0)
        lat_ms = np.asarray(lat) * 1e3
        print(
            f"B={batch:4d}  p50 {np.percentile(lat_ms, 50):7.2f} ms  "
            f"p99 {np.percentile(lat_ms, 99):7.2f} ms  "
            f"(budget: 20 ms HL period, 172 ms/domain)",
            flush=True,
        )


if __name__ == "__main__":
    main()
