"""Production-point fused-QP microbench: the exact condensed NMPC QP the
headline cycle solves (elide_box_rows + elide_simplex: n=13, mi=28), f32,
bench tolerances, B lanes.

Usage: python scripts/bench_qp_prod.py [B] [tile] [--noeq]
  --noeq  strip the inert (0 = 0) equality row condense keeps so the
          kernel takes its me=0 specialization (skips the Schur stage).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from srbx.config import MpcConfig, QpConfig
from srbx.ocp import assemble, condense, default_footholds, expansion
from srbx.ops import qp_batch

argv = [a for a in sys.argv[1:] if not a.startswith("--")]
B = int(argv[0]) if argv else 131072
tile = int(argv[1]) if len(argv) > 1 else 512
noeq = "--noeq" in sys.argv

cfg = MpcConfig(use_sqp=True, sqp_iters=2, elide_box_rows=True,
                elide_simplex=True)
qp_cfg = QpConfig(abstol=2e-3, reltol=1e-4, reg_primal=1e-6,
                  reg_dual=1e-6, max_iters=12, kkt_refine_iters=0)
dtype = jnp.float32

rng = np.random.default_rng(0)
x0s = rng.normal(size=(B, 4)).astype(np.float32) * 0.05
t = np.arange(4)
ref0 = np.stack([0.05 + 0.02 * t, 0.4 * np.ones(4), -0.01 * np.ones(4),
                 np.zeros(4)]).astype(np.float32)


def build(x0v):
    x0 = jnp.asarray(x0v, dtype)
    ref = jnp.asarray(ref0, dtype)
    foot = default_footholds(jnp.asarray([0.0, 0.0], dtype))
    ci = jnp.asarray([0.0, 1.0, 1.0, 0.0], dtype)
    data = assemble(cfg, x0, ref, foot, ci, dtype=dtype)
    e_mat, e0 = expansion(cfg, x0, foot, ci, dtype=dtype)
    return condense(cfg, data, e_mat, e0)


data = jax.jit(jax.vmap(build))(x0s)
if noeq:
    data = type(data)(data.P, data.c, data.A[:, :0], data.b[:, :0],
                      data.G, data.h)
print("shapes: P", data.P.shape, "A", data.A.shape, "G", data.G.shape,
      flush=True)


@jax.jit
def run(P, c, A, b, G, h):
    sol = qp_batch.solve(P, c, A, b, G, h, qp_cfg, backend="fused",
                         tile=tile)
    return sol.x, sol.converged


args = tuple(data)
out = run(*args)
_ = np.asarray(out[0][:1])
reps = 20
# synced: one host<->device round-trip per rep (includes ~28 ms of axon
# tunnel latency per rep on this host — measured, see docs/ROUND5.md)
t0 = time.perf_counter()
for _ in range(reps):
    out = run(*args)
    _ = np.asarray(out[0][:1])
dt_sync = (time.perf_counter() - t0) / reps
# pipelined: enqueue all reps, sync once — device-throughput number
t0 = time.perf_counter()
for _ in range(reps):
    out = run(*args)
_ = np.asarray(out[0][:1])
dt_pipe = (time.perf_counter() - t0) / reps
conv = float(np.mean(np.asarray(out[1], np.float64)))
print(f"B={B} tile={tile} noeq={noeq}: synced {dt_sync*1e3:.2f} ms "
      f"({B/dt_sync:,.0f} qp/s) | pipelined {dt_pipe*1e3:.2f} ms "
      f"({B/dt_pipe:,.0f} qp/s) conv={conv:.4f}")
