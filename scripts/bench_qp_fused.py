"""TPU A/B: fused single-kernel IPM vs step-fused pallas/xla backends.

Runs the padded NMPC QP shape (n=41, me=28, mi=92) at B lanes, checks the
fused kernel against the XLA path in f32, and times all three backends.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from srbx.config import MpcConfig, QpConfig
from srbx.ocp import assemble, default_footholds
from srbx.ops import qp_batch


def nmpc_batch(B, dtype=jnp.float32):
    cfg = MpcConfig()
    rng = np.random.default_rng(0)
    x0s = rng.normal(size=(B, 4)) * 0.05
    t = np.arange(4)

    def one(x0v):
        x0 = jnp.asarray(x0v, dtype)
        ref = jnp.asarray(
            np.stack([0.05 + 0.02 * t, 0.4 * np.ones(4), -0.01 * np.ones(4),
                      np.zeros(4)]), dtype)
        foot = default_footholds(jnp.asarray([0.0, 0.0], dtype))
        return assemble(cfg, x0, ref, foot, jnp.ones(4, dtype), dtype=dtype)

    ds = [one(x) for x in x0s]
    return [jnp.stack(z) for z in zip(*ds)]


def timeit(f, reps=20):
    out = f()
    _ = np.asarray(out.x[:1])          # hard sync through the tunnel
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f()
        _ = np.asarray(out.x[:1])
    return (time.perf_counter() - t0) / reps, out


def main():
    B = 1024
    qp_cfg = QpConfig(abstol=2e-3, reltol=1e-4, reg_primal=1e-6,
                      reg_dual=1e-6, max_iters=12)
    data = nmpc_batch(B)
    print("shapes:", [tuple(d.shape) for d in data], flush=True)

    results = {}
    sols = {}
    for backend, tile in [("fused", 128), ("pallas", 256), ("xla", 256)]:
        f = jax.jit(lambda be=backend, ti=tile: qp_batch.solve(
            *data, qp_cfg, backend=be, tile=ti))
        t0 = time.perf_counter()
        dt, out = timeit(f)
        print(f"{backend:8s} compile+run {time.perf_counter()-t0:7.1f}s  "
              f"per-solve-batch {dt*1e3:8.3f} ms  "
              f"solves/s {B/dt:10.0f}  conv {float(out.converged.mean()):.3f}  "
              f"res {float(out.res.max()):.2e}  iters {int(out.iters)}",
              flush=True)
        results[backend] = dt
        sols[backend] = np.asarray(out.x)

    dx = np.abs(sols["fused"] - sols["xla"]).max()
    print(f"max |x_fused - x_xla| = {dx:.3e}")
    print(f"speedup fused vs pallas: {results['pallas']/results['fused']:.2f}x"
          f"   vs xla: {results['xla']/results['fused']:.2f}x")


if __name__ == "__main__":
    main()
