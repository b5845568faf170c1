"""Raw fused QP at the CONDENSED NMPC shape (n=17, me=4, mi=92) — isolates
the kernel from the cycle to attribute per-cycle cost."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from srbx.config import MpcConfig, QpConfig
from srbx.ocp import assemble, condense, default_footholds, expansion
from srbx.ops import qp_batch

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
tiles = [int(a) for a in sys.argv[2:]] or [128, 256, 512]
dtype = jnp.float32
cfg = MpcConfig()
rng = np.random.default_rng(0)
x0s = jnp.asarray(rng.normal(size=(B, 4)) * 0.05, dtype)
t = np.arange(4)
ref = jnp.asarray(np.stack([0.05 + 0.02 * t, 0.4 * np.ones(4),
                            -0.01 * np.ones(4), np.zeros(4)]), dtype)

def one(x0):
    foot = default_footholds(jnp.asarray([0.0, 0.0], dtype))
    data = assemble(cfg, x0, ref, foot, jnp.ones(4, dtype), dtype=dtype)
    e_mat, e0 = expansion(cfg, x0, foot, jnp.ones(4, dtype), dtype=dtype)
    return condense(cfg, data, e_mat, e0)

data = jax.jit(jax.vmap(one))(x0s)
data = jax.tree.map(lambda a: np.asarray(a), data)
data = [jnp.asarray(a) for a in data]
print("condensed shapes:", [tuple(d.shape) for d in data], flush=True)
qp_cfg = QpConfig(abstol=2e-3, reltol=1e-4, reg_primal=1e-6, reg_dual=1e-6,
                  max_iters=12)

for tile in tiles:
    fn = jax.jit(lambda *d, ti=tile: qp_batch.solve(
        *d, qp_cfg, backend="fused", tile=ti).x)
    out = fn(*data)
    _ = np.asarray(out[:1])
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*data)
        _ = np.asarray(out[:1])
    dt = (time.perf_counter() - t0) / reps
    print(f"tile={tile:4d} raw fused QP {dt*1e3:8.2f} ms  ({B/dt:9.0f} qp/s)",
          flush=True)
