"""ADMM (factor-once, XLA batched) vs fused IPM at the production QP shape
(simplex-eliminated condensed NMPC: n=13, me=0, mi=28), cold and
warm-started (the SCP re-solve scenario)."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from srbx.config import AdmmConfig, MpcConfig, QpConfig
from srbx.ocp import assemble, condense, default_footholds, expansion
from srbx.ops import qp_admm, qp_batch

B = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
dtype = jnp.float32
cfg = MpcConfig(elide_box_rows=True, elide_simplex=True)
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
data = [jnp.asarray(np.asarray(a)) for a in
        (data.P, data.c, data.A, data.b, data.G, data.h)]
print("condensed shapes:", [tuple(d.shape) for d in data], flush=True)

qp_cfg = QpConfig(abstol=2e-3, reltol=1e-4, reg_primal=1e-6, reg_dual=1e-6,
                  max_iters=12)


def timeit(fn, *args, reps=10, **kw):
    out = fn(*args, **kw)
    _ = np.asarray(out.x[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
        _ = np.asarray(out.x[:1])
    return (time.perf_counter() - t0) / reps, out


fn_ipm = jax.jit(lambda *d: qp_batch.solve(*d, qp_cfg, backend="fused",
                                           tile=256))
t0 = time.perf_counter()
dt, ipm = timeit(fn_ipm, *data)
print(f"fused IPM     compile+run {time.perf_counter()-t0:6.1f}s  "
      f"{dt*1e3:8.2f} ms  {B/dt:9.0f} qp/s  "
      f"conv {float(ipm.converged.mean()):.3f}", flush=True)

variants = [
    ("admm defaults", AdmmConfig(abstol=2e-3, reltol=1e-4)),
    ("admm ck=10   ", AdmmConfig(abstol=2e-3, reltol=1e-4, check_every=10,
                                 max_iters=200)),
    ("admm no-adapt", AdmmConfig(abstol=2e-3, reltol=1e-4, adapt_rho=False,
                                 check_every=10, max_iters=200)),
]
for name, acfg in variants:
    fn = jax.jit(lambda *d, a=acfg: qp_admm.solve(*d, a, backend="xla"))
    t0 = time.perf_counter()
    dt, ad = timeit(fn, *data)
    dx = float(jnp.abs(ad.x - ipm.x).max())
    print(f"{name} compile+run {time.perf_counter()-t0:6.1f}s  "
          f"{dt*1e3:8.2f} ms  {B/dt:9.0f} qp/s  "
          f"conv {float(ad.converged.mean()):.3f}  it {int(ad.iters)}  "
          f"dx_vs_ipm {dx:.2e}", flush=True)

# warm-started re-solve (the SCP scenario: same shape, perturbed data)
acfg = AdmmConfig(abstol=2e-3, reltol=1e-4, check_every=10, max_iters=200)
sol0 = jax.jit(lambda *d: qp_admm.solve(*d, acfg))(*data)
fn_w = jax.jit(lambda *d, x, y, z: qp_admm.solve(*d, acfg, x0=x, y0=y, z0=z))
t0 = time.perf_counter()
dt, adw = timeit(fn_w, *data, x=sol0.x, y=sol0.y, z=sol0.z)
print(f"admm warm     compile+run {time.perf_counter()-t0:6.1f}s  "
      f"{dt*1e3:8.2f} ms  {B/dt:9.0f} qp/s  "
      f"conv {float(adw.converged.mean()):.3f}  it {int(adw.iters)}",
      flush=True)

fn_iw = jax.jit(lambda *d, x: qp_batch.solve(*d, qp_cfg, backend="fused",
                                             tile=256, x0=x))
t0 = time.perf_counter()
dt, ipw = timeit(fn_iw, *data, x=ipm.x)
print(f"fused IPM warm compile+run {time.perf_counter()-t0:6.1f}s  "
      f"{dt*1e3:8.2f} ms  {B/dt:9.0f} qp/s  "
      f"conv {float(ipw.converged.mean()):.3f}", flush=True)
