"""Fine-grained RBD/physics stage timing on TPU: which primitive dominates
the whole-body tick (scripts/bench_wb_ablation.py puts physics at 40%,
build at 33%, finish at 24%)?

Times K-step scans at B lanes of each primitive in isolation:
contact forces, mass matrix, bias forces, Cholesky solve, site kinematics
(positions/jacobians/jdot), and the composed forward_dynamics.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from srbx.models import a1, rbd
from srbx.sim import wholebody as wb

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
K = int(sys.argv[2]) if len(sys.argv) > 2 else 200
dtype = jnp.float32
model = a1.model()
sim_cfg = wb.SimConfig()

q0 = wb.default_crouch(model, dtype)
qs = jnp.tile(q0, (B, 1)) + 0.001 * jax.random.normal(
    jax.random.key(0), (B, 18), dtype)
qds = 0.1 * jax.random.normal(jax.random.key(1), (B, 18), dtype)
taus = jax.random.normal(jax.random.key(2), (B, 18), dtype)


def timed(name, per_lane_fn, consume=None):
    """Scan K steps of vmap(per_lane_fn)(qs+eps) with a data dependence."""
    def body(carry, k):
        out = jax.vmap(per_lane_fn)(qs + carry * 1e-9, qds)
        red = (consume or (lambda o: jnp.sum(o)))(out)
        return carry + red * 0.0, ()

    f = jax.jit(lambda: jax.lax.scan(body, jnp.zeros((), dtype),
                                     jnp.arange(K))[0])
    _ = np.asarray(f())
    t0 = time.perf_counter()
    _ = np.asarray(f())
    dt = time.perf_counter() - t0
    print(f"{name:22s} {dt*1e3:9.2f} ms  ({B*K/dt:12.0f} lane-evals/s)",
          flush=True)
    return dt


timed("contact_forces", lambda q, qd: wb.contact_forces(sim_cfg, model, q, qd))
timed("mass_matrix", lambda q, qd: rbd.mass_matrix(model, q))
timed("bias_forces", lambda q, qd: rbd.bias_forces(model, q, qd))
timed("gravity only", lambda q, qd: rbd.gravity_vector(model, q))
timed("site_positions", lambda q, qd: rbd.site_positions(model, q))
timed("site_jacobians", lambda q, qd: rbd.site_jacobians(model, q))
timed("site_jdot_qd", lambda q, qd: rbd.site_jdot_qd(model, q, qd))
timed("apply_site_forces", lambda q, qd: rbd.apply_site_forces(
    model, q, jnp.ones((len(model.sites), 3), dtype)))


def chol(q, qd):
    d = rbd.mass_matrix(model, q)
    return jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(d, lower=True), qd)


t_mm = timed("mass_matrix+cho", chol)
timed("forward_dynamics", lambda q, qd: rbd.forward_dynamics(
    model, q, qd, qd, f_ext_sites=jnp.ones((len(model.sites), 3), dtype)))
timed("wb.step (2 substeps)", lambda q, qd: wb.step(
    sim_cfg, model, wb.SimState(q, qd), qd[6:]).q)
