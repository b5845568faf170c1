"""Whole-body tick cost attribution on TPU: where does the 1 kHz unit of
work go?  Times K-tick scans of (a) the full tick (RBD build + LL QP +
finish + physics), (b) build+physics only (QP replaced by zero torque),
(c) LL-QP only on prebuilt data, (d) physics only.  B lanes, steady state
after stand-up."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from srbx import agent as agent_mod
from srbx.config import LowLevelConfig, MotionConfig, QpConfig
from srbx.gait import Gait
from srbx.models import a1
from srbx.sim import closedloop as cl
from srbx.sim import wholebody as wb
from srbx.ops import qp_batch

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
K = int(sys.argv[2]) if len(sys.argv) > 2 else 200
reduced = (sys.argv[3] if len(sys.argv) > 3 else "r") == "r"
dtype = jnp.float32
model = a1.model()
BACKEND = "fused" if jax.devices()[0].platform not in ("cpu", "gpu") else "xla"

ll_cfg = LowLevelConfig()
motion_cfg = MotionConfig()
sim_cfg = wb.SimConfig()
loop = cl.LoopConfig(stand_ticks=800, n_domains=1)
qp_cfg = QpConfig(abstol=2e-3, reltol=1e-4, reg_primal=1e-6, reg_dual=1e-6,
                  max_iters=12)
ll_qp_cfg = cl._resolve_ll_qp_cfg(qp_cfg, reduced, None)

a0 = jnp.zeros((B, 2), dtype) + jnp.linspace(0, 0.01, B, dtype=dtype)[:, None]
sims, asts, _ = cl._init_lanes(motion_cfg, loop, model, a0, dtype)
sims, asts, _ = jax.jit(lambda s, a: cl._stand_phase(
    ll_cfg, motion_cfg, ll_qp_cfg, sim_cfg, loop, model, s, a,
    BACKEND, 256, reduced))(sims, asts)
_ = np.asarray(sims.q[:1])
print(f"stood up: B={B} reduced={reduced}", flush=True)


def timed(name, fn, *args):
    f = jax.jit(fn)
    sync = lambda o: np.asarray(jax.tree.leaves(o)[0]).reshape(-1)[:1]
    _ = sync(f(*args))
    t0 = time.perf_counter()
    _ = sync(f(*args))
    dt = time.perf_counter() - t0
    print(f"{name:18s} {dt*1e3:9.2f} ms  ({B*K/dt:10.0f} lane-ticks/s)",
          flush=True)
    return dt


def full(sims, asts):
    def tick(c, k):
        sims, asts = c
        forces = jax.vmap(
            lambda s: wb.foot_force_measurement(sim_cfg, model, s))(sims)
        ll_outs, asts, _ = cl._tick_batch(
            ll_cfg, motion_cfg, ll_qp_cfg, model, Gait.TROT, asts,
            sims.q, sims.qd, forces, BACKEND, 256,
            force_new_domain=(k == 0), allow_contact_trigger=False,
            reduced=reduced)
        sims = wb.step_batch(sim_cfg, model, sims, ll_outs.tau,
                             backend=BACKEND, tile=256)
        return (sims, asts), ()
    (sims, asts), _ = jax.lax.scan(tick, (sims, asts), jnp.arange(K))
    return sims.q


def build_only(sims, asts):
    from srbx.models import rbd
    from srbx.ops import spd

    def tick(c, k):
        sims, asts = c
        forces = jax.vmap(
            lambda s: wb.foot_force_measurement(sim_cfg, model, s))(sims)
        # mirror _tick_batch's production build: batched lanes-last D^-1
        if BACKEND != "xla":
            d_b = jax.vmap(lambda q: rbd.mass_matrix(model, q))(sims.q)
            d_inv_b = spd.inverse(d_b, backend="fused", tile=256)
        else:
            d_inv_b = None
        def build(st, q, qd, f, dinv):
            return agent_mod.tick_build(
                ll_cfg, motion_cfg, model, Gait.TROT, st, q, qd, f,
                force_new_domain=(k == 0), allow_contact_trigger=False,
                reduced=reduced, d_inv=dinv)
        in_axes = (0, 0, 0, 0, 0 if d_inv_b is not None else None)
        data, ctx = jax.vmap(build, in_axes=in_axes)(
            asts, sims.q, sims.qd, forces, d_inv_b)
        tau = jnp.zeros_like(sims.q[:, 6:]) + data.c[:, :1] * 0.0
        sims = wb.step_batch(sim_cfg, model, sims, tau, backend=BACKEND,
                             tile=256)
        return (sims, asts), ()
    (sims, asts), _ = jax.lax.scan(tick, (sims, asts), jnp.arange(K))
    return sims.q


def physics_only(sims):
    def tick(s, _):
        s = wb.step_batch(sim_cfg, model, s, jnp.zeros_like(s.q[:, 6:]),
                          backend=BACKEND, tile=256)
        return s, ()
    s, _ = jax.lax.scan(tick, sims, jnp.arange(K))
    return s.q


# prebuild one tick's QP data for the solve-only scan
forces0 = jax.vmap(lambda s: wb.foot_force_measurement(sim_cfg, model, s))(sims)
data0 = jax.jit(jax.vmap(lambda st, q, qd, f: agent_mod.tick_build(
    ll_cfg, motion_cfg, model, Gait.TROT, st, q, qd, f,
    force_new_domain=True, allow_contact_trigger=False,
    reduced=reduced)[0]))(asts, sims.q, sims.qd, forces0)
data0 = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), data0)


def solve_only(P, c, A, b, G, h):
    def tick(carry, _):
        sol = qp_batch.solve(P, c, A, b, G, h, ll_qp_cfg,
                             backend=BACKEND, tile=256)
        return carry + sol.x.sum(), ()
    out, _ = jax.lax.scan(tick, jnp.zeros((), dtype), jnp.arange(K))
    return out


t_full = timed("full tick", full, sims, asts)
t_build = timed("build+physics", build_only, sims, asts)
t_phys = timed("physics only", physics_only, sims)
t_solve = timed("LL-QP only", solve_only, data0.P, data0.c, data0.A,
                data0.b, data0.G, data0.h)
print(f"\nattribution (of full {t_full*1e3:.1f} ms): "
      f"physics {100*t_phys/t_full:.0f}%  "
      f"build(RBD+assembly) {100*(t_build-t_phys)/t_full:.0f}%  "
      f"LL-QP {100*t_solve/t_full:.0f}%  "
      f"finish/other {100*(t_full-t_build-t_solve)/t_full:.0f}%",
      flush=True)
