"""Device-only latency at B=1: separate TPU compute time from the remote
tunnel's dispatch overhead (VERDICT r1 weak-1).

Method: jit a lax.scan of K identical steps and time it end-to-end for two
K values; the slope (t_K2 - t_K1)/(K2 - K1) is the pure on-device time per
step (host dispatch, tunnel round-trip, and result transfer cancel in the
difference). The single-dispatch wall time of the same step is reported
next to it — the gap IS the tunnel.

Budgets (BASELINE.md): HL NMPC cycle < 20 ms (hardware thread period),
LL tick < 1 ms (1 kHz), both at B=1.

    python scripts/bench_latency_device.py [reps]
"""
import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from srbx import agent as agent_mod
from srbx import mpc as mpc_mod
from srbx import refplan
from srbx.config import (Gait, LowLevelConfig, MotionConfig, MpcConfig,
                         QpConfig)
from srbx.models import a1, rbd
from srbx.ops import qp as qp_mod
from srbx.sim import wholebody as wb

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
DT = jnp.float32
M = a1.model()
LL, MO, SIM = LowLevelConfig(), MotionConfig(), wb.SimConfig()
QP = QpConfig(abstol=2e-3, reltol=1e-4, reg_primal=1e-6, reg_dual=1e-6,
              max_iters=12)
QP_LL = dataclasses.replace(QP, ruiz_iters=max(QP.ruiz_iters, 5))
MPC = MpcConfig(use_sqp=True, sqp_iters=1, condensed=True,
                elide_box_rows=True, elide_simplex=True)


def _sync(out):
    """Hard host sync: fetch one element. block_until_ready does not
    reliably synchronize through the axon tunnel (same caveat as bench.py);
    fetching forces execution + a fixed tiny transfer that cancels in the
    scan-length slope."""
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(leaf.ravel()[:1])


def measure(fn, args, k1, k2):
    """Per-step device time via the scan-length slope, plus the
    single-dispatch wall time (p50 over REPS)."""
    f1 = jax.jit(lambda a: fn(a, k1))
    f2 = jax.jit(lambda a: fn(a, k2))
    _sync(f1(args))
    _sync(f2(args))
    t1s, t2s = [], []
    for _ in range(REPS):
        t0 = time.perf_counter()
        _sync(f1(args))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _sync(f2(args))
        t2s.append(time.perf_counter() - t0)
    t1 = float(np.median(t1s))
    t2 = float(np.median(t2s))
    dev_per_step = (t2 - t1) / (k2 - k1)
    # single-dispatch wall (k=1 scan), fetch included — the deployment view
    g = jax.jit(lambda a: fn(a, 1))
    _sync(g(args))
    tw = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        _sync(g(args))
        tw.append(time.perf_counter() - t0)
    return dev_per_step, float(np.median(tw))


def ll_setup():
    q0 = wb.default_crouch(M, DT)
    sim = wb.SimState(q0, jnp.zeros(18, DT))
    ast = agent_mod.init(MO, M, q0, DT)
    ast = ast._replace(planner=ast.planner._replace(
        stand_from=q0[0:3], dom_ticks=jnp.asarray(800.0, DT)))

    def stand(carry, _):
        sim, ast = carry
        force = wb.foot_force_measurement(SIM, M, sim)
        data, ctx = agent_mod.tick_build(LL, MO, M, Gait.STAND, ast, sim.q,
                                         sim.qd, force, reduced=True)
        sol = qp_mod.solve(data.P, data.c, data.A, data.b, data.G, data.h,
                           QP_LL)
        llo, ast, _ = agent_mod.tick_finish(LL, ctx, sim.q, sim.qd, sol.x,
                                            sol.converged, reduced=True)
        return (wb.step(SIM, M, sim, llo.tau), ast), None

    (sim, ast), _ = jax.jit(lambda s, a: jax.lax.scan(
        stand, (s, a), None, length=800))(sim, ast)
    return jax.block_until_ready((sim, ast))


def ll_chain(args, k):
    """k whole-body LL ticks: build(reduced) -> QP -> finish -> plant."""
    sim, ast = args

    def tick(carry, _):
        sim, ast = carry
        force = wb.foot_force_measurement(SIM, M, sim)
        data, ctx = agent_mod.tick_build(
            LL, MO, M, Gait.TROT, ast, sim.q, sim.qd, force,
            allow_contact_trigger=True, reduced=True)
        sol = qp_mod.solve(data.P, data.c, data.A, data.b, data.G, data.h,
                           QP_LL)
        llo, ast, _ = agent_mod.tick_finish(LL, ctx, sim.q, sim.qd, sol.x,
                                            sol.converged, reduced=True)
        return (wb.step(SIM, M, sim, llo.tau), ast), None

    (sim, ast), _ = jax.lax.scan(tick, (sim, ast), None, length=k)
    return sim.q


def ll_chain_fused(args, k):
    """k whole-body LL ticks at B=1 through the BATCH path: fused Pallas
    LL-QP + lanes-last SPD kernels (a 1-lane tile is mostly padding, but
    the kernels' latency beats XLA's per-lane tiny-matrix loops)."""
    from srbx.sim import closedloop as cl

    sim, ast = args
    sims = jax.tree.map(lambda x: x[None], sim)
    asts = jax.tree.map(lambda x: x[None], ast)

    def tick(carry, _):
        sims, asts = carry
        forces = jax.vmap(
            lambda s: wb.foot_force_measurement(SIM, M, s))(sims)
        ll_outs, asts, _ = cl._tick_batch(
            LL, MO, QP_LL, M, Gait.TROT, asts, sims.q, sims.qd, forces,
            "fused", 128, allow_contact_trigger=True, reduced=True)
        sims = wb.step_batch(SIM, M, sims, ll_outs.tau, backend="fused",
                             tile=128)
        return (sims, asts), None

    (sims, asts), _ = jax.lax.scan(tick, (sims, asts), None, length=k)
    return sims.q


def hl_setup():
    p_start = jnp.asarray([0.0, 0.0], DT)
    pobs = jnp.asarray(
        np.stack([np.random.default_rng(0).uniform(2.0, 8.0, 20),
                  np.random.default_rng(1).uniform(-2.0, 2.0, 20)]), DT)
    ref = refplan.generate(refplan.two_agent_config(loop_size=8_000),
                           jnp.asarray([0.0, 0.0, 0.0, -1.0], DT), pobs,
                           dtype=DT)
    q0 = wb.default_crouch(M, DT)
    toe_xy = rbd.site_positions(M, q0)[a1.TOE_SITES][:, 0:2].T
    carry = mpc_mod.init_carry(p_start, DT)
    ci = jnp.asarray([0.0, 1.0, 1.0, 0.0], DT)
    return (carry, p_start, toe_xy, ci, ref.pr[0:2], ref.prd[0:2], pobs)


def hl_chain(args, k):
    """k chained NMPC cycles (production condensed+SQP config)."""
    carry0, p_start, toe_xy, ci, pr, prd, pobs = args

    def cyc(carry, _):
        out = mpc_mod.run_nmpc(
            MPC, QP, carry, carry.alpha_buffer[jnp.asarray([0, 2])],
            carry.alpha_buffer[jnp.asarray([1, 3])], toe_xy, ci, pr, prd,
            p_start, pobs)
        return out.carry, out.qp_converged

    carry, ok = jax.lax.scan(cyc, carry0, None, length=k)
    return carry.alpha_buffer, ok


if __name__ == "__main__":
    print(f"platform: {jax.devices()[0].platform} ({jax.devices()[0]})")

    dev, wall = measure(hl_chain, hl_setup(), 8, 40)
    print(f"HL NMPC cycle  B=1: device {dev*1e3:7.3f} ms/cycle   "
          f"single-dispatch wall {wall*1e3:7.2f} ms   "
          f"(budget 20 ms thread period; dispatch gap = tunnel)")

    ll_args = ll_setup()
    dev_ll, wall_ll = measure(ll_chain, ll_args, 16, 80)
    print(f"LL whole-body tick B=1: device {dev_ll*1e3:7.3f} ms/tick    "
          f"single-dispatch wall {wall_ll*1e3:7.2f} ms   "
          f"(budget 1 ms @ 1 kHz)")

    dev_llf, wall_llf = measure(ll_chain_fused, ll_args, 16, 80)
    print(f"LL tick B=1 (fused/SPD batch path): device {dev_llf*1e3:7.3f} "
          f"ms/tick    single-dispatch wall {wall_llf*1e3:7.2f} ms   "
          f"(budget 1 ms @ 1 kHz)")
