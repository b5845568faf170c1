"""TPU A/B of the full NMPC cycle: backend x condensed x batch.

One cycle = reference window + assembly + QP + 2 SCP CBF iterations +
Bezier fit (the per-agent 20 ms workload of the reference HL thread).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as g
from srbx import mpc, mpc_batch, refplan
from srbx.config import MpcConfig, QpConfig
from srbx.ocp import default_footholds


def setup(batch, dtype=jnp.float32):
    p_start, pobs, ref = g._setup(dtype)
    agent0 = p_start[:2]
    q = jnp.tile(agent0, (batch, 1)) + jnp.linspace(0, 0.01, batch, dtype=dtype)[:, None]
    dq = jnp.zeros((batch, 2), dtype)
    dom = jnp.zeros((batch,), jnp.int32)
    alpha = jnp.stack([q[:, 0], jnp.zeros(batch, dtype), q[:, 1],
                       jnp.zeros(batch, dtype)], axis=1)
    ci = jnp.tile(jnp.asarray([0.0, 1.0, 1.0, 0.0], dtype), (batch, 1))
    pr = jnp.tile(ref.pr[0:2], (batch, 1, 1))
    prd = jnp.tile(ref.prd[0:2], (batch, 1, 1))
    a0s = jnp.tile(agent0, (batch, 1))
    pobs_b = jnp.tile(pobs, (batch, 1, 1))
    toes = jnp.tile(default_footholds(agent0), (batch, 1, 1))
    return dom, alpha, q, dq, toes, ci, pr, prd, a0s, pobs_b


def main():
    cfg0 = MpcConfig(use_sqp=True, sqp_iters=2)
    qp_cfg = QpConfig(abstol=2e-3, reltol=1e-4, reg_primal=1e-6,
                      reg_dual=1e-6, max_iters=12)
    combos = [
        ("fused", 128, False, 1024),
        ("fused", 128, True, 1024),
        ("fused", 256, True, 1024),
        ("pallas", 256, True, 1024),
        ("fused", 128, True, 4096),
        ("fused", 256, True, 4096),
    ]
    xs = {}
    for backend, tile, condensed, batch in combos:
        dom, alpha, q, dq, toes, ci, pr, prd, a0s, pobs_b = setup(batch)

        def fn(dom, alpha, q, dq, ci, be=backend, ti=tile, cd=condensed):
            out = mpc_batch.run_nmpc_batch(
                cfg0, qp_cfg, mpc.MpcCarry(dom, alpha), q, dq, toes, ci,
                pr, prd, a0s, pobs_b, backend=be, tile=ti, condensed=cd,
            )
            return out.states, out.qp_converged
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        out = jfn(dom, alpha, q, dq, ci)
        _ = np.asarray(out[0][:1])
        compile_s = time.perf_counter() - t0
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            out = jfn(dom, alpha, q, dq, ci)
            _ = np.asarray(out[0][:1])
        dt = (time.perf_counter() - t0) / reps
        conv = float(np.asarray(out[1]).mean())
        key = (backend, condensed, batch)
        xs[key] = np.asarray(out[0])
        print(f"{backend:7s} tile={tile:4d} condensed={int(condensed)} "
              f"B={batch:5d}  compile {compile_s:6.1f}s  cycle {dt*1e3:8.2f} ms "
              f" solves/s {batch/dt:9.0f}  conv {conv:.3f}", flush=True)
    k_full = ("fused", False, 1024)
    k_cond = ("fused", True, 1024)
    if k_full in xs and k_cond in xs:
        d = np.abs(xs[k_full] - xs[k_cond]).max()
        print(f"max |states_full - states_condensed| = {d:.3e}")


if __name__ == "__main__":
    main()
