"""Per-stage wall-clock ablation of the NMPC cycle at a large batch.

Times progressively larger slices of the cycle (all jitted separately) to
attribute the per-cycle cost: assembly+condense | +QP | +SQP(2) | +fit.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from scripts.bench_cycle_ab import setup

from srbx import mpc, mpc_batch, sqp
from srbx.config import MpcConfig, QpConfig
from srbx.ocp import assemble, condense, expansion, reference_window, default_footholds
from srbx.ops import qp_batch
from srbx.ops.bezier import fit_domain_bezier

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
cfg = MpcConfig(use_sqp=True, sqp_iters=2, elide_box_rows=True,
                elide_simplex=True)
qp_cfg = QpConfig(abstol=2e-3, reltol=1e-4, reg_primal=1e-6, reg_dual=1e-6,
                  max_iters=12)
dom, alpha, q, dq, toes, ci, pr, prd, a0s, pobs_b = setup(B)
dtype = q.dtype


def build_stage(dom, alpha, q, dq, ci):
    def one(dom_a, alpha_a, qq, dqq, toe, cc, pr_a, prd_a, a0):
        x0 = jnp.stack([qq[0], dqq[0], qq[1], dqq[1]])
        ref = reference_window(pr_a, prd_a, 0, dom_a, cfg.horizon)
        nominal = default_footholds(a0)
        use_nominal = dom_a <= 1
        foot = jnp.where(use_nominal, nominal, toe)
        cc2 = jnp.where(use_nominal, jnp.ones_like(cc), cc)
        data = assemble(cfg, x0, ref, foot, cc2, dtype=dtype)
        e_mat, e0 = expansion(cfg, x0, foot, cc2, dtype=dtype)
        return condense(cfg, data, e_mat, e0), e_mat, e0
    return jax.vmap(one)(dom, alpha, q, dq, toes, ci, pr, prd, a0s)


def timed(label, jfn, *args):
    out = jfn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    reps = 5
    # pipelined: enqueue all reps, sync once (device throughput; the
    # per-rep sync pays ~28 ms of axon tunnel RTT per rep — see ROUND5.md)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:28s} {dt*1e3:9.2f} ms  ({B/dt:9.0f} /s)", flush=True)
    return dt


j_build = jax.jit(lambda *a: build_stage(*a)[0].P)
t_build = timed("assembly+condense", j_build, dom, alpha, q, dq, ci)

def qp_only(dom, alpha, q, dq, ci):
    data, _, _ = build_stage(dom, alpha, q, dq, ci)
    return qp_batch.solve(*data, qp_cfg, backend="fused", tile=512).x
t_qp = timed("+ 1 QP (fused)", jax.jit(qp_only), dom, alpha, q, dq, ci)

def full(dom, alpha, q, dq, ci, iters):
    out = mpc_batch.run_nmpc_batch(
        MpcConfig(use_sqp=iters > 0, sqp_iters=max(iters, 1)), qp_cfg,
        mpc.MpcCarry(dom, alpha), q, dq, toes, ci, pr, prd, a0s, pobs_b,
        backend="fused", tile=512, condensed=True)
    return out.states
t_c0 = timed("cycle, 0 SCP iters", jax.jit(lambda *a: full(*a, 0)), dom, alpha, q, dq, ci)
t_c1 = timed("cycle, 1 SCP iter", jax.jit(lambda *a: full(*a, 1)), dom, alpha, q, dq, ci)
t_c2 = timed("cycle, 2 SCP iters", jax.jit(lambda *a: full(*a, 2)), dom, alpha, q, dq, ci)
print(f"per-IPM-solve marginal: {1e3*(t_c2-t_c1):.2f} ms; "
      f"assembly share {100*t_build/t_c2:.0f}%; QP1 share {100*(t_qp-t_build)/t_c2:.0f}%")
