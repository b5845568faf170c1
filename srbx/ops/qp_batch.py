"""Batch-native IPM: the TPU hot path for thousands of tiny QPs.

Same Mehrotra predictor-corrector as srbx.ops.qp, but written directly over
a leading batch axis instead of vmap:

  * dense products (GᵀWG, A M⁻¹Aᵀ, residuals) stay batch-leading — XLA lowers
    them to batched matmuls;
  * the sequential factorizations/substitutions run through the lanes-last
    kernels of srbx.ops.batch_linalg (batch in the 128-wide lane axis,
    matrix loops unrolled) — the layout XLA's generic batched Cholesky does
    not pick for tiny matrices;
  * fixed iteration structure with per-lane freeze masks; one global
    all-converged early exit.

Semantics (tolerances, padding conventions, NaN freezing) match srbx.ops.qp;
equality of results is test-enforced.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from srbx.config import QpConfig
from srbx.ops import batch_linalg as bl


class BatchSolution(NamedTuple):
    x: jax.Array          # (B, n)
    y: jax.Array          # (B, me)
    z: jax.Array          # (B, mi)
    s: jax.Array          # (B, mi)
    iters: jax.Array      # () iterations executed
    converged: jax.Array  # (B,)
    res: jax.Array        # (B,)
    gap: jax.Array        # (B,)


def make_backend(backend: str = "xla", tile: int = 256, interpret: bool = False):
    """Factorization backend: ("xla" | "lanes" | "pallas").

    Returns (chol, cho_solve) with chol: (B,k,k) -> opaque factor and
    cho_solve(factor, rhs) for rhs (B,k,r) or (B,k).

    Measured on TPU v5e at the NMPC shapes: "pallas" (lanes-last VMEM
    kernels) ~3.8x faster than "xla" (jnp.linalg.cholesky); "lanes"
    (pure-JAX unrolled) is slower on TPU and kept for reference/CPU.
    """
    if backend == "xla":

        def chol(m):
            return jnp.linalg.cholesky(m)

        def cho_solve(l, rhs):
            vec = rhs.ndim == 2
            r = rhs[..., None] if vec else rhs
            t = jax.scipy.linalg.solve_triangular(l, r, lower=True)
            out = jax.scipy.linalg.solve_triangular(
                jnp.swapaxes(l, -1, -2), t, lower=False
            )
            return out[..., 0] if vec else out

    elif backend == "lanes":

        def chol(m):
            return bl.cholesky_lanes(jnp.moveaxis(m, 0, -1))

        def cho_solve(lt, rhs):
            vec = rhs.ndim == 2
            r = rhs[..., None] if vec else rhs
            out = jnp.moveaxis(
                bl.cho_solve_lanes(lt, jnp.moveaxis(r, 0, -1)), -1, 0
            )
            return out[..., 0] if vec else out

    elif backend == "pallas":
        from srbx.ops import pallas_linalg as plin

        def _pad(x):
            b = x.shape[-1]
            pad = (-b) % tile
            if pad:
                x = jnp.concatenate([x, x[..., :pad]], axis=-1)
            return x, b

        def chol(m):
            mt, b = _pad(jnp.moveaxis(m, 0, -1))
            return plin.cholesky(mt, tile=tile, interpret=interpret), b

        def cho_solve(fac, rhs):
            lt, b = fac
            vec = rhs.ndim == 2
            r = rhs[..., None] if vec else rhs
            rt, _ = _pad(jnp.moveaxis(r, 0, -1))
            out = plin.cho_solve(lt, rt, tile=tile, interpret=interpret)
            out = jnp.moveaxis(out[..., :b], -1, 0)
            return out[..., 0] if vec else out

    else:
        raise ValueError(f"unknown backend {backend!r}")
    return chol, cho_solve


def _factor(P, A, G, w, delta_p, delta_d, chol, cho_solve):
    n = P.shape[-1]
    me = A.shape[-2]
    gw = G * w[..., None]                         # (B, mi, n)
    m_mat = P + jnp.einsum("bin,bim->bnm", gw, G)
    m_mat = m_mat + delta_p * jnp.eye(n, dtype=P.dtype)
    l_m = chol(m_mat)
    minv_at = cho_solve(l_m, jnp.swapaxes(A, -1, -2))    # (B, n, me)
    s_mat = A @ minv_at + delta_d * jnp.eye(me, dtype=P.dtype)
    l_s = chol(s_mat)
    return l_m, l_s, minv_at


def _solve_kkt(l_m, l_s, minv_at, A, r1, r2, cho_solve):
    t = cho_solve(l_m, r1)
    dy = cho_solve(l_s, jnp.einsum("bmn,bn->bm", A, t) - r2)
    dx = t - jnp.einsum("bnm,bm->bn", minv_at, dy)
    return dx, dy


def _solve_kkt_refined(l_m, l_s, minv_at, P, A, G, w, r1, r2, cho_solve,
                       iters: int):
    """_solve_kkt + `iters` rounds of iterative refinement against the
    UNregularized operator [P+GᵀWG  Aᵀ; A  0] — the batched analogue of
    srbx.ops.qp._kkt_solve_refined (the two paths are equivalence
    test-enforced; see that docstring for why the static shifts must be
    refined away after Ruiz equilibration)."""
    dx, dy = _solve_kkt(l_m, l_s, minv_at, A, r1, r2, cho_solve)
    for _ in range(iters):
        gdx = jnp.einsum("bmn,bn->bm", G, dx)
        t1 = r1 - (jnp.einsum("bnm,bm->bn", P, dx)
                   + jnp.einsum("bmn,bm->bn", G, w * gdx)
                   + jnp.einsum("bmn,bm->bn", A, dy))
        t2 = r2 - jnp.einsum("bmn,bn->bm", A, dx)
        ddx, ddy = _solve_kkt(l_m, l_s, minv_at, A, t1, t2, cho_solve)
        dx = dx + ddx
        dy = dy + ddy
    return dx, dy


def _step_len(v, dv):
    ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
    return jnp.minimum(1.0, jnp.min(ratio, axis=-1))


def solve(P, c, A, b, G, h, cfg: QpConfig = QpConfig(), backend: str = "xla",
          tile: int = 256, interpret: bool = False, x0=None):
    """All operands batch-leading: (B, ...). x0 optionally warm-starts the
    primal iterate (the SQP handoff).

    backend="fused" dispatches to the fully-fused single-kernel Pallas IPM
    (srbx.ops.qp_fused): the entire solve — all iterations — runs in one
    kernel with VMEM-resident state."""
    if A.shape[-2] == 0 and (cfg.ruiz_iters or backend != "fused"):
        # the step-fused pallas/lanes/xla backends (and the ruiz
        # equilibration) need me >= 1 buffer shapes; an inert (0 = 0) row
        # with the quasidefinite dual regularization keeps dy = 0, so the
        # solution is unchanged (the fused backend instead specializes the
        # kernel to skip the Schur-complement stage entirely — see
        # qp_fused noeq)
        bsz, n = c.shape
        sol = solve(
            P, c, jnp.zeros((bsz, 1, n), c.dtype),
            jnp.zeros((bsz, 1), c.dtype), G, h, cfg, backend=backend,
            tile=tile, interpret=interpret, x0=x0,
        )
        return sol._replace(y=sol.y[:, :0])
    if cfg.ruiz_iters:
        import dataclasses

        from srbx.ops import qp as qp_ref

        data, (d, e, f, kappa) = jax.vmap(
            lambda p_, c_, a_, g_, h_, b_: qp_ref.ruiz_equilibrate(
                p_, c_, a_, g_, h_, b_, cfg.ruiz_iters
            )
        )(P, c, A, G, h, b)
        x0_s = x0 / d if x0 is not None else None
        sol = solve(
            *data,
            dataclasses.replace(cfg, ruiz_iters=0),
            backend=backend, tile=tile, interpret=interpret, x0=x0_s,
        )
        return BatchSolution(
            x=sol.x * d,
            y=sol.y * e / kappa[:, None],
            z=sol.z * f / kappa[:, None],
            s=sol.s / f,
            iters=sol.iters,
            converged=sol.converged,
            res=sol.res,
            gap=sol.gap,
        )
    if backend == "fused":
        from srbx.ops import qp_fused

        return qp_fused.solve(P, c, A, b, G, h, cfg, tile=tile,
                              interpret=interpret, x0=x0)
    # IPM conditioning needs true-f32 matmuls: TPU default precision runs
    # f32 matmuls as bf16 passes, which stalls convergence at ~1e-1 residuals
    # (measured: conv 82% vs 100% at the NMPC shapes). The fused kernel is
    # immune (VPU arithmetic); the einsum paths must opt out explicitly.
    with jax.default_matmul_precision("highest"):
        return _solve_impl(P, c, A, b, G, h, cfg, backend, tile, interpret, x0)


def _solve_impl(P, c, A, b, G, h, cfg, backend, tile, interpret, x0):
    dtype = P.dtype
    bsz, n = c.shape
    me = A.shape[-2]
    mi = G.shape[-2]
    chol, cho_solve = make_backend(backend, tile=tile, interpret=interpret)

    ones_w = jnp.ones((bsz, mi), dtype)
    l_m, l_s, minv_at = _factor(P, A, G, ones_w, 1.0, cfg.reg_dual, chol, cho_solve)
    x, y = _solve_kkt(l_m, l_s, minv_at, A,
                      -c + jnp.einsum("bmn,bm->bn", G, h), b, cho_solve)
    if x0 is not None:
        x = x0
    s_t = h - jnp.einsum("bmn,bn->bm", G, x)
    shift = jnp.maximum(0.0, -1.5 * jnp.min(s_t, axis=-1, keepdims=True)) + 1.0
    s = s_t + shift
    z = jnp.ones((bsz, mi), dtype)

    def res_scales(x, y, z):
        """OSQP-style relative denominators per lane (see srbx.ops.qp)."""
        dual = jnp.maximum(
            jnp.maximum(jnp.abs(jnp.einsum("bnm,bm->bn", P, x)).max(-1),
                        jnp.abs(c).max(-1)),
            jnp.maximum(
                jnp.abs(jnp.einsum("bmn,bm->bn", A, y)).max(-1) if me else 0.0,
                jnp.abs(jnp.einsum("bmn,bm->bn", G, z)).max(-1)),
        )
        prim = jnp.maximum(
            jnp.maximum(jnp.abs(jnp.einsum("bmn,bn->bm", A, x)).max(-1) if me else 0.0,
                        jnp.abs(b).max(-1) if me else 0.0),
            jnp.maximum(jnp.abs(jnp.einsum("bmn,bn->bm", G, x)).max(-1),
                        jnp.abs(h).max(-1)),
        )
        return jnp.maximum(dual, 1.0), jnp.maximum(prim, 1.0)

    def residuals(x, y, s, z):
        rx = jnp.einsum("bnm,bm->bn", P, x) + c \
            + jnp.einsum("bmn,bm->bn", A, y) + jnp.einsum("bmn,bm->bn", G, z)
        ry = jnp.einsum("bmn,bn->bm", A, x) - b
        rz = jnp.einsum("bmn,bn->bm", G, x) + s - h
        return rx, ry, rz

    def cond(carry):
        _, _, _, _, it, done = carry
        return jnp.logical_and(it < cfg.max_iters, jnp.logical_not(done.all()))

    def body(carry):
        x, y, s, z, it, done = carry
        rx, ry, rz = residuals(x, y, s, z)
        mu = jnp.sum(s * z, axis=-1) / mi

        w = z / s
        l_m, l_s, minv_at = _factor(P, A, G, w, cfg.reg_primal, cfg.reg_dual,
                                    chol, cho_solve)

        r_c = -s * z
        r1 = -rx - jnp.einsum("bmn,bm->bn", G, r_c / s + w * rz)
        dx_a, dy_a = _solve_kkt_refined(l_m, l_s, minv_at, P, A, G, w,
                                        r1, -ry, cho_solve,
                                        cfg.kkt_refine_iters)
        ds_a = -rz - jnp.einsum("bmn,bn->bm", G, dx_a)
        dz_a = (r_c - z * ds_a) / s

        ap_a = _step_len(s, ds_a)
        ad_a = _step_len(z, dz_a)
        mu_aff = jnp.sum(
            (s + ap_a[:, None] * ds_a) * (z + ad_a[:, None] * dz_a), -1
        ) / mi
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, cfg.sigma_min)) ** 3, 0.0, 1.0)

        r_c2 = sigma[:, None] * mu[:, None] - s * z - ds_a * dz_a
        r1c = -rx - jnp.einsum("bmn,bm->bn", G, r_c2 / s + w * rz)
        dx, dy = _solve_kkt_refined(l_m, l_s, minv_at, P, A, G, w,
                                    r1c, -ry, cho_solve,
                                    cfg.kkt_refine_iters)
        ds = -rz - jnp.einsum("bmn,bn->bm", G, dx)
        dz = (r_c2 - z * ds) / s

        ap = (cfg.step_frac * _step_len(s, ds))[:, None]
        ad = (cfg.step_frac * _step_len(z, dz))[:, None]

        x_n = x + ap * dx
        s_n = s + ap * ds
        y_n = y + ad * dy
        z_n = z + ad * dz

        finite = (
            jnp.isfinite(x_n).all(-1)
            & jnp.isfinite(s_n).all(-1)
            & jnp.isfinite(z_n).all(-1)
        )
        keep = jnp.logical_and(finite, jnp.logical_not(done))[:, None]
        x_n = jnp.where(keep, x_n, x)
        y_n = jnp.where(keep, y_n, y)
        s_n = jnp.where(keep, s_n, s)
        z_n = jnp.where(keep, z_n, z)

        rx_n, ry_n, rz_n = residuals(x_n, y_n, s_n, z_n)
        dual_s, prim_s = res_scales(x_n, y_n, z_n)
        res = jnp.maximum(
            jnp.abs(rx_n).max(-1) / dual_s,
            jnp.maximum(jnp.abs(ry_n).max(-1) if me else 0.0,
                        jnp.abs(rz_n).max(-1)) / prim_s,
        )
        # relative duality gap (f32-robust, see srbx.ops.qp)
        obj = 0.5 * jnp.einsum("bn,bnm,bm->b", x_n, P, x_n) + jnp.sum(c * x_n, -1)
        conv = jnp.logical_and(
            res <= cfg.abstol + cfg.reltol,
            jnp.sum(s_n * z_n, -1) <= cfg.abstol * (1.0 + jnp.abs(obj)),
        )
        done_n = done | conv | jnp.logical_not(finite)
        return x_n, y_n, s_n, z_n, it + 1, done_n

    done0 = jnp.zeros((bsz,), bool)
    x, y, s, z, iters, done = jax.lax.while_loop(
        cond, body, (x, y, s, z, jnp.zeros((), jnp.int32), done0)
    )

    rx, ry, rz = residuals(x, y, s, z)
    dual_s, prim_s = res_scales(x, y, z)
    res = jnp.maximum(
        jnp.abs(rx).max(-1) / dual_s,
        jnp.maximum(jnp.abs(ry).max(-1) if me else 0.0,
                    jnp.abs(rz).max(-1)) / prim_s,
    )
    gap = jnp.sum(s * z, -1) / mi
    obj = 0.5 * jnp.einsum("bn,bnm,bm->b", x, P, x) + jnp.sum(c * x, -1)
    converged = jnp.logical_and(
        res <= cfg.abstol + cfg.reltol,
        jnp.sum(s * z, -1) <= cfg.abstol * (1.0 + jnp.abs(obj)),
    )
    return BatchSolution(x, y, z, s, iters, converged, res, gap)
