"""Batched dense primal-dual interior-point QP solver.

Solves   min ½ xᵀP x + cᵀx   s.t.  A x = b,  G x ≤ h
with a Mehrotra predictor-corrector method, replacing the reference's sparse
iSWIFT solver (`optimization/iSWIFT/src/Prime.c:35-287`, `Auxilary.c:5-758`)
and its vendored LDL factorization. Semantics match iSWIFT's settings
(MAXIT 25, RELTOL/ABSTOL 1e-6, `optimization/iSWIFT/include/GlobalOptions.h:23-26`).

TPU-first design decisions:
  * problems are tiny (n≈25-41) and batched by the thousands — all shapes are
    static; the parallel axis is the batch (`jax.vmap`), not the matrix;
  * instead of a sparse LDLᵀ with AMD ordering and dynamic regularization
    (what iSWIFT+LDL do), the condensed KKT system
        [P + Gᵀ diag(z/s) G + δI   Aᵀ ]
        [A                         -δI]
    is quasidefinite, so it is solved with two dense Cholesky factorizations
    (Schur complement), which XLA batches efficiently;
  * every lane runs in lockstep: convergence is tracked per lane with masked
    updates, and the loop exits when all lanes converge (or MAXIT).

Padding conventions (used by srbx.ocp to keep shapes static across contact
modes): inert inequality rows are (g=0, h=1) and inert equality rows are
(a=0, b=0) — both are exactly feasible and, with the quasidefinite
regularization, leave the KKT factorization well-posed.

A Pallas fused-kernel implementation of the same iteration lives in
srbx.ops.qp_pallas; this module is the reference path and the vmap fallback.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from srbx.config import QpConfig


class QpSolution(NamedTuple):
    x: jax.Array          # primal solution (n,)
    y: jax.Array          # equality multipliers (me,)
    z: jax.Array          # inequality multipliers (mi,)
    s: jax.Array          # inequality slacks (mi,)
    iters: jax.Array      # iterations taken (scalar int)
    converged: jax.Array  # scalar bool
    res: jax.Array        # final max KKT residual (scalar)
    gap: jax.Array        # final duality measure sᵀz/mi (scalar)

    @property
    def obj(self):
        """Not stored; compute via qp_objective."""
        raise AttributeError("use qp_objective(P, c, sol.x)")


def qp_objective(P, c, x):
    return 0.5 * x @ (P @ x) + c @ x


def _chol_solve(chol_l, rhs):
    """Solve (L Lᵀ) x = rhs with rhs (..., k) or (..., k, m)."""
    vec = rhs.ndim == chol_l.ndim - 1
    if vec:
        rhs = rhs[..., None]
    t = jax.scipy.linalg.solve_triangular(chol_l, rhs, lower=True)
    out = jax.scipy.linalg.solve_triangular(chol_l.T, t, lower=False)
    return out[..., 0] if vec else out


class _Kkt(NamedTuple):
    l_m: jax.Array        # cholesky of M = P + GᵀWG + δI
    l_s: jax.Array        # cholesky of S = A M⁻¹ Aᵀ + δI
    minv_at: jax.Array    # M⁻¹ Aᵀ  (n, me)


def _kkt_factor(P, A, G, w, delta_p, delta_d):
    """Factor the condensed, regularized KKT system for weights w = z/s."""
    n = P.shape[-1]
    me = A.shape[-2]
    m_mat = P + (G * w[..., None]).T @ G + delta_p * jnp.eye(n, dtype=P.dtype)
    l_m = jnp.linalg.cholesky(m_mat)
    minv_at = _chol_solve(l_m, A.T)
    s_mat = A @ minv_at + delta_d * jnp.eye(me, dtype=P.dtype)
    l_s = jnp.linalg.cholesky(s_mat)
    return _Kkt(l_m, l_s, minv_at)


def _kkt_solve(kkt: _Kkt, A, r1, r2):
    """Solve  M dx + Aᵀ dy = r1,  A dx - δ dy = r2  (δ folded into S)."""
    t = _chol_solve(kkt.l_m, r1)
    dy = _chol_solve(kkt.l_s, A @ t - r2)
    dx = t - kkt.minv_at @ dy
    return dx, dy


def _kkt_solve_refined(kkt: _Kkt, P, A, G, w, r1, r2, iters: int):
    """_kkt_solve + `iters` rounds of iterative refinement against the
    UNregularized KKT operator  [P+GᵀWG  Aᵀ; A  0].

    The static shifts δ_p, δ_d make the factorization unconditionally
    Cholesky-able, but they bias every Newton direction by O(δ·‖Δ‖·κ).
    After Ruiz equilibration the scaled P is O(1), so δ=1e-9 is no longer
    negligible the way it is against raw penalty scales (~1e9): the IPM
    then stalls at a δ-limited stationarity floor that the scaled residual
    check cannot distinguish from convergence (found by the iSWIFT
    cross-validation study, docs/ROUND4.md — unscaled primal error up to
    ~4 Nm on low-level QP instances).  Refinement removes the bias at the
    cost of `iters` extra triangular solves — no new factorizations, so
    the batched/TPU cost is small.
    """
    dx, dy = _kkt_solve(kkt, A, r1, r2)
    for _ in range(iters):
        t1 = r1 - (P @ dx + G.T @ (w * (G @ dx)) + A.T @ dy)
        t2 = r2 - A @ dx
        ddx, ddy = _kkt_solve(kkt, A, t1, t2)
        dx = dx + ddx
        dy = dy + ddy
    return dx, dy


def _step_to_boundary(v, dv):
    """max alpha in (0, 1] with v + alpha dv >= 0 (v > 0)."""
    ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
    return jnp.minimum(1.0, jnp.min(ratio, axis=-1))


def ruiz_equilibrate(P, c, A, G, h, b, iters: int, clip: float = 0.0):
    """Ruiz equilibration of the QP data (OSQP-style, modified for the
    two-block constraint layout). Returns scaled data plus the scalings
    (d, e, f, kappa) with x = d * x_hat, y = kappa * e * y_hat,
    z = kappa * f * z_hat, s = s_hat / f.

    Iteratively drives the inf-norms of the columns of the stacked
    [P; A; G] matrix (and symmetrically the rows of A, G) toward 1 —
    the batched, fixed-iteration analogue of the dynamic scaling the
    reference's LDL applies during factorization
    (`optimization/iSWIFT/READ ME.txt:17`).

    clip > 0 bounds every cumulative scaling factor to [1/clip, clip]
    ("bounded Ruiz"). Full equilibration compresses the LL QP's ~1e10
    penalty dynamic range to O(1), which makes the optimum weakly
    determined in scaled coordinates: the IPM terminates at a point whose
    scaled KKT residual is tiny but whose UNSCALED primal error is ~Nm
    (the iSWIFT cross-validation finding, docs/ROUND4.md). Clipping keeps
    just enough of the native scale separation that the optimum stays
    sharply determined while the factorization still fits f32.
    """
    dtype = P.dtype
    n = P.shape[-1]
    d = jnp.ones((n,), dtype)
    e = jnp.ones((A.shape[-2],), dtype)
    f = jnp.ones((G.shape[-2],), dtype)
    kappa = jnp.ones((), dtype)
    eps = jnp.asarray(1e-8, dtype)

    for _ in range(iters):
        col = jnp.maximum(
            jnp.abs(P).max(axis=-2),
            jnp.maximum(jnp.abs(A).max(axis=-2), jnp.abs(G).max(axis=-2)),
        )
        dd = 1.0 / jnp.sqrt(jnp.maximum(col, eps))
        row_a = jnp.abs(A).max(axis=-1)
        ee = 1.0 / jnp.sqrt(jnp.maximum(row_a, eps))
        # inert padded rows (all-zero) keep scale 1
        ee = jnp.where(row_a > 0, ee, 1.0)
        row_g = jnp.abs(G).max(axis=-1)
        ff = 1.0 / jnp.sqrt(jnp.maximum(row_g, eps))
        ff = jnp.where(row_g > 0, ff, 1.0)

        if clip > 0:
            lo = jnp.asarray(1.0 / clip, dtype)
            hi = jnp.asarray(clip, dtype)
            dd = jnp.clip(d * dd, lo, hi) / d
            ee = jnp.clip(e * ee, lo, hi) / e
            ff = jnp.clip(f * ff, lo, hi) / f

        P = dd[:, None] * P * dd[None, :]
        A = ee[:, None] * A * dd[None, :]
        G = ff[:, None] * G * dd[None, :]
        c = dd * c
        b = ee * b
        h = ff * h
        d, e, f = d * dd, e * ee, f * ff

        # cost scaling: mean column norm of P vs |c|
        cost_norm = jnp.maximum(
            jnp.abs(P).max(axis=-2).mean(), jnp.abs(c).max()
        )
        kk = 1.0 / jnp.maximum(cost_norm, eps)
        P = kk * P
        c = kk * c
        kappa = kappa * kk

    return (P, c, A, b, G, h), (d, e, f, kappa)


def solve(P, c, A, b, G, h, cfg: QpConfig = QpConfig(), x0: Optional[jax.Array] = None):
    """Solve one QP. Batch with jax.vmap; all operands are single-problem.

    x0 optionally warm-starts the primal variable (the SQP loop uses this —
    the analogue of handing the iSWIFT solution to SNOPT as the NLP initial
    point, `src/MPC_dist.cpp:356-404`).
    """
    # True-f32 matmuls: TPU default precision (bf16 passes) stalls IPM
    # convergence; see srbx.ops.qp_batch.solve.
    with jax.default_matmul_precision("highest"):
        if cfg.ruiz_iters:
            data, (d, e, f, kappa) = ruiz_equilibrate(
                P, c, A, G, h, b, cfg.ruiz_iters, clip=cfg.ruiz_clip
            )
            x0_s = x0 / d if x0 is not None else None
            sol = _solve_impl(*data, cfg, x0_s)
            return QpSolution(
                x=sol.x * d,
                y=sol.y * e / kappa,
                z=sol.z * f / kappa,
                s=sol.s / f,
                iters=sol.iters,
                converged=sol.converged,
                res=sol.res,
                gap=sol.gap,
            )
        return _solve_impl(P, c, A, b, G, h, cfg, x0)


def _solve_impl(P, c, A, b, G, h, cfg: QpConfig, x0: Optional[jax.Array]):
    dtype = P.dtype
    n = P.shape[-1]
    me = A.shape[-2]
    mi = G.shape[-2]
    eye_n = jnp.eye(n, dtype=dtype)

    # ---------------- Initialization (OOQP/Mehrotra style) ---------------- #
    kkt0 = _kkt_factor(P, A, G, jnp.ones((mi,), dtype), 1.0, cfg.reg_dual)
    if x0 is None:
        x, y = _kkt_solve(kkt0, A, -c + G.T @ h, b)
    else:
        x = x0
        _, y = _kkt_solve(kkt0, A, -c + G.T @ h, b)
    s_tilde = h - G @ x
    shift = jnp.maximum(0.0, -1.5 * jnp.min(s_tilde)) + 1.0
    s = s_tilde + shift
    z = jnp.ones((mi,), dtype)

    def residuals(x, y, s, z):
        rx = P @ x + c + A.T @ y + G.T @ z
        ry = A @ x - b
        rz = G @ x + s - h
        return rx, ry, rz

    def res_scales(x, y, z):
        """OSQP-style relative-residual denominators: the dual residual is
        measured against the gradient-term magnitudes (essential when cost
        scales span ~1e8, e.g. the CLF defect penalty), the primal residual
        against the constraint-term magnitudes."""
        dual_scale = jnp.maximum(
            jnp.maximum(jnp.abs(P @ x).max(), jnp.abs(c).max()),
            jnp.maximum(
                jnp.abs(A.T @ y).max() if me else 0.0, jnp.abs(G.T @ z).max()
            ),
        )
        prim_scale = jnp.maximum(
            jnp.maximum(jnp.abs(A @ x).max() if me else 0.0, jnp.abs(b).max() if me else 0.0),
            jnp.maximum(jnp.abs(G @ x).max(), jnp.abs(h).max()),
        )
        return jnp.maximum(dual_scale, 1.0), jnp.maximum(prim_scale, 1.0)

    def cond(carry):
        _, _, _, _, it, done = carry
        return jnp.logical_and(it < cfg.max_iters, jnp.logical_not(done))

    def body(carry):
        x, y, s, z, it, _ = carry
        rx, ry, rz = residuals(x, y, s, z)
        mu = (s @ z) / mi

        w = z / s
        kkt = _kkt_factor(P, A, G, w, cfg.reg_primal, cfg.reg_dual)

        # Affine (predictor) direction: target s∘z -> 0.
        r_c = -s * z
        r1 = -rx - G.T @ (r_c / s + w * rz)
        dx_a, dy_a = _kkt_solve_refined(kkt, P, A, G, w, r1, -ry,
                                        cfg.kkt_refine_iters)
        ds_a = -rz - G @ dx_a
        dz_a = (r_c - z * ds_a) / s

        alpha_p_a = _step_to_boundary(s, ds_a)
        alpha_d_a = _step_to_boundary(z, dz_a)
        mu_aff = ((s + alpha_p_a * ds_a) @ (z + alpha_d_a * dz_a)) / mi
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, cfg.sigma_min)) ** 3, 0.0, 1.0)

        # Corrector direction (same factorization).
        r_c2 = sigma * mu - s * z - ds_a * dz_a
        r1c = -rx - G.T @ (r_c2 / s + w * rz)
        dx, dy = _kkt_solve_refined(kkt, P, A, G, w, r1c, -ry,
                                    cfg.kkt_refine_iters)
        ds = -rz - G @ dx
        dz = (r_c2 - z * ds) / s

        alpha_p = cfg.step_frac * _step_to_boundary(s, ds)
        alpha_d = cfg.step_frac * _step_to_boundary(z, dz)

        x_n = x + alpha_p * dx
        s_n = s + alpha_p * ds
        y_n = y + alpha_d * dy
        z_n = z + alpha_d * dz

        # NaN guard: an (infeasible / numerically broken) lane freezes at its
        # last finite iterate instead of poisoning the batch.
        finite = jnp.logical_and(
            jnp.isfinite(x_n).all(),
            jnp.logical_and(jnp.isfinite(s_n).all(), jnp.isfinite(z_n).all()),
        )
        x_n = jnp.where(finite, x_n, x)
        y_n = jnp.where(finite, y_n, y)
        s_n = jnp.where(finite, s_n, s)
        z_n = jnp.where(finite, z_n, z)

        rx_n, ry_n, rz_n = residuals(x_n, y_n, s_n, z_n)
        dual_scale, prim_scale = res_scales(x_n, y_n, z_n)
        res_dual = jnp.abs(rx_n).max() / dual_scale
        res_prim = jnp.maximum(
            jnp.abs(ry_n).max() if me else 0.0, jnp.abs(rz_n).max()
        ) / prim_scale
        # relative duality gap: s·z <= abstol * (1 + |obj|) — the f32-robust
        # criterion (an absolute gap bound is unreachable when the objective
        # scale is ~1e3 and eps_f32 ~ 1e-7).
        obj = 0.5 * x_n @ (P @ x_n) + c @ x_n
        converged = jnp.logical_and(
            jnp.maximum(res_dual, res_prim) <= cfg.abstol + cfg.reltol,
            s_n @ z_n <= cfg.abstol * (1.0 + jnp.abs(obj)),
        )
        done = jnp.logical_or(converged, jnp.logical_not(finite))
        return x_n, y_n, s_n, z_n, it + 1, done

    init = (x, y, s, z, jnp.zeros((), jnp.int32), jnp.asarray(False))
    x, y, s, z, iters, _ = jax.lax.while_loop(cond, body, init)

    rx, ry, rz = residuals(x, y, s, z)
    dual_scale, prim_scale = res_scales(x, y, z)
    res = jnp.maximum(
        jnp.abs(rx).max() / dual_scale,
        jnp.maximum(jnp.abs(ry).max() if me else 0.0, jnp.abs(rz).max())
        / prim_scale,
    )
    gap = (s @ z) / mi
    obj = 0.5 * x @ (P @ x) + c @ x
    converged = jnp.logical_and(
        res <= cfg.abstol + cfg.reltol,
        s @ z <= cfg.abstol * (1.0 + jnp.abs(obj)),
    )
    return QpSolution(x, y, z, s, iters, converged, res, gap)


@functools.partial(jax.jit, static_argnames=("cfg",))
def solve_batch(P, c, A, b, G, h, cfg: QpConfig = QpConfig()):
    """vmap over a leading batch axis on every operand."""
    return jax.vmap(lambda *o: solve(*o, cfg))(P, c, A, b, G, h)
