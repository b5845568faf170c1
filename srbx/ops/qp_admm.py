"""Batched OSQP-style ADMM QP solver — the factor-once solver family.

Second solver family next to the Mehrotra IPM (srbx.ops.qp / qp_batch /
qp_fused, the iSWIFT replacement — `optimization/iSWIFT/src/Prime.c:35`).
The IPM refactorizes its KKT system every iteration: high per-iteration
cost, ~7 iterations to 1e-6. ADMM factorizes the quasidefinite system

    K = P + σI + Mᵀ diag(ρ) M,      M = [A; G]

ONCE and then iterates with a cached triangular solve plus two matvecs:
tiny per-iteration cost, linear convergence, many more iterations. It wins
when warm-started re-solves dominate (the SCP stage re-solves the same
shape with slightly moved CBF rows) or when only moderate accuracy is
needed; it loses on cold high-accuracy solves. Both families share the
package problem convention

    min ½xᵀPx + cᵀx   s.t.   Ax = b,   Gx ≤ h

mapped here to the OSQP two-sided form l ≤ Mx ≤ u with l = [b; −∞],
u = [b; h]. Equality rows get a stiffer per-row ρ (OSQP's eq-scaling
heuristic) and padded all-zero rows are inert by construction (their z/y
stay 0).

Returns the same BatchSolution as qp_batch (y = equality duals, z ≥ 0 =
inequality duals, s = h − Gx slack) so the backends are drop-in
interchangeable; agreement with the IPM is test-enforced in
tests/test_qp_admm.py.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from srbx.config import AdmmConfig
from srbx.ops.qp_batch import BatchSolution, make_backend


def _factor(P, M, rho, sigma, chol):
    n = P.shape[-1]
    k_mat = (
        P
        + sigma * jnp.eye(n, dtype=P.dtype)
        + jnp.einsum("bmn,bmk->bnk", M * rho[..., None], M)
    )
    return chol(k_mat)


def solve(P, c, A, b, G, h, cfg: AdmmConfig = AdmmConfig(),
          backend: str = "xla", tile: int = 256, interpret: bool = False,
          x0=None, y0=None, z0=None) -> BatchSolution:
    """All operands batch-leading: (B, ...).

    x0/y0/z0 optionally warm-start the primal / equality-dual /
    inequality-dual iterates (ADMM benefits from full primal-dual warm
    starts far more than the IPM does).
    """
    if A.shape[-2] == 0:
        # one inert all-zero equality row (l = u = 0): its z and y iterates
        # stay exactly 0 and it contributes nothing to K, so the solve is
        # unchanged; avoids zero-size reductions in scaling/residuals.
        bsz, n = c.shape
        sol = solve(
            jnp.asarray(P), c, jnp.zeros((bsz, 1, n), c.dtype),
            jnp.zeros((bsz, 1), c.dtype), G, h, cfg,
            backend=backend, tile=tile, interpret=interpret,
            x0=x0, y0=None, z0=z0,
        )
        return sol._replace(y=sol.y[:, :0])
    if cfg.ruiz_iters:
        from srbx.ops import qp as qp_ref

        data, (d, e, f, kappa) = jax.vmap(
            lambda p_, c_, a_, g_, h_, b_: qp_ref.ruiz_equilibrate(
                p_, c_, a_, g_, h_, b_, cfg.ruiz_iters
            )
        )(P, c, A, G, h, b)
        sol = solve(
            *data,
            dataclasses.replace(cfg, ruiz_iters=0),
            backend=backend, tile=tile, interpret=interpret,
            x0=None if x0 is None else x0 / d,
            y0=None if y0 is None else y0 * kappa[:, None] / e,
            z0=None if z0 is None else z0 * kappa[:, None] / f,
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
    with jax.default_matmul_precision("highest"):
        return _solve_impl(P, c, A, b, G, h, cfg, backend, tile, interpret,
                           x0, y0, z0)


def _solve_impl(P, c, A, b, G, h, cfg, backend, tile, interpret, x0, y0, z0):
    dtype = P.dtype
    bsz, n = c.shape
    me = A.shape[-2]
    mi = G.shape[-2]
    m = me + mi
    big = jnp.asarray(jnp.finfo(dtype).max / 4, dtype)
    chol, cho_solve = make_backend(backend, tile=tile, interpret=interpret)

    M = jnp.concatenate([A, G], axis=-2)                     # (B, m, n)
    lo = jnp.concatenate([b, jnp.full((bsz, mi), -big, dtype)], axis=-1)
    up = jnp.concatenate([b, h], axis=-1)

    # per-row rho: stiff on equality rows; inert (all-zero) rows harmless
    rho0 = jnp.full((bsz, m), cfg.rho, dtype)
    rho0 = rho0.at[:, :me].mul(cfg.rho_eq_scale)
    sigma = jnp.asarray(cfg.sigma, dtype)
    alpha = jnp.asarray(cfg.alpha, dtype)

    x = x0 if x0 is not None else jnp.zeros((bsz, n), dtype)
    yz = jnp.zeros((bsz, m), dtype)
    if y0 is not None:
        yz = yz.at[:, :me].set(y0)
    if z0 is not None:
        yz = yz.at[:, me:].set(z0)
    zc = jnp.clip(jnp.einsum("bmn,bn->bm", M, x), lo, up)

    def residuals(x, zc, yz):
        mx = jnp.einsum("bmn,bn->bm", M, x)
        px = jnp.einsum("bnk,bk->bn", P, x)
        mty = jnp.einsum("bmn,bm->bn", M, yz)
        r_p = jnp.abs(mx - zc).max(-1)
        r_d = jnp.abs(px + c + mty).max(-1)
        s_p = jnp.maximum(jnp.abs(mx).max(-1), jnp.abs(zc).max(-1))
        s_d = jnp.maximum(
            jnp.maximum(jnp.abs(px).max(-1), jnp.abs(mty).max(-1)),
            jnp.abs(c).max(-1),
        )
        one = jnp.ones((), dtype)
        return r_p, r_d, jnp.maximum(s_p, one), jnp.maximum(s_d, one)

    def iterate(carry, _):
        x, zc, yz, l_k, rho = carry
        rhs = sigma * x - c + jnp.einsum(
            "bmn,bm->bn", M, rho * zc - yz
        )
        xt = cho_solve(l_k, rhs)
        zt = jnp.einsum("bmn,bn->bm", M, xt)
        x_n = alpha * xt + (1 - alpha) * x
        z_rel = alpha * zt + (1 - alpha) * zc
        zc_n = jnp.clip(z_rel + yz / rho, lo, up)
        yz_n = yz + rho * (z_rel - zc_n)
        return (x_n, zc_n, yz_n, l_k, rho), None

    l_k0 = _factor(P, M, rho0, sigma, chol)

    def segment(state):
        x, zc, yz, l_k, rho, it, conv, res = state
        (x_n, zc_n, yz_n, _, _), _ = jax.lax.scan(
            iterate, (x, zc, yz, l_k, rho), None, length=cfg.check_every
        )
        # freeze converged (and non-finite) lanes
        ok = jnp.isfinite(x_n).all(-1) & jnp.isfinite(yz_n).all(-1)
        keep = conv | ~ok
        x_n = jnp.where(keep[:, None], x, x_n)
        zc_n = jnp.where(keep[:, None], zc, zc_n)
        yz_n = jnp.where(keep[:, None], yz, yz_n)

        r_p, r_d, s_p, s_d = residuals(x_n, zc_n, yz_n)
        res_n = jnp.maximum(r_p / s_p, r_d / s_d)
        conv_n = conv | (
            (r_p <= cfg.abstol + cfg.reltol * s_p)
            & (r_d <= cfg.abstol + cfg.reltol * s_d)
        )

        # OSQP rho adaptation: rho *= sqrt(rel_prim / rel_dual), then
        # refactor. Converged lanes keep their rho (factor is shared work
        # in the batch anyway).
        def adapt(args):
            rho, l_k = args
            ratio = jnp.sqrt(
                (r_p / s_p) / jnp.maximum(r_d / s_d, 1e-12)
            )
            scale = jnp.clip(ratio, 0.2, 5.0)
            scale = jnp.where(conv_n, 1.0, scale)
            rho_n = jnp.clip(rho * scale[:, None], 1e-6, 1e6)
            return rho_n, _factor(P, M, rho_n, sigma, chol)

        do_adapt = cfg.adapt_rho & jnp.logical_not(conv_n.all())
        rho, l_k = jax.lax.cond(
            do_adapt, adapt, lambda args: args, (rho, l_k)
        )
        return (x_n, zc_n, yz_n, l_k, rho, it + cfg.check_every, conv_n,
                res_n)

    def cond(state):
        *_, it, conv, _ = state
        return (it < cfg.max_iters) & jnp.logical_not(conv.all())

    r_p, r_d, s_p, s_d = residuals(x, zc, yz)
    state = (
        x, zc, yz, l_k0, rho0, jnp.zeros((), jnp.int32),
        jnp.zeros((bsz,), bool), jnp.maximum(r_p / s_p, r_d / s_d),
    )
    x, zc, yz, _, _, it, conv, res = jax.lax.while_loop(cond, segment, state)

    y = yz[:, :me]
    z = jnp.maximum(yz[:, me:], 0.0)
    s = jnp.maximum(h - jnp.einsum("bmn,bn->bm", G, x), 0.0)
    gap = jnp.abs(jnp.sum(s * z, axis=-1))
    return BatchSolution(x=x, y=y, z=z, s=s, iters=it, converged=conv,
                         res=res, gap=gap)
