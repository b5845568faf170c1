"""Fully-fused Pallas TPU interior-point QP kernel.

One `pallas_call` runs the ENTIRE Mehrotra predictor-corrector solve — KKT
assembly, Cholesky factorizations, triangular substitutions, step lengths,
convergence tests, all `max_iters` iterations — without touching HBM between
steps. This is the speed-of-light form of the iSWIFT replacement
(`optimization/iSWIFT/src/Prime.c:127`, `Auxilary.c:334-460`): the problems
are tiny (n≈25-41) so the only parallelism that matters is the batch, which
this kernel keeps in the 128-wide TPU lane axis while every matrix loop runs
as (sublane × lane) VPU vector ops over VMEM-resident state.

Comparison with srbx.ops.qp_batch (the step-fused path): that path launches
one XLA op per IPM sub-step and round-trips each factorization/solve result
through HBM; per iteration that is ~10 MB of HBM traffic per 128 lanes plus
kernel-launch latency × ~50 ops. Here the working set (~6 MB/tile at the
NMPC shapes) stays in VMEM for the whole solve.

Semantics match srbx.ops.qp / srbx.ops.qp_batch exactly (same init, same
Mehrotra directions, same OSQP-style relative residuals, same NaN-freeze and
per-lane convergence latching); equality is test-enforced in
tests/test_qp_fused.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from srbx.config import QpConfig
from srbx.ops.qp_batch import BatchSolution

DEFAULT_TILE = 128


def _mv(m, v):
    """Lanes-last matvec: (p, q, T) × (q, T) -> (p, T)."""
    return jnp.sum(m * v[None, :, :], axis=1)


def _mtv(m, v):
    """Lanes-last transposed matvec: (p, q, T) × (p, T) -> (q, T)."""
    return jnp.sum(m * v[:, None, :], axis=0)


def _chol_ip(a_ref, k):
    """In-place lower Cholesky of a (k, k, T) VMEM ref (upper left stale).

    The DIAGONAL is stored as its reciprocal (1/L_jj): every consumer is a
    triangular solve, which then multiplies instead of dividing — VPU
    division is multi-cycle, multiplication single-cycle. Off-diagonal
    entries are the ordinary L."""
    for j in range(k):
        di = 1.0 / jnp.sqrt(a_ref[j, j, :])   # one divide per step (IEEE
        # exact), instead of one per consumer row in the solves
        a_ref[j, j, :] = di
        if j + 1 < k:
            t = a_ref[j + 1 :, j, :] * di[None, :]
            a_ref[j + 1 :, j, :] = t
            a_ref[j + 1 :, j + 1 :, :] = (
                a_ref[j + 1 :, j + 1 :, :] - t[:, None, :] * t[None, :, :]
            )


def _cho_solve_ip(l_ref, b_ref, k):
    """In-place solve (L Lᵀ) X = B on b_ref (k, r, T); l_ref (k, k, T) from
    _chol_ip (reciprocal diagonal)."""
    for j in range(k):
        yj = b_ref[j, :, :] * l_ref[j, j, :][None, :]
        b_ref[j, :, :] = yj
        if j + 1 < k:
            b_ref[j + 1 :, :, :] = (
                b_ref[j + 1 :, :, :]
                - l_ref[j + 1 :, j, :][:, None, :] * yj[None, :, :]
            )
    for j in range(k - 1, -1, -1):
        xj = b_ref[j, :, :] * l_ref[j, j, :][None, :]
        b_ref[j, :, :] = xj
        if j > 0:
            b_ref[:j, :, :] = (
                b_ref[:j, :, :] - l_ref[j, :j, :][:, None, :] * xj[None, :, :]
            )


def _step_len(v, dv, big):
    """Per-lane max step in (0,1] with v + α dv ≥ 0; v, dv (m, T) -> (T,)."""
    ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), big)
    return jnp.minimum(1.0, jnp.min(ratio, axis=0))


def _make_kernel(n, me, mi, cfg: QpConfig, has_x0: bool, dtype,
                 noeq: bool = False):
    """noeq=True: the caller's problem has NO equality rows (me here is a
    1-row placeholder for buffer shapes). The kernel then skips the whole
    Schur-complement stage — M⁻¹Aᵀ, S assembly/factorization, dy — in
    factor(), kkt_solve(), the residuals and the convergence test. This is
    the production path for the simplex-eliminated condensed NMPC QP
    (cfg.elide_simplex: n=13, me=0, mi=28)."""
    big = float(jnp.finfo(dtype).max) / 4.0  # python scalar: not captured

    def kernel(p_ref, c_ref, a_ref, at_ref, b_ref, g_ref, h_ref, x0_ref,
               x_out, y_out, z_out, s_out, stat_out,
               m_scr, at_scr, s_scr, vn_scr, vm_scr, msk_scr,
               rx_scr, ry_scr, rz_scr):
        T = p_ref.shape[-1]
        row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        eye_n = (row == col).astype(dtype)[:, :, None]

        def factor(w, delta_p, delta_d):
            # M = P + Gᵀ diag(w) G + δI. Rank-1 updates are batched in
            # chunks: one (chunk, n, n, T) FMA per group instead of mi tiny
            # ops — the kernel is instruction-overhead bound, not flop
            # bound, so fewer/larger vector ops win (measured on TPU).
            acc = p_ref[:] + delta_p * eye_n
            g = g_ref[:]
            chunk = 8
            for i0 in range(0, mi - (mi % chunk), chunk):
                gc = g[i0 : i0 + chunk]                     # (chunk, n, T)
                wc = w[i0 : i0 + chunk]                     # (chunk, T)
                acc = acc + jnp.sum(
                    (wc[:, None, None, :] * gc[:, :, None, :])
                    * gc[:, None, :, :],
                    axis=0,
                )
            for i in range(mi - (mi % chunk), mi):
                gi = g[i]                                   # (n, T)
                acc = acc + (w[i][None, None, :] * gi[:, None, :]) * gi[None, :, :]
            m_scr[:] = acc
            _chol_ip(m_scr, n)
            if noeq:
                return
            # minv_at = M⁻¹ Aᵀ
            at_scr[:] = at_ref[:]
            _cho_solve_ip(m_scr, at_scr, n)
            # S = A M⁻¹ Aᵀ + δI
            a = a_ref[:]
            ma = at_scr[:]
            for r in range(me):
                s_scr[r, :, :] = jnp.sum(a[r][:, None, :] * ma, axis=0)
            for r in range(me):
                s_scr[r, r, :] = s_scr[r, r, :] + delta_d
            _chol_ip(s_scr, me)

        def kkt_solve(r1, r2):
            """M dx + Aᵀ dy = r1, A dx - δ dy = r2 (δ folded into S)."""
            vn_scr[:, 0, :] = r1
            _cho_solve_ip(m_scr, vn_scr, n)
            t = vn_scr[:, 0, :]
            if noeq:
                return t, jnp.zeros((me, t.shape[-1]), dtype)
            vm_scr[:, 0, :] = _mv(a_ref[:], t) - r2
            _cho_solve_ip(s_scr, vm_scr, me)
            dy = vm_scr[:, 0, :]
            dx = t - _mv(at_scr[:], dy)
            return dx, dy

        def kkt_solve_refined(r1, r2, w):
            """kkt_solve + cfg.kkt_refine_iters rounds of iterative
            refinement against the UNregularized operator [P+GᵀWG Aᵀ; A 0]
            — same rationale as qp._kkt_solve_refined (the static shifts
            bias every direction by O(δ); the iSWIFT cross-validation
            measured the stall, docs/ROUND4.md). Triangular solves only,
            no extra factorizations."""
            dx, dy = kkt_solve(r1, r2)
            for _ in range(cfg.kkt_refine_iters):
                mx = _mv(p_ref[:], dx) + _mtv(g_ref[:], w * _mv(g_ref[:], dx))
                if noeq:
                    t2 = None
                else:
                    mx = mx + _mtv(a_ref[:], dy)
                    t2 = r2 - _mv(a_ref[:], dx)
                ddx, ddy = kkt_solve(r1 - mx, t2)
                dx = dx + ddx
                dy = dy + ddy
            return dx, dy

        def conv_test(x, y, s, z, store):
            """Shared-matvec residual + convergence block: Px, Gx, Gᵀz (and
            Ax, Aᵀy) are computed ONCE and reused by the residuals, the
            OSQP-style scale denominators, and the objective — the naive
            form recomputes Px three times and Gx/Gᵀz twice per call. With
            store=True the residual vectors are cached in VMEM scratch so
            the next iteration's direction build skips recomputing them
            (bitwise-identical values either way)."""
            px = _mv(p_ref[:], x)
            gx = _mv(g_ref[:], x)
            gtz = _mtv(g_ref[:], z)
            rx = px + c_ref[:] + gtz
            rz = gx + s - h_ref[:]
            dual = jnp.maximum(
                jnp.maximum(jnp.abs(px).max(0), jnp.abs(c_ref[:]).max(0)),
                jnp.abs(gtz).max(0),
            )
            prim = jnp.maximum(jnp.abs(gx).max(0), jnp.abs(h_ref[:]).max(0))
            prim_res = jnp.abs(rz).max(0)
            if not noeq:
                aty = _mtv(a_ref[:], y)
                ax = _mv(a_ref[:], x)
                rx = rx + aty
                ry = ax - b_ref[:]
                dual = jnp.maximum(dual, jnp.abs(aty).max(0))
                prim = jnp.maximum(
                    prim,
                    jnp.maximum(jnp.abs(ax).max(0), jnp.abs(b_ref[:]).max(0)),
                )
                prim_res = jnp.maximum(jnp.abs(ry).max(0), prim_res)
            one = jnp.ones((), dtype)
            dual_s = jnp.maximum(dual, one)
            prim_s = jnp.maximum(prim, one)
            res = jnp.maximum(
                jnp.abs(rx).max(0) / dual_s, prim_res / prim_s,
            )
            obj = 0.5 * jnp.sum(x * px, 0) + jnp.sum(c_ref[:] * x, 0)
            gap_abs = jnp.sum(s * z, 0)
            conv = jnp.logical_and(
                res <= cfg.abstol + cfg.reltol,
                gap_abs <= cfg.abstol * (1.0 + jnp.abs(obj)),
            )
            if store:
                rx_scr[:] = rx
                rz_scr[:] = rz
                if not noeq:
                    ry_scr[:] = ry
            return res, gap_abs, conv

        # ------------------------- initialization ------------------------- #
        if has_x0 and noeq:
            # warm start with no equality rows: the least-squares init
            # solve's x would be overwritten by x0 and its y is the (0,)
            # equality dual — the whole init factorization is dead work
            # (the first iteration re-factors with the real w anyway)
            x_init = x0_ref[:]
            y_init = jnp.zeros((me, T), dtype)
        else:
            ones_w = jnp.ones((mi, T), dtype)
            factor(ones_w, jnp.asarray(1.0, dtype),
                   jnp.asarray(cfg.reg_dual, dtype))
            r1 = -c_ref[:] + _mtv(g_ref[:], h_ref[:])
            x_init, y_init = kkt_solve(r1, b_ref[:])
            if has_x0:
                x_init = x0_ref[:]
        x_out[:] = x_init
        y_out[:] = y_init
        s_t = h_ref[:] - _mv(g_ref[:], x_init)
        shift = jnp.maximum(jnp.zeros((), dtype), -1.5 * jnp.min(s_t, axis=0)) + 1.0
        s_out[:] = s_t + shift[None, :]
        z_out[:] = jnp.ones((mi, T), dtype)
        msk_scr[0, :] = jnp.zeros((T,), dtype)          # done mask (0/1)
        # seed the residual caches at the init point (the loop body reads
        # them instead of recomputing top-of-iteration residuals)
        conv_test(x_out[:], y_out[:], s_out[:], z_out[:], store=True)

        # -------------------------- IPM iterations ------------------------ #
        def it_body(_, cnt):
            done = msk_scr[0, :] > 0.5
            all_done = jnp.sum(msk_scr[0, :]) > (T - 0.5)

            @pl.when(jnp.logical_not(all_done))
            def _():
                x = x_out[:]
                y = y_out[:]
                s = s_out[:]
                z = z_out[:]
                rx = rx_scr[:]
                rz = rz_scr[:]
                ry = None if noeq else ry_scr[:]
                mu = jnp.sum(s * z, 0) / mi

                s_inv = 1.0 / s        # one (mi, T) divide; the five
                # per-iteration /s consumers below multiply instead
                w = z * s_inv
                factor(w, jnp.asarray(cfg.reg_primal, dtype),
                       jnp.asarray(cfg.reg_dual, dtype))

                r_c = -s * z
                r1 = -rx - _mtv(g_ref[:], r_c * s_inv + w * rz)
                dx_a, dy_a = kkt_solve_refined(r1, None if noeq else -ry, w)
                ds_a = -rz - _mv(g_ref[:], dx_a)
                dz_a = (r_c - z * ds_a) * s_inv

                ap_a = _step_len(s, ds_a, big)
                ad_a = _step_len(z, dz_a, big)
                mu_aff = jnp.sum(
                    (s + ap_a[None, :] * ds_a) * (z + ad_a[None, :] * dz_a), 0
                ) / mi
                sigma = jnp.clip(
                    (mu_aff / jnp.maximum(mu, cfg.sigma_min)) ** 3, 0.0, 1.0
                )

                r_c2 = sigma[None, :] * mu[None, :] - s * z - ds_a * dz_a
                r1c = -rx - _mtv(g_ref[:], r_c2 * s_inv + w * rz)
                dx, dy = kkt_solve_refined(r1c, None if noeq else -ry, w)
                ds = -rz - _mv(g_ref[:], dx)
                dz = (r_c2 - z * ds) * s_inv

                ap = (cfg.step_frac * _step_len(s, ds, big))[None, :]
                ad = (cfg.step_frac * _step_len(z, dz, big))[None, :]

                x_n = x + ap * dx
                s_n = s + ap * ds
                y_n = y + ad * dy
                z_n = z + ad * dz

                finite = (
                    jnp.isfinite(x_n).all(0)
                    & jnp.isfinite(s_n).all(0)
                    & jnp.isfinite(z_n).all(0)
                )
                keep = (finite & jnp.logical_not(done))[None, :]
                x_n = jnp.where(keep, x_n, x)
                y_n = jnp.where(keep, y_n, y)
                s_n = jnp.where(keep, s_n, s)
                z_n = jnp.where(keep, z_n, z)
                x_out[:] = x_n
                y_out[:] = y_n
                s_out[:] = s_n
                z_out[:] = z_n

                _, _, conv = conv_test(x_n, y_n, s_n, z_n, store=True)
                done_n = done | conv | jnp.logical_not(finite)
                msk_scr[0, :] = done_n.astype(dtype)

            return cnt + jnp.where(all_done, 0, 1)

        iters = jax.lax.fori_loop(0, cfg.max_iters, it_body, jnp.zeros((), jnp.int32))

        # ----------------------------- epilogue --------------------------- #
        x = x_out[:]
        y = y_out[:]
        s = s_out[:]
        z = z_out[:]
        res, gap_abs, conv = conv_test(x, y, s, z, store=False)
        stat_out[0, :] = res
        stat_out[1, :] = gap_abs / mi
        stat_out[2, :] = conv.astype(dtype)
        stat_out[3, :] = jnp.full((T,), 1.0, dtype) * iters.astype(dtype)
        for r in range(4, stat_out.shape[0]):
            stat_out[r, :] = jnp.zeros((T,), dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("cfg", "tile", "interpret", "has_x0", "noeq")
)
def _solve_ll(P, c, A, At, b, G, h, x0, cfg: QpConfig, tile: int,
              interpret: bool, has_x0: bool, noeq: bool = False):
    """Lanes-last fused solve. All operands lanes-last, batch % tile == 0."""
    n = P.shape[0]
    me = A.shape[0]
    mi = G.shape[0]
    bsz = P.shape[-1]
    dtype = P.dtype
    grid = (bsz // tile,)

    def spec3(d0, d1):
        return pl.BlockSpec((d0, d1, tile), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)

    def spec2(d0):
        return pl.BlockSpec((d0, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    kernel = _make_kernel(n, me, mi, cfg, has_x0, dtype, noeq=noeq)
    out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, bsz), dtype),
            jax.ShapeDtypeStruct((me, bsz), dtype),
            jax.ShapeDtypeStruct((mi, bsz), dtype),
            jax.ShapeDtypeStruct((mi, bsz), dtype),
            jax.ShapeDtypeStruct((8, bsz), dtype),
        ),
        grid=grid,
        in_specs=[
            spec3(n, n),      # P
            spec2(n),         # c
            spec3(me, n),     # A
            spec3(n, me),     # Aᵀ
            spec2(me),        # b
            spec3(mi, n),     # G
            spec2(mi),        # h
            spec2(n),         # x0
        ],
        out_specs=(
            spec2(n), spec2(me), spec2(mi), spec2(mi), spec2(8),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, n, tile), dtype),    # M / L_M
            pltpu.VMEM((n, me, tile), dtype),   # Aᵀ / M⁻¹Aᵀ
            pltpu.VMEM((me, me, tile), dtype),  # S / L_S
            pltpu.VMEM((n, 1, tile), dtype),    # vector solve (n)
            pltpu.VMEM((me, 1, tile), dtype),   # vector solve (me)
            pltpu.VMEM((1, tile), dtype),       # done mask
            pltpu.VMEM((n, tile), dtype),       # cached rx
            pltpu.VMEM((me, tile), dtype),      # cached ry
            pltpu.VMEM((mi, tile), dtype),      # cached rz
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(P, c, A, At, b, G, h, x0)
    return out


def solve_lanes_last(P, c, G, h, cfg: QpConfig = QpConfig(),
                     tile: int = DEFAULT_TILE, interpret: bool = False,
                     x0=None):
    """Inequality-only (noeq) fused solve on LANES-LAST operands.

    P (n, n, B), c (n, B), G (mi, n, B), h (mi, B), optional x0 (n, B);
    returns (x (n, B), z (mi, B), s (mi, B), stat (8, B)) — all lanes-last.

    This is the zero-relayout entry for producers that already compute in
    lanes-last layout (srbx.mpc_batch's condensed pipeline): the
    batch-leading `solve` pays one materialized transpose per operand
    (~300 MB/cycle at B=131072 — profiled at ~20 ms, more than the solve
    itself once lanes converge early). B must be a multiple of `tile`.
    """
    n, bsz = c.shape
    me = 1  # noeq placeholder row (never read by the specialized kernel)
    if bsz % tile:
        raise ValueError(f"lanes-last solve needs batch % tile == 0, got "
                         f"{bsz} % {tile}")
    zero_a = jnp.zeros((me, n, bsz), c.dtype)
    zero_b = jnp.zeros((me, bsz), c.dtype)
    has_x0 = x0 is not None
    x0_ll = x0 if has_x0 else jnp.zeros((n, bsz), c.dtype)
    x, _, z, s, stat = _solve_ll(
        P, c, zero_a, jnp.swapaxes(zero_a, 0, 1), zero_b, G, h,
        x0_ll, cfg, tile, interpret, has_x0, noeq=True,
    )
    return x, z, s, stat


def solve(P, c, A, b, G, h, cfg: QpConfig = QpConfig(), tile: int = DEFAULT_TILE,
          interpret: bool = False, x0=None) -> BatchSolution:
    """Drop-in replacement for srbx.ops.qp_batch.solve (backend='fused').

    Operands batch-leading (B, ...); pads B up to a tile multiple with benign
    identity QPs, transposes to lanes-last, runs the fused kernel, and
    restores batch-leading outputs.
    """
    bsz, n = c.shape
    me = A.shape[-2]
    mi = G.shape[-2]
    noeq = me == 0
    if noeq:
        # placeholder row for buffer shapes only: the kernel is specialized
        # (noeq=True) to skip the whole Schur-complement stage — no M⁻¹Aᵀ,
        # no S factorization, no dy — so the row is never read.
        A = jnp.zeros((bsz, 1, n), c.dtype)
        b = jnp.zeros((bsz, 1), c.dtype)
        me = 1

    pad = (-bsz) % tile
    if pad:
        def _pad(arr):
            reps = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
            return jnp.pad(arr, reps)
        # benign padding: P gets +I on the diagonal band via replicated lane 0
        P = jnp.concatenate(
            [P, jnp.broadcast_to(jnp.eye(n, dtype=P.dtype), (pad, n, n))], 0
        )
        c = _pad(c)
        A = _pad(A)
        b = _pad(b)
        G = _pad(G)
        h = jnp.concatenate([h, jnp.ones((pad, mi), h.dtype)], 0)
        if x0 is not None:
            x0 = _pad(x0)

    ll = lambda arr: jnp.moveaxis(arr, 0, -1)
    has_x0 = x0 is not None
    x0_ll = ll(x0) if has_x0 else jnp.zeros((n, bsz + pad), c.dtype)
    x, y, z, s, stat = _solve_ll(
        ll(P), ll(c), ll(A), ll(jnp.swapaxes(A, -1, -2)), ll(b), ll(G), ll(h),
        x0_ll, cfg, tile, interpret, has_x0, noeq=noeq,
    )
    bl = lambda arr: jnp.moveaxis(arr, -1, 0)[:bsz]
    stat = bl(stat)
    # the noeq placeholder row never enters the solve; return the true
    # (B, 0) equality dual so all three solver families share one shape
    y_out = bl(y)[:, :0] if noeq else bl(y)
    return BatchSolution(
        x=bl(x), y=y_out, z=bl(z), s=bl(s),
        iters=stat[:, 3].max().astype(jnp.int32),
        converged=stat[:, 2] > 0.5,
        res=stat[:, 0],
        gap=stat[:, 1],
    )
