"""Lanes-last batched dense linear algebra for tiny matrices.

The QP solver's hot ops are Cholesky factorizations and triangular solves of
~30-70-dim matrices batched by the thousands. XLA's `jnp.linalg.cholesky`
targets large matrices; for tiny-matrix batches the right TPU mapping is
**batch-through-lanes**: arrays laid out (n, n, B) so every scalar op of a
textbook right-looking factorization becomes a (.., B)-wide VPU vector op,
with the matrix loops unrolled at trace time (n is static and small).

These are pure-JAX kernels — XLA fuses the unrolled updates into vector code
directly; srbx.ops.qp can run its KKT solves through either backend.
"""

from __future__ import annotations

import jax.numpy as jnp


def cholesky_lanes(m):
    """Cholesky of SPD matrices in lanes-last layout.

    m: (n, n, B). Returns lower-triangular L: (n, n, B) with zeros above the
    diagonal. Right-looking outer-product form — O(n^3/3) elementwise vector
    ops over the lane axis, no matmuls.
    """
    n = m.shape[0]
    a = m
    cols = []
    for j in range(n):
        d = jnp.sqrt(a[j, j])                       # (B,)
        col = a[j:, j] / d                          # (n-j, B) incl. diagonal
        cols.append(col)
        if j + 1 < n:
            # trailing update: A[j+1:, j+1:] -= col_tail col_tailᵀ (per lane)
            tail = col[1:]                          # (n-j-1, B)
            a = a.at[j + 1 :, j + 1 :].add(-tail[:, None, :] * tail[None, :, :])
    out = jnp.zeros_like(m)
    for j, col in enumerate(cols):
        out = out.at[j:, j].set(col)
    return out


def solve_lower_lanes(l, b):
    """Solve L y = b with L lower-triangular (n, n, B), b (n, k, B)."""
    n = l.shape[0]
    b = jnp.asarray(b)
    y_rows = []
    work = b
    for j in range(n):
        yj = work[j] / l[j, j][None, :]             # (k, B)
        y_rows.append(yj)
        if j + 1 < n:
            work = work.at[j + 1 :].add(-l[j + 1 :, j][:, None, :] * yj[None, :, :])
    return jnp.stack(y_rows, axis=0)


def solve_upper_lanes(l, b):
    """Solve Lᵀ x = b (same lanes-last layout)."""
    n = l.shape[0]
    x_rows = [None] * n
    work = b
    for j in reversed(range(n)):
        xj = work[j] / l[j, j][None, :]
        x_rows[j] = xj
        if j > 0:
            # Lᵀ[i, j] = L[j, i] for i < j
            work = work.at[:j].add(-l[j, :j][:, None, :] * xj[None, :, :])
    return jnp.stack(x_rows, axis=0)


def cho_solve_lanes(l, b):
    """Solve (L Lᵀ) x = b."""
    return solve_upper_lanes(l, solve_lower_lanes(l, b))


def matmul_lanes(a, b):
    """(n, m, B) @ (m, k, B) per lane -> (n, k, B) via one einsum."""
    return jnp.einsum("imb,mkb->ikb", a, b)
