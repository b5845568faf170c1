"""Pallas TPU kernels: batched tiny-matrix Cholesky + triangular solves.

The IPM's hot ops are factorizations/substitutions of k ~ 30-70 matrices,
batched by the thousands. XLA's generic batched Cholesky measured ~75 GFLOP/s
on these shapes (it serializes per-column steps through HBM); these kernels
put the BATCH in the 128-wide lane axis and keep the whole working set in
VMEM, so every column step of the textbook right-looking factorization is a
(sublane x 128-lane) VPU vector op.

Layout: operands are lanes-last (k, k, B) / (k, r, B); the grid tiles B.
Matrix loops are Python-unrolled (k is small and static).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


DEFAULT_TILE = 256


def _chol_kernel(m_ref, l_ref, scratch):
    k = m_ref.shape[0]
    scratch[:] = m_ref[:]
    for j in range(k):
        d = jnp.sqrt(scratch[j, j, :])
        col = scratch[j:, j, :] / d[None, :]            # (k-j, B)
        l_ref[j:, j, :] = col
        if j + 1 < k:
            tail = col[1:]
            scratch[j + 1 :, j + 1 :, :] = (
                scratch[j + 1 :, j + 1 :, :]
                - tail[:, None, :] * tail[None, :, :]
            )
    # zero the strict upper triangle
    for j in range(1, k):
        l_ref[:j, j, :] = jnp.zeros_like(l_ref[:j, j, :])


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def cholesky(m, tile: int = DEFAULT_TILE, interpret: bool = False):
    """m: (k, k, B) SPD per lane -> lower L: (k, k, B). B % tile == 0."""
    k, _, b = m.shape
    grid = (b // tile,)
    spec = pl.BlockSpec((k, k, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _chol_kernel,
        out_shape=jax.ShapeDtypeStruct((k, k, b), m.dtype),
        grid=grid,
        in_specs=[spec],
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((k, k, tile), m.dtype)],
        interpret=interpret,
    )(m)


def _cho_solve_kernel(l_ref, b_ref, x_ref, scratch):
    k = l_ref.shape[0]
    # forward substitution: L y = b
    scratch[:] = b_ref[:]
    for j in range(k):
        yj = scratch[j, :, :] / l_ref[j, j, :][None, :]     # (r, B)
        scratch[j, :, :] = yj
        if j + 1 < k:
            scratch[j + 1 :, :, :] = (
                scratch[j + 1 :, :, :]
                - l_ref[j + 1 :, j, :][:, None, :] * yj[None, :, :]
            )
    # back substitution: Lᵀ x = y
    for j in range(k - 1, -1, -1):
        xj = scratch[j, :, :] / l_ref[j, j, :][None, :]
        x_ref[j, :, :] = xj
        if j > 0:
            scratch[:j, :, :] = (
                scratch[:j, :, :]
                - l_ref[j, :j, :][:, None, :] * xj[None, :, :]
            )


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def cho_solve(l, rhs, tile: int = DEFAULT_TILE, interpret: bool = False):
    """Solve (L Lᵀ) X = RHS. l: (k, k, B); rhs: (k, r, B) -> (k, r, B)."""
    k, _, b = l.shape
    r = rhs.shape[1]
    grid = (b // tile,)
    spec_l = pl.BlockSpec((k, k, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    spec_b = pl.BlockSpec((k, r, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _cho_solve_kernel,
        out_shape=jax.ShapeDtypeStruct((k, r, b), l.dtype),
        grid=grid,
        in_specs=[spec_l, spec_b],
        out_specs=spec_b,
        scratch_shapes=[pltpu.VMEM((k, r, tile), l.dtype)],
        interpret=interpret,
    )(l, rhs)
