"""Batched tiny-SPD solves and inverses — the whole-body tick's hot linear
algebra, in the lanes-last form the TPU wants.

Profiled on v5e (scripts/bench_rbd_stages.py, B=256): XLA's batched
`cho_factor`+`cho_solve` of the 18x18 mass matrix costs ~2x the mass-matrix
construction itself, and `jnp.linalg.inv` per lane (the LL build's D^-1 and
the finish's 12x12 swing operational-space inverse) is in the same class —
XLA serializes the per-column steps of tiny factorizations through HBM. The
fix is the same batch-through-lanes mapping the fused QP kernel uses
(srbx.ops.qp_fused / pallas_linalg): operands live (n, n, TILE) in VMEM,
every column step is one (sublane x lane) VPU vector op, factorization and
substitution fused in a single pallas_call.

API is batch-LEADING (B, n, n) to match the control stack; the lanes-last
transpose happens inside. `backend="xla"` reproduces the plain jax path
bit-for-bit (used on CPU/f64 and as the equivalence reference).

These ops replace, per 1 kHz whole-body tick and lane: 2 mass-matrix
cho_solves (physics substeps), one 18x18 inverse (LL QP build,
`src/LowLevelCtrl.cpp`'s Dinv), and one 12x12 inverse (swing-PD
operational-space inertia, `src/LowLevelCtrl.cpp:73-93`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 256


def _chol_into(scratch, k):
    """In-place lower Cholesky of scratch (k, k, T); strict upper stale."""
    for j in range(k):
        d = jnp.sqrt(scratch[j, j, :])
        col = scratch[j:, j, :] / d[None, :]
        scratch[j:, j, :] = col
        if j + 1 < k:
            tail = col[1:]
            scratch[j + 1 :, j + 1 :, :] = (
                scratch[j + 1 :, j + 1 :, :]
                - tail[:, None, :] * tail[None, :, :]
            )


def _subst_into(l_ref, b_ref, k):
    """In-place solve (L Lᵀ) X = B on b_ref (k, r, T) given factored l_ref."""
    for j in range(k):
        yj = b_ref[j, :, :] / l_ref[j, j, :][None, :]
        b_ref[j, :, :] = yj
        if j + 1 < k:
            b_ref[j + 1 :, :, :] = (
                b_ref[j + 1 :, :, :]
                - l_ref[j + 1 :, j, :][:, None, :] * yj[None, :, :]
            )
    for j in range(k - 1, -1, -1):
        xj = b_ref[j, :, :] / l_ref[j, j, :][None, :]
        b_ref[j, :, :] = xj
        if j > 0:
            b_ref[:j, :, :] = (
                b_ref[:j, :, :]
                - l_ref[j, :j, :][:, None, :] * xj[None, :, :]
            )


def _solve_kernel(m_ref, b_ref, x_ref, lsc):
    k = m_ref.shape[0]
    lsc[:] = m_ref[:]
    _chol_into(lsc, k)
    x_ref[:] = b_ref[:]
    _subst_into(lsc, x_ref, k)


def _inv_kernel(m_ref, x_ref, lsc):
    k = m_ref.shape[0]
    lsc[:] = m_ref[:]
    _chol_into(lsc, k)
    eye = (jax.lax.broadcasted_iota(jnp.int32, (k, k, 1), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (k, k, 1), 1))
    x_ref[:] = jnp.broadcast_to(eye, x_ref.shape).astype(x_ref.dtype)
    _subst_into(lsc, x_ref, k)


def _pad_lanes(m_ll, pad, eye_fill: bool):
    """Pad the lane axis; identity lanes keep the Cholesky well-defined."""
    if pad == 0:
        return m_ll
    k = m_ll.shape[0]
    if eye_fill:
        fill = jnp.broadcast_to(
            jnp.eye(k, dtype=m_ll.dtype)[:, :, None], (k, k, pad))
    else:
        fill = jnp.zeros(m_ll.shape[:-1] + (pad,), m_ll.dtype)
    return jnp.concatenate([m_ll, fill], axis=-1)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def _solve_ll(m_ll, b_ll, tile, interpret):
    k, _, b = m_ll.shape
    r = b_ll.shape[1]
    eff = min(tile, max(b, 8))
    pad = (-b) % eff
    m_ll = _pad_lanes(m_ll, pad, eye_fill=True)
    b_ll = _pad_lanes(b_ll, pad, eye_fill=False)
    grid = ((b + pad) // eff,)
    spec_m = pl.BlockSpec((k, k, eff), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    spec_b = pl.BlockSpec((k, r, eff), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _solve_kernel,
        out_shape=jax.ShapeDtypeStruct((k, r, b + pad), m_ll.dtype),
        grid=grid,
        in_specs=[spec_m, spec_b],
        out_specs=spec_b,
        scratch_shapes=[pltpu.VMEM((k, k, eff), m_ll.dtype)],
        interpret=interpret,
    )(m_ll, b_ll)
    return out[:, :, :b]


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def _inv_ll(m_ll, tile, interpret):
    k, _, b = m_ll.shape
    eff = min(tile, max(b, 8))
    pad = (-b) % eff
    m_ll = _pad_lanes(m_ll, pad, eye_fill=True)
    grid = ((b + pad) // eff,)
    spec = pl.BlockSpec((k, k, eff), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _inv_kernel,
        out_shape=jax.ShapeDtypeStruct((k, k, b + pad), m_ll.dtype),
        grid=grid,
        in_specs=[spec],
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((k, k, eff), m_ll.dtype)],
        interpret=interpret,
    )(m_ll)
    return out[:, :, :b]


def solve(d, rhs, backend: str = "xla", tile: int = DEFAULT_TILE,
          interpret: bool = False):
    """Solve D x = rhs for SPD D, batched. d: (B, n, n); rhs: (B, n) or
    (B, n, r). Returns x with rhs's shape."""
    single = rhs.ndim == 2
    if backend == "xla":
        return jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(d, lower=True), rhs)
    b_ll = (rhs[:, :, None] if single else rhs).transpose(1, 2, 0)
    x = _solve_ll(d.transpose(1, 2, 0), b_ll, tile, interpret)
    x = x.transpose(2, 0, 1)
    return x[:, :, 0] if single else x


def inverse(d, backend: str = "xla", tile: int = DEFAULT_TILE,
            interpret: bool = False):
    """D^-1 for SPD D, batched. d: (B, n, n) -> (B, n, n)."""
    if backend == "xla":
        eye = jnp.broadcast_to(jnp.eye(d.shape[-1], dtype=d.dtype), d.shape)
        return jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(d, lower=True), eye)
    return _inv_ll(d.transpose(1, 2, 0), tile, interpret).transpose(2, 0, 1)
