"""Debug breadcrumbs — the reference's `mark(a[,b,c,d])` printers and
`printSize` (`include/global_loco_structs.hpp:125-136`,
`src/MPC_dist.cpp:1179-1183`), trace-safe.

Inside jit, values print via jax.debug.print at execution time (ordered
with the surrounding computation); outside jit they print immediately.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mark(*vals):
    """Breadcrumb print of up to a few scalars/arrays; works under jit."""
    fmt = " ".join("{}" for _ in vals) if vals else "mark"
    jax.debug.print("[mark] " + fmt, *vals)


def print_size(name: str, arr):
    """Shape/dtype breadcrumb (`printSize`); static info, prints at trace."""
    arr = jnp.asarray(arr)
    print(f"[size] {name}: shape={tuple(arr.shape)} dtype={arr.dtype}")
