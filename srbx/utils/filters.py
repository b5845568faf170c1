"""Causal filters as pure carry-state functions.

Replaces `include/Filters.h:39-150` (second-order Butterworth low-pass, and
the moving-average COM filter of `src/RobotModel.cpp:44-46`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Biquad(NamedTuple):
    b: tuple    # (b0, b1, b2) feedforward
    a: tuple    # (a1, a2) feedback (a0 = 1)


class BiquadState(NamedTuple):
    x1: jax.Array
    x2: jax.Array
    y1: jax.Array
    y2: jax.Array


def butter2(cutoff_hz: float, fs_hz: float) -> Biquad:
    """Second-order Butterworth low-pass via bilinear transform."""
    wc = np.tan(np.pi * cutoff_hz / fs_hz)
    k1 = np.sqrt(2.0) * wc
    k2 = wc * wc
    norm = 1.0 + k1 + k2
    b0 = k2 / norm
    b1 = 2.0 * b0
    b2 = b0
    a1 = 2.0 * (k2 - 1.0) / norm
    a2 = (1.0 - k1 + k2) / norm
    return Biquad((b0, b1, b2), (a1, a2))


def biquad_init(shape=(), dtype=jnp.float64) -> BiquadState:
    z = jnp.zeros(shape, dtype)
    return BiquadState(z, z, z, z)


def biquad_apply(f: Biquad, s: BiquadState, x):
    b0, b1, b2 = f.b
    a1, a2 = f.a
    y = b0 * x + b1 * s.x1 + b2 * s.x2 - a1 * s.y1 - a2 * s.y2
    return BiquadState(x, s.x1, y, s.y1), y


class MovingAverage(NamedTuple):
    buf: jax.Array   # (window, ...) ring buffer
    idx: jax.Array   # () int32


def moving_average_init(window: int, shape, dtype=jnp.float64) -> MovingAverage:
    return MovingAverage(jnp.zeros((window,) + tuple(shape), dtype),
                         jnp.zeros((), jnp.int32))


def moving_average_apply(s: MovingAverage, x):
    """Ring-buffer mean (the reference's HIST_LEN COM velocity filter)."""
    buf = s.buf.at[s.idx].set(x)
    idx = jnp.mod(s.idx + 1, s.buf.shape[0])
    return MovingAverage(buf, idx), jnp.mean(buf, axis=0)
