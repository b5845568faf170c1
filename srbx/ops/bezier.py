"""Bezier curves and constrained fits, batched over leading axes.

Replaces the reference's scalar C helpers (`include/Bezier.h:6-188`,
`include/math_define.h:229-417`) and the per-domain constrained-LSQ COM fit
(`src/MPC_dist.cpp:784-855`, `src/LocoWrapper.cpp:636-720`).

Conventions match the reference:
  * `bezier(alpha, s)` evaluates a Bernstein polynomial of degree
    `alpha.shape[-1] - 1` at phase `s` in [0, 1];
  * derivatives are with respect to the phase variable `s`, so callers scale
    by 1/T for time derivatives (see `calcVaryingBezierAll`,
    `include/Bezier.h:166-188`).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def _powers(base, count: int):
    """[base^0, base^1, ..., base^count] along a new trailing axis.

    Uses cumulative products (like the reference's x[i+1] = s*x[i] recursion,
    `include/Bezier.h:12-15`) — exact at the endpoints, unlike pow(0, 0)
    lowered through exp/log.
    """
    tiled = jnp.broadcast_to(base, base.shape[:-1] + (count,))
    ones = jnp.ones_like(base)
    return jnp.cumprod(jnp.concatenate([ones, tiled], axis=-1), axis=-1)


def _bernstein_basis(degree: int, s):
    """Bernstein basis [C(M,j) s^j (1-s)^(M-j)]_{j=0..M}; s broadcasts."""
    s = jnp.asarray(s)
    if not jnp.issubdtype(s.dtype, jnp.floating):
        # non-float (int phase counters): promote to the default float;
        # float inputs keep their dtype so f32 lanes stay f32 under x64
        s = s.astype(jnp.result_type(float))
    s = s[..., None]
    coef = jnp.asarray(
        [math.comb(degree, int(k)) for k in range(degree + 1)], dtype=s.dtype
    )
    return coef * _powers(s, degree) * _powers(1.0 - s, degree)[..., ::-1]


def bezier(alpha, s):
    """Evaluate Bezier curve. alpha: (..., M+1); s broadcastable to alpha[..., 0]."""
    degree = alpha.shape[-1] - 1
    return jnp.sum(alpha * _bernstein_basis(degree, s), axis=-1)


def bezier_d(alpha, s):
    """dC/ds — forward-difference form matching `calcBezierd`."""
    degree = alpha.shape[-1] - 1
    d_alpha = degree * (alpha[..., 1:] - alpha[..., :-1])
    return jnp.sum(d_alpha * _bernstein_basis(degree - 1, s), axis=-1)


def bezier_dd(alpha, s):
    """d²C/ds² — matching `calcBeziera`."""
    degree = alpha.shape[-1] - 1
    dd_alpha = (
        degree
        * (degree - 1)
        * (alpha[..., 2:] - 2.0 * alpha[..., 1:-1] + alpha[..., :-2])
    )
    return jnp.sum(dd_alpha * _bernstein_basis(degree - 2, s), axis=-1)


def varying_bezier(alpha, d_alpha, dd_alpha, s, dt):
    """Time-varying Bezier (pos, vel, acc) matching `calcVaryingBezierAll`
    (`include/Bezier.h:166-188`): control points themselves have velocity
    `d_alpha` and acceleration `dd_alpha`.
    """
    pos = bezier(alpha, s)
    vel = bezier_d(alpha, s) / dt + bezier(d_alpha, s)
    acc = (
        bezier_dd(alpha, s) / (dt * dt)
        + 2.0 * bezier_d(d_alpha, s) / dt
        + bezier(dd_alpha, s)
    )
    return pos, vel, acc


def _interp_matrix_inv(degree: int) -> np.ndarray:
    """Inverse of the Bernstein collocation matrix at uniform knots.

    B[i, j] = C(M,j) s_i^j (1-s_i)^(M-j), s_i = i/M. The reference fits a
    degree-4 Bezier to 5 LIP-state knots by a KKT-constrained least squares
    (`src/MPC_dist.cpp:800-853`); because the collocation matrix is square and
    nonsingular, that solve reduces exactly to interpolation alpha = B^{-1} x
    (the endpoint equality constraints are automatically active), which is
    what we compute — to machine precision the same alpha.
    """
    s = np.linspace(0.0, 1.0, degree + 1)
    j = np.arange(degree + 1)
    coef = np.asarray([math.comb(degree, int(k)) for k in range(degree + 1)])
    b = coef * s[:, None] ** j * (1.0 - s[:, None]) ** (degree - j)
    return np.linalg.inv(b)


_BINV4 = _interp_matrix_inv(4)


def fit_domain_bezier(knots):
    """Fit a degree-4 Bezier through 5 knots per channel.

    knots: (..., C, 5) channel values at s = 0, 1/4, 1/2, 3/4, 1.
    Returns alpha: (..., C, 5) control points.

    Equivalent to `fitComTrajectory_eventbase` for one domain
    (`src/MPC_dist.cpp:822-853`): the previous cycle's terminal state is the
    first knot (the alpha buffer), the 4 MPC knots follow.
    """
    binv = jnp.asarray(_BINV4, dtype=knots.dtype)
    return jnp.einsum("...ci,ji->...cj", knots, binv)


def cubic(t, t0, tf, p0, pf, v0, vf):
    """Cubic Hermite interpolation, matching the reference `cubic` helper
    (`include/math_define.h`) used for body-orientation trajectories
    (`src/LocoWrapper.cpp:1181-1189`). Returns position at time t."""
    tau = jnp.clip((t - t0) / (tf - t0), 0.0, 1.0)
    h00 = 2 * tau**3 - 3 * tau**2 + 1
    h10 = tau**3 - 2 * tau**2 + tau
    h01 = -2 * tau**3 + 3 * tau**2
    h11 = tau**3 - tau**2
    dt = tf - t0
    return h00 * p0 + h10 * dt * v0 + h01 * pf + h11 * dt * vf


def cubic_dot(t, t0, tf, p0, pf, v0, vf):
    tau = jnp.clip((t - t0) / (tf - t0), 0.0, 1.0)
    dt = tf - t0
    dh00 = (6 * tau**2 - 6 * tau) / dt
    dh10 = (3 * tau**2 - 4 * tau + 1) / dt
    dh01 = (-6 * tau**2 + 6 * tau) / dt
    dh11 = (3 * tau**2 - 2 * tau) / dt
    return dh00 * p0 + dh10 * dt * v0 + dh01 * pf + dh11 * dt * vf


def cubic_dot_dot(t, t0, tf, p0, pf, v0, vf):
    tau = jnp.clip((t - t0) / (tf - t0), 0.0, 1.0)
    dt = tf - t0
    d2h00 = (12 * tau - 6) / (dt * dt)
    d2h10 = (6 * tau - 4) / (dt * dt)
    d2h01 = (-12 * tau + 6) / (dt * dt)
    d2h11 = (6 * tau - 2) / (dt * dt)
    return d2h00 * p0 + d2h10 * dt * v0 + d2h01 * pf + d2h11 * dt * vf
