"""Linear inverted pendulum (LIP) template model.

The NMPC's prediction model: state x = (px, vx, py, vy), input u = COP
(ux, uy). Continuous dynamics and the Taylor-3 discretization replicate
`src/MPC_dist.cpp:104-127` to machine precision; an exact matrix-exponential
discretization is also provided.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from srbx.config import LipConfig


@functools.lru_cache(maxsize=None)
def continuous(cfg: LipConfig):
    """Continuous (A, B) as numpy constants.

    A = [[0,1,0,0],[g/h,0,0,0],[0,0,0,1],[0,0,g/h,0]], B couples COP with
    -g/h (reference `src/MPC_dist.cpp:117-122`).
    """
    w2 = cfg.g / cfg.h
    a = np.zeros((4, 4))
    a[0, 1] = 1.0
    a[1, 0] = w2
    a[2, 3] = 1.0
    a[3, 2] = w2
    b = np.zeros((4, 2))
    b[1, 0] = -w2
    b[3, 1] = -w2
    return a, b


@functools.lru_cache(maxsize=None)
def discrete(cfg: LipConfig, order: int = 3):
    """Taylor-`order` discretization (Ad, Bd) as numpy constants.

    order=3 matches `src/MPC_dist.cpp:126-127`:
      Ad = I + A T + (A T)^2/2 + (A T)^3/6,  Bd = A^{-1} (Ad - I) B.
    """
    a, b = continuous(cfg)
    t = cfg.ts
    ad = np.eye(4)
    term = np.eye(4)
    fact = 1.0
    for k in range(1, order + 1):
        term = term @ a * t
        fact *= k
        ad = ad + term / fact
    bd = np.linalg.solve(a, (ad - np.eye(4)) @ b)
    return ad, bd


@functools.lru_cache(maxsize=None)
def discrete_exact(cfg: LipConfig):
    """Exact ZOH discretization via the closed-form expm of the LIP.

    Each (pos, vel) pair decouples: with w = sqrt(g/h),
      Ad2 = [[cosh(wT), sinh(wT)/w], [w sinh(wT), cosh(wT)]].
    """
    w = np.sqrt(cfg.g / cfg.h)
    t = cfg.ts
    ch, sh = np.cosh(w * t), np.sinh(w * t)
    ad2 = np.array([[ch, sh / w], [w * sh, ch]])
    ad = np.zeros((4, 4))
    ad[0:2, 0:2] = ad2
    ad[2:4, 2:4] = ad2
    a, b = continuous(cfg)
    bd = np.linalg.solve(a, (ad - np.eye(4)) @ b)
    return ad, bd


def step(cfg: LipConfig, x, u):
    """One discrete LIP step: x' = Ad x + Bd u. Batched over leading axes."""
    ad, bd = discrete(cfg)
    ad = jnp.asarray(ad, dtype=x.dtype)
    bd = jnp.asarray(bd, dtype=x.dtype)
    return x @ ad.T + u @ bd.T


def rollout(cfg: LipConfig, x0, us):
    """Roll the LIP under an input sequence.

    x0: (..., 4); us: (N, ..., 2). Returns xs: (N, ..., 4) — states after
    each input (x_1..x_N), the same convention as the MPC equality rollout
    (`src/MPC_dist.cpp:232-237`).
    """

    def f(x, u):
        x_next = step(cfg, x, u)
        return x_next, x_next

    _, xs = jax.lax.scan(f, x0, us)
    return xs
