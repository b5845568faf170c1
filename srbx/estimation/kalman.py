"""18-state contact-aided Kalman filter for base-state estimation.

Functional port of `KF` (`src/kalman.cpp:3-100`, `include/kalman.hpp`):
state x = [com pos (3), com vel (3), foot positions FL/FR/RL/RR-ordered
(4 x 3)]; inputs = IMU acceleration rotated to world and gravity
compensated; measurements = the 12 kinematic base->foot relative positions
plus the 4 foot heights (ground at z = 0). Feet out of contact get huge
process noise (1e6) so their states free-float — the contact gating that
makes the filter leg-odometry aware.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class KfState(NamedTuple):
    x: jax.Array    # (18,)
    p: jax.Array    # (18, 18) covariance


def _build_matrices(dt: float):
    a = np.eye(18)
    a[0, 3] = a[1, 4] = a[2, 5] = dt
    b = np.zeros((18, 3))
    b[0, 0] = b[1, 1] = b[2, 2] = dt * dt / 2.0
    b[3, 0] = b[4, 1] = b[5, 2] = dt
    c = np.zeros((16, 18))
    for f in range(4):
        rows = slice(3 * f, 3 * f + 3)
        c[rows, 0:3] = np.eye(3)
        c[rows, 6 + 3 * f : 9 + 3 * f] = -np.eye(3)
        c[12 + f, 8 + 3 * f] = 1.0
    return a, b, c


def init(dt: float = 1e-3, com0=(0.0, 0.0, 0.09)) -> KfState:
    x = jnp.zeros(18)
    x = x.at[0:3].set(jnp.asarray(com0))
    return KfState(x, 1e4 * jnp.eye(18))


def update(
    state: KfState,
    contact_ind,
    imu_accel_body,
    rot,
    rel_foot_pos,
    dt: float = 1e-3,
    accel_noise: float = 2000.0,
    meas_noise: float = 1.0,
    g: float = 9.81,
    swing_noise: float = 1e6,
) -> KfState:
    """One predict+update step (`KF::updateKalman`, `src/kalman.cpp:39-100`).

    contact_ind: (4,) 0/1; imu_accel_body: (3,); rot: (3,3) body->world;
    rel_foot_pos: (4, 3) measurement rows base − foot in world frame —
    the reference's `relVec = −(base→foot FK)` (`src/A1_Exp.cpp:246-250`).

    The measurement update is the SEQUENTIAL (inverse-free) Kalman — the
    variant the reference wrote and commented out at `src/kalman.cpp:105-115`
    — rather than the joint-S "regular" form it ships (`:119-127`).
    With diagonal R they are mathematically identical, but the joint S is
    inherently f32-hostile: the rel-z and foot-height rows of C combine to
    measure base z twice, so S has an eigenvalue ≈ R while swing-foot rows
    carry the (swing_noise·dt)² ≈ 1e6 process noise — condition ~1e11,
    beyond f32, and Cholesky/inverse NaNs on TPU. The sequential form only
    ever divides by the scalar cᵢPcᵢᵀ+rᵢ > 0, and its rank-1 covariance
    downdate P - (Pcᵢ)(Pcᵢ)ᵀ/sᵢ is symmetric by construction.

    swing_noise: per-sample sd for feet out of contact (reference 1e6;
    1e3 is numerically kinder in f32 and equally "free-floating").
    """
    dtype = state.x.dtype
    a_np, b_np, c_np = _build_matrices(dt)
    a = jnp.asarray(a_np, dtype)
    b = jnp.asarray(b_np, dtype)
    c = jnp.asarray(c_np, dtype)

    accel = rot @ imu_accel_body
    accel = accel.at[2].add(-g)

    # contact-gated process noise (`src/kalman.cpp:53-79`)
    foot_sd = jnp.where(contact_ind > 0, 1.0, swing_noise)
    q_diag = jnp.zeros(18, dtype)
    q_diag = q_diag.at[3:6].set((accel_noise * dt) ** 2)
    for f in range(4):
        q_diag = q_diag.at[6 + 3 * f : 9 + 3 * f].set((foot_sd[f] * dt) ** 2)

    # predict
    x_pred = a @ state.x + b @ accel
    p_pred = a @ state.p @ a.T + jnp.diag(q_diag)
    p_pred = 0.5 * (p_pred + p_pred.T)

    # measurement: rel positions + foot heights (0)
    z = jnp.concatenate([rel_foot_pos.reshape(-1), jnp.zeros(4, dtype)])

    def row_update(carry, inp):
        x, p = carry
        ci, zi = inp
        pc = p @ ci                       # (18,)
        # clamp: f32 rounding can push the quadratic form slightly
        # negative once P has been downdated 16x/tick for thousands of
        # ticks; a negative si flips the gain sign and blows up the filter
        si = jnp.maximum(ci @ pc, 0.0) + jnp.asarray(meas_noise, dtype)
        k = pc / si
        x = x + k * (zi - ci @ x)
        p = p - jnp.outer(pc, pc) / si
        return (x, p), None

    (x_new, p_new), _ = jax.lax.scan(row_update, (x_pred, p_pred), (c, z))
    return KfState(x_new, 0.5 * (p_new + p_new.T))
