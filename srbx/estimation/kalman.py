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
) -> KfState:
    """One predict+update step (`KF::updateKalman`, `src/kalman.cpp:39-100`).

    contact_ind: (4,) 0/1; imu_accel_body: (3,); rot: (3,3) body->world;
    rel_foot_pos: (4, 3) base->foot vectors in world frame.
    """
    dtype = state.x.dtype
    a_np, b_np, c_np = _build_matrices(dt)
    a = jnp.asarray(a_np, dtype)
    b = jnp.asarray(b_np, dtype)
    c = jnp.asarray(c_np, dtype)

    accel = rot @ imu_accel_body
    accel = accel.at[2].add(-g)

    # contact-gated process noise (`src/kalman.cpp:53-79`)
    foot_sd = jnp.where(contact_ind > 0, 1.0, 1e6)
    dtdt = dt * dt
    q_diag = jnp.zeros(18, dtype)
    q_diag = q_diag.at[3:6].set((accel_noise * dt) ** 2)
    for f in range(4):
        q_diag = q_diag.at[6 + 3 * f : 9 + 3 * f].set((foot_sd[f] * dt) ** 2)
    q_mat = jnp.diag(q_diag)
    r_mat = meas_noise * jnp.eye(16, dtype=dtype)

    # predict
    x_pred = a @ state.x + b @ accel
    p_pred = a @ state.p @ a.T + q_mat

    # measurement: rel positions + foot heights (0)
    z = jnp.concatenate([rel_foot_pos.reshape(-1), jnp.zeros(4, dtype)])
    y = z - c @ x_pred
    s = c @ p_pred @ c.T + r_mat
    k = jnp.linalg.solve(s.T, (p_pred @ c.T).T).T
    x_new = x_pred + k @ y
    p_new = (jnp.eye(18, dtype=dtype) - k @ c) @ p_pred
    return KfState(x_new, p_new)
