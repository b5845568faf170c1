"""Rotation / frame transforms as pure jnp functions.

Replaces the reference's Eigen helper headers (`include/Transforms.hpp:10-125`,
`include/EigenUtils.hpp:10-76`). All functions are batched-friendly: they act
on the trailing axes and broadcast over leading batch axes.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_to_xyz(quat):
    """Quaternion (w,x,y,z) -> XYZ-Euler (roll, pitch, yaw).

    Matches `include/Transforms.hpp:10-16` (XYZ convention, not the usual ZYX).
    """
    qw, qx, qy, qz = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    roll = jnp.arctan2(-2.0 * (qy * qz - qx * qw), qw**2 - qx**2 - qy**2 + qz**2)
    pitch = jnp.arcsin(jnp.clip(2.0 * (qx * qz + qy * qw), -1.0, 1.0))
    yaw = jnp.arctan2(-2.0 * (qx * qy - qz * qw), qw**2 + qx**2 - qy**2 - qz**2)
    return jnp.stack([roll, pitch, yaw], axis=-1)


def quat_to_rot(quat):
    """Quaternion (w,x,y,z) -> rotation matrix (body->world).

    Matches `include/Transforms.hpp:29-45`.
    """
    q0, q1, q2, q3 = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    r = jnp.stack(
        [
            jnp.stack([2 * (q0 * q0 + q1 * q1) - 1, 2 * (q1 * q2 - q0 * q3), 2 * (q1 * q3 + q0 * q2)], axis=-1),
            jnp.stack([2 * (q1 * q2 + q0 * q3), 2 * (q0 * q0 + q2 * q2) - 1, 2 * (q2 * q3 - q0 * q1)], axis=-1),
            jnp.stack([2 * (q1 * q3 - q0 * q2), 2 * (q2 * q3 + q0 * q1), 2 * (q0 * q0 + q3 * q3) - 1], axis=-1),
        ],
        axis=-2,
    )
    return r


def rot_xyz(eul):
    """XYZ-Euler (roll, pitch, yaw) -> rotation matrix.

    Matches `include/Transforms.hpp:58-77` (R = Rz(yaw)ᵀ-free XYZ intrinsic
    composition used by the reference).
    """
    roll, pitch, yaw = eul[..., 0], eul[..., 1], eul[..., 2]
    sr, cr = jnp.sin(roll), jnp.cos(roll)
    sp, cp = jnp.sin(pitch), jnp.cos(pitch)
    sy, cy = jnp.sin(yaw), jnp.cos(yaw)
    r = jnp.stack(
        [
            jnp.stack([cp * cy, -cp * sy, sp], axis=-1),
            jnp.stack([cr * sy + cy * sp * sr, cr * cy - sp * sr * sy, -cp * sr], axis=-1),
            jnp.stack([sr * sy - cr * cy * sp, cy * sr + cr * sp * sy, cp * cr], axis=-1),
        ],
        axis=-2,
    )
    return r


def xyz_to_quat(eul):
    """XYZ-Euler -> quaternion (w,x,y,z). Matches `Transforms.hpp:86-97`."""
    half = 0.5 * eul
    sr, cr = jnp.sin(half[..., 0]), jnp.cos(half[..., 0])
    sp, cp = jnp.sin(half[..., 1]), jnp.cos(half[..., 1])
    sy, cy = jnp.sin(half[..., 2]), jnp.cos(half[..., 2])
    return jnp.stack(
        [
            cr * cp * cy - sr * sp * sy,
            sr * cp * cy + cr * sp * sy,
            -sr * cp * sy + cr * sp * cy,
            cr * cp * sy + sr * sp * cy,
        ],
        axis=-1,
    )


def to_world(vec, rot):
    """Body-frame vector -> world frame (`Transforms.hpp:107-109`)."""
    return jnp.einsum("...ij,...j->...i", rot, vec)


def to_body(vec, rot):
    """World-frame vector -> body frame (`Transforms.hpp:111-113`)."""
    return jnp.einsum("...ji,...j->...i", rot, vec)


def hat(v):
    """Skew-symmetric (hat) map, `include/EigenUtils.hpp` hatmap."""
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def vee(m):
    """Inverse of `hat`."""
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def rodrigues(axis_angle):
    """Exponential map so(3) -> SO(3) (used by the SRB integrator).

    AD-safe at zero: uses R = I + a(θ²)·hat(x) + b(θ²)·hat(x)² where
    a = sin(θ)/θ and b = (1-cos θ)/θ² are evaluated through their smooth
    small-angle forms, never differentiating a vector norm at 0."""
    n2 = jnp.sum(axis_angle * axis_angle, axis=-1)[..., None, None]
    theta = jnp.sqrt(n2 + 1e-30)
    small = n2 < 1e-12
    a = jnp.where(small, 1.0 - n2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - n2 / 24.0, (1.0 - jnp.cos(theta)) / (n2 + 1e-30))
    x_hat = hat(axis_angle)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis_angle.dtype), x_hat.shape)
    return eye + a * x_hat + b * (x_hat @ x_hat)
