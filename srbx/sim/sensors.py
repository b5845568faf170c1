"""Synthetic onboard sensor streams from the whole-body plant.

The reference's hardware drivers never see ground truth: the controller is
fed IMU + joint encoders + foot-force sensors and runs kinematic odometry /
a contact-gated KF every 1 ms tick (`driver_scripts/qp_only_exp.cpp:256,484`
— `kinEst0/1(footForce, contactIndex, q, dq, R)`; `src/kalman.cpp:39`).
This module is the plant side of that boundary: given the true `SimState`,
it synthesizes what the sensors would measure — with white noise and
constant per-run biases — so the estimation stack (srbx.estimation) can be
closed into the batched loops with ground truth confined to the plant.

Conventions match srbx.models.rbd: q = [base pos, XYZ Euler, joints],
qd = q̇ (Euler rates). The IMU measures in the *body* frame: specific force
f_b = Rᵀ(a_world + g·e_z) and angular rate ω_b = Rᵀ E(eul) eul̇. The
orientation estimate `eul` stands in for the vendor IMU's onboard filter
(the reference consumes its quaternion directly, `src/A1_Sim.cpp:129-154`,
`qp_only_exp.cpp:246-252`).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from srbx.models import rbd
from srbx.sim import wholebody as wb
from srbx.utils import transforms as tf


@dataclasses.dataclass(frozen=True)
class SensorConfig:
    """Per-sample (1 kHz) noise standard deviations and bias magnitudes,
    sized for a hobby-grade MEMS IMU + joint encoders like the A1's."""

    accel_noise: float = 0.30      # m/s^2 per sample
    gyro_noise: float = 0.02       # rad/s per sample
    accel_bias: float = 0.05       # m/s^2, constant per run
    gyro_bias: float = 0.002       # rad/s, constant per run
    eul_noise: float = 0.002       # rad — onboard orientation-filter error
    enc_noise: float = 5e-4        # rad — joint encoder quantization/noise
    encvel_noise: float = 0.02     # rad/s — joint velocity noise
    force_noise: float = 2.0       # N — foot force sensor noise


class SensorState(NamedTuple):
    key: jax.Array          # PRNG carry
    accel_bias: jax.Array   # (3,) constant per run
    gyro_bias: jax.Array    # (3,)
    prev_qd: jax.Array      # (18,) for the accelerometer finite difference


class Reading(NamedTuple):
    """One tick of onboard measurements."""

    imu_accel: jax.Array    # (3,) body-frame specific force
    gyro: jax.Array         # (3,) body-frame angular velocity
    eul: jax.Array          # (3,) orientation estimate (XYZ Euler)
    q_joints: jax.Array     # (12,)
    qd_joints: jax.Array    # (12,)
    foot_force: jax.Array   # (4,) normal-force sensor


def init(cfg: SensorConfig, key, qd0) -> SensorState:
    kb, kg, key = jax.random.split(key, 3)
    dtype = qd0.dtype
    return SensorState(
        key=key,
        accel_bias=cfg.accel_bias * jax.random.normal(kb, (3,), dtype),
        gyro_bias=cfg.gyro_bias * jax.random.normal(kg, (3,), dtype),
        prev_qd=qd0,
    )


def read(cfg: SensorConfig, sim_cfg: wb.SimConfig, model, state: SensorState,
         sim: wb.SimState) -> tuple[SensorState, Reading]:
    """Measure one tick. Call after `wb.step`; the accelerometer output is
    the mean specific force over the elapsed tick (finite difference of the
    base velocity), which is exactly what a sampled IMU integrates."""
    dtype = sim.q.dtype
    key, *ks = jax.random.split(state.key, 7)
    n = lambda k, shape, sd: sd * jax.random.normal(k, shape, dtype)

    eul_true = sim.q[3:6]
    rot = tf.rot_xyz(eul_true)

    # specific force: Rᵀ(a_w + g e_z), a_w from the base-velocity difference
    a_w = (sim.qd[0:3] - state.prev_qd[0:3]) / sim_cfg.dt
    f_b = rot.T @ (a_w + jnp.asarray([0.0, 0.0, model.g], dtype))
    imu_accel = f_b + state.accel_bias + n(ks[0], (3,), cfg.accel_noise)

    # body angular rate: Rᵀ ω_world, ω_world = E(eul) eul̇
    w_world = rbd.euler_rate_matrix(eul_true) @ sim.qd[3:6]
    gyro = rot.T @ w_world + state.gyro_bias + n(ks[1], (3,), cfg.gyro_noise)

    eul = eul_true + n(ks[2], (3,), cfg.eul_noise)
    q_joints = sim.q[6:] + n(ks[3], (12,), cfg.enc_noise)
    qd_joints = sim.qd[6:] + n(ks[4], (12,), cfg.encvel_noise)
    force = wb.foot_force_measurement(sim_cfg, model, sim)
    foot_force = jnp.maximum(force + n(ks[5], (4,), cfg.force_noise), 0.0)

    new_state = SensorState(key, state.accel_bias, state.gyro_bias, sim.qd)
    return new_state, Reading(imu_accel, gyro, eul, q_joints, qd_joints,
                              foot_force)
