"""In-the-loop state estimation: sensors → (kinEst, KF, prob-contact) → q̂, q̇̂.

The reference's deployable stack never feeds ground truth to the controller:
every 1 ms tick the hardware drivers run kinematic odometry and the
contact-gated KF on IMU/encoder/foot-force measurements
(`driver_scripts/qp_only_exp.cpp:256,484`; `src/kalman.cpp:39`) and the
controller consumes the estimates. This module assembles srbx's estimators
(srbx.estimation.{kalman,kinest,contact}) into that per-tick pipeline so the
closed loops (srbx.sim.closedloop) can run with ground truth confined to the
plant.

Estimated generalized state (rbd conventions, q̇ = Euler rates):
  q̂  = [ base pos ← KF (or kinEst), eul ← IMU orientation, joints ← encoders ]
  q̇̂  = [ base vel ← KF (or kinEst), E⁻¹(eul)·R·ω_gyro, joint vel ← encoders ]

Contact gating uses the controller's own contact index from the previous
tick — exactly the `contactIndex` the reference threads from ContactEst into
kinEst/KF — and the probabilistic contact filter (the reference's stubbed
prob-Kalman, `src/ContactEst.cpp:69-75`) runs alongside for the
estimator-driven event triggers.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from srbx.estimation import contact as contact_mod
from srbx.estimation import kalman, kinest
from srbx.models import a1, rbd
from srbx.sim import sensors
from srbx.sim import wholebody as wb
from srbx.utils import transforms as tf


@dataclasses.dataclass(frozen=True)
class EstConfig:
    sensor: sensors.SensorConfig = sensors.SensorConfig()
    # base pos/vel source: "kinest" (stance-anchored odometry — the
    # reference hardware drivers' default, `qp_only_exp.cpp:256,484`) or
    # "kf" (the reference's IMU+kinematics filter, `src/kalman.cpp`).
    # Measured in-loop (6 trot domains, nominal sensor noise): kinest
    # ~2.6 mm / 0.03 m/s base pos/vel RMSE vs kf ~32 mm / 0.44 m/s — the
    # KF's (accel_noise·dt)² velocity process noise makes v chase the
    # per-tick kinematic innovations, so odometry wins at 1 kHz.
    source: str = "kinest"
    # KF noise values. The reference ships accel sd 2000 / meas var 1 /
    # swing sd 1e6 (`src/kalman.cpp:5-13,53-56`) — but never consumes the
    # KF estimate anywhere (`src/A1_Exp.cpp:254-264` comments the handoff
    # out, "temporary until the kalman filter is done"). Tuned-to-sensor
    # defaults here (see scripts/tune_kf.py + docs/ROUND3.md): accel sd
    # matches the IMU noise model, meas var ~(1 mm)², swing sd 1e3 stays
    # inside the f32 sequential-update precision envelope while remaining
    # effectively free-floating.
    kf_accel_noise: float = 0.5
    kf_meas_noise: float = 1e-5
    kf_swing_noise: float = 1e3
    contact_force_thresh: float = 15.0  # N, matches agent.tick_build


class EstState(NamedTuple):
    sens: sensors.SensorState
    kf: kalman.KfState
    kin: kinest.KinEstState
    p_contact: jax.Array     # (4,) probabilistic contact posterior
    contact_ind: jax.Array   # (4,) controller contact index, previous tick
    q_hat: jax.Array         # (18,) latest estimate
    qd_hat: jax.Array        # (18,)


def init(cfg: EstConfig, model: rbd.Model, sim: wb.SimState, key) -> EstState:
    """Initialize at a known start pose (the reference seeds kinEst/KF with
    each agent's hard-coded initial COM offset, `include/OtherUtils.hpp`)."""
    dtype = sim.q.dtype
    sens = sensors.init(cfg.sensor, key, sim.qd)
    kf = kalman.KfState(
        x=jnp.concatenate([
            sim.q[0:3], sim.qd[0:3],
            rbd.site_positions(model, sim.q)[a1.TOE_SITES].reshape(-1),
        ]).astype(dtype),
        p=(1e-2 * jnp.eye(18, dtype=dtype)),
    )
    kin = kinest.KinEstState(
        com=sim.q[0:3],
        toe_prev=rbd.site_positions(
            model, sim.q.at[0:3].set(0.0))[a1.TOE_SITES],
    )
    return EstState(
        sens=sens, kf=kf, kin=kin,
        p_contact=jnp.ones((4,), dtype),
        contact_ind=jnp.ones((4,), jnp.int32),
        q_hat=sim.q, qd_hat=sim.qd,
    )


class EstOut(NamedTuple):
    q_hat: jax.Array         # (18,)
    qd_hat: jax.Array        # (18,)
    foot_force: jax.Array    # (4,) measured (noisy) foot force
    p_contact: jax.Array     # (4,)


def update(cfg: EstConfig, sim_cfg: wb.SimConfig, model: rbd.Model,
           est: EstState, sim: wb.SimState, phase) -> tuple[EstState, EstOut]:
    """One 1 kHz estimation tick: synthesize measurements from the plant,
    run kinEst + KF + prob-contact, assemble (q̂, q̇̂).

    `phase` is the gait phase (for the prob-contact prior); `sim` is ground
    truth and is read ONLY through the sensor model."""
    dtype = sim.q.dtype
    sens, rd = sensors.read(cfg.sensor, sim_cfg, model, est.sens, sim)

    rot = tf.rot_xyz(rd.eul)
    # Euler rates from the gyro: eul̇ = E⁻¹(eul) · (R ω_b)
    eul_rate = jnp.linalg.solve(rbd.euler_rate_matrix(rd.eul),
                                rot @ rd.gyro)

    # base-pinned FK on measured orientation + encoders (what the hardware
    # estimators can evaluate without knowing the base position)
    q_fk = jnp.zeros(18, dtype).at[3:6].set(rd.eul).at[6:].set(rd.q_joints)
    toes_rel = rbd.site_positions(model, q_fk)[a1.TOE_SITES]   # base→foot

    contact_ind = est.contact_ind.astype(dtype)

    # --- KF: IMU prediction + kinematic foot measurements ---
    kf = kalman.update(
        est.kf, contact_ind, rd.imu_accel, rot, -toes_rel,
        dt=sim_cfg.dt, accel_noise=cfg.kf_accel_noise,
        meas_noise=cfg.kf_meas_noise, g=model.g,
        swing_noise=cfg.kf_swing_noise,
    )

    # --- kinEst: stance-anchored odometry ---
    qd_fk = jnp.zeros(18, dtype).at[3:6].set(eul_rate).at[6:].set(rd.qd_joints)
    kin, kin_com, kin_vel = kinest.update(
        model, est.kin, rd.q_joints, qd_fk, rd.eul, rd.foot_force,
        contact_ind, force_thresh=cfg.contact_force_thresh,
    )

    # --- probabilistic contact (estimated foot heights from KF base) ---
    base_pos = kf.x[0:3] if cfg.source == "kf" else kin_com
    base_vel = kf.x[3:6] if cfg.source == "kf" else kin_vel
    foot_z = base_pos[2] + toes_rel[:, 2]
    p_contact = contact_mod.prob_contact_update(
        est.p_contact, rd.foot_force, foot_z, phase)

    q_hat = jnp.concatenate([base_pos, rd.eul, rd.q_joints])
    qd_hat = jnp.concatenate([base_vel, eul_rate, rd.qd_joints])

    new_est = EstState(
        sens=sens, kf=kf, kin=kin, p_contact=p_contact,
        contact_ind=est.contact_ind, q_hat=q_hat, qd_hat=qd_hat,
    )
    return new_est, EstOut(q_hat, qd_hat, rd.foot_force, p_contact)


def set_contact_ind(est: EstState, ind) -> EstState:
    """Record the controller's contact index for the next tick's gating
    (the reference threads ContactEst's index into kinEst/KF the same way)."""
    return est._replace(contact_ind=ind.astype(jnp.int32))
