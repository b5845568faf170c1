"""Gait scheduling and per-domain motion planning.

Functional port of `MotionPlanner` (`src/MotionPlanner.cpp:24-338`): per
gait, on each domain change choose the next contact pattern, domain length,
initial toe positions, and Raibert-style step length; during STAND generate
the 8-point Bezier stand-up trajectory.

Gaits implemented: STAND, TROT (MPC-driven desired velocity), WALK, PACE,
INPLACE_TROT, INPLACE_WALK, TAP. POSE's teach-pendant sinusoids live in
`pose_com`.
All branches are masked updates on a fixed-shape PlannerState so one jitted
program covers every lane regardless of its gait phase.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from srbx.config import Gait, MotionConfig
from srbx.ops import bezier as bz


class PlannerState(NamedTuple):
    com_des: jax.Array      # (12,) pos3, vel3, ori3, omega3
    toe_init: jax.Array     # (3, 4)
    toe_final: jax.Array    # (3, 4)
    step_len: jax.Array     # (3,)
    dom_ticks: jax.Array    # () float
    des_domain: jax.Array   # (4,) int32 desired contact pattern
    stand_from: jax.Array   # (3,) com at stand start
    des_vel: jax.Array      # (3,) ramped velocity command (WALK/PACE)
    cycle_idx: jax.Array    # () int32 — position in the gait cycle


def init(motion: MotionConfig, com0, toe_pos, dtype=jnp.float64) -> PlannerState:
    com_des = jnp.zeros((12,), dtype)
    com_des = com_des.at[0:3].set(com0)
    return PlannerState(
        com_des=com_des,
        toe_init=toe_pos.T.astype(dtype),
        toe_final=toe_pos.T.astype(dtype),
        step_len=jnp.zeros((3,), dtype),
        dom_ticks=jnp.asarray(1.0 * 1000, dtype),
        des_domain=jnp.ones((4,), jnp.int32),
        stand_from=com0.astype(dtype),
        des_vel=jnp.zeros((3,), dtype),
        cycle_idx=jnp.zeros((), jnp.int32),
    )


def stand_com(motion: MotionConfig, state: PlannerState, phase):
    """8-point Bezier stand-up (`src/MotionPlanner.cpp:60-97`)."""
    s = jnp.clip(phase, 0.0, 1.0)
    x0, y0, z0 = state.stand_from
    zf = motion.stand_height

    def alpha(a0, af):
        return jnp.stack(
            [a0, a0, a0, a0 + (af - a0) / 4, a0 + 3 * (af - a0) / 4, af, af, af]
        )

    ax, ay, az = alpha(x0, x0), alpha(y0, y0), alpha(z0, zf)
    pos = jnp.stack([bz.bezier(ax, s), bz.bezier(ay, s), bz.bezier(az, s)])
    vel = jnp.stack(
        [bz.bezier_d(ax, s), bz.bezier_d(ay, s), bz.bezier_d(az, s)]
    )
    com = jnp.zeros_like(state.com_des)
    com = com.at[0:3].set(pos)
    com = com.at[3:6].set(vel)
    return com


_TROT_A = np.asarray([0, 1, 1, 0], np.int32)
_TROT_B = np.asarray([1, 0, 0, 1], np.int32)
_PACE_A = np.asarray([0, 1, 0, 1], np.int32)
_PACE_B = np.asarray([1, 0, 1, 0], np.int32)
_WALK = np.asarray(
    [[0, 1, 1, 1], [1, 1, 0, 1], [1, 1, 1, 0], [1, 0, 1, 1]], np.int32
)


def next_trot_domain(prev_des):
    """The upcoming trot stance pattern (diagonal swap)."""
    return jnp.where(prev_des[0] == 1, jnp.asarray(_TROT_A), jnp.asarray(_TROT_B))


def set_com_des(state: PlannerState, com_xy_traj, stand_height=0.28) -> PlannerState:
    """`MotionPlanner::setComDes` (`src/MotionPlanner.cpp:24-43`):
    com_xy_traj = (x, y, dx, dy) from the MPC Bezier evaluation."""
    com = state.com_des
    com = com.at[0].set(com_xy_traj[0])
    com = com.at[1].set(com_xy_traj[1])
    com = com.at[2].set(stand_height)
    com = com.at[3].set(com_xy_traj[2])
    com = com.at[4].set(com_xy_traj[3])
    com = com.at[5].set(0.0)
    return state._replace(com_des=com)


def plan_trot(
    motion: MotionConfig,
    state: PlannerState,
    change_domain,
    prev_des,
    toe_pos,
    qd_xy,
    mpc_states,
):
    """TROT domain update (`src/MotionPlanner.cpp:227-268`): alternate the
    diagonal pairs, dom length = 4 grids, Raibert foothold from the MPC's
    planned velocity knots. Applies only where change_domain; otherwise the
    state passes through unchanged."""
    dtype = state.com_des.dtype
    dom_ticks = jnp.asarray(float(motion.trot_dom_ticks), dtype)

    a = jnp.asarray(_TROT_A)
    b = jnp.asarray(_TROT_B)
    new_des = jnp.where(prev_des[0] == 1, a, b)

    # desired velocity = mean of the MPC solution's velocity knots
    # (`src/MotionPlanner.cpp:254-255` reads elements 1, 5, 9, 13 / 3, 7, 11, 15).
    vx = jnp.mean(mpc_states[:, 1])
    vy = jnp.mean(mpc_states[:, 3])
    dom_sec = dom_ticks / 1000.0
    # python floats (not np scalars): weakly typed, so f32 lanes stay f32
    # even when the host has x64 enabled
    kx = float(0.1 * np.sqrt(0.28 / 9.81))
    ky = float(0.05 * np.sqrt(0.28 / 9.81))
    step = jnp.stack(
        [
            vx * dom_sec / 2.0 + kx * (qd_xy[0] - vx),
            vy * dom_sec / 2.0 + ky * (qd_xy[1] - vy),
            jnp.zeros((), dtype),
        ]
    )

    return PlannerState(
        com_des=state.com_des,
        toe_init=jnp.where(change_domain, toe_pos.T, state.toe_init),
        toe_final=jnp.where(change_domain, toe_pos.T, state.toe_final),
        step_len=jnp.where(change_domain, step, state.step_len),
        dom_ticks=jnp.where(change_domain, dom_ticks, state.dom_ticks),
        des_domain=jnp.where(change_domain, new_des, state.des_domain),
        stand_from=state.stand_from,
        des_vel=state.des_vel,
        cycle_idx=jnp.where(
            change_domain, state.cycle_idx + 1, state.cycle_idx
        ),
    )


def _ramp_vel(des_vel, fwd_speed, lat_speed, rate=0.01):
    """Signed velocity ramp (`MotionPlanner::updateVel`,
    `src/MotionPlanner.cpp:332-338`): step toward the target while
    sign(target)*v < sign(target)*target, so overshoot or a reversed command
    still converges (an |v| < |target| gate would stall there)."""
    def axis(v, target):
        sgn = jnp.sign(target)
        return v + jnp.where(sgn * v < sgn * target, rate * sgn, 0.0)

    return des_vel.at[0].set(axis(des_vel[0], fwd_speed)).at[1].set(
        axis(des_vel[1], lat_speed))


def plan_walk(motion: MotionConfig, state: PlannerState, change_domain, toe_pos,
              com_filtered, rot, fwd_speed=0.0, lat_speed=0.0):
    """WALK domain update (`src/MotionPlanner.cpp:188-220`)."""
    dtype = state.com_des.dtype
    dom_sec = 0.2
    n = jnp.mod(state.cycle_idx + 1, 4)
    new_des = jnp.asarray(_WALK)[n]
    des_vel = _ramp_vel(state.des_vel, fwd_speed, lat_speed)
    kp = jnp.asarray([0.04, 0.01, 0.0], dtype)
    step_body = kp * (rot.T @ com_filtered - des_vel) + dom_sec * (rot.T @ des_vel) / 2.0
    step = rot @ step_body
    return state._replace(
        toe_init=jnp.where(change_domain, toe_pos.T, state.toe_init),
        step_len=jnp.where(change_domain, step, state.step_len),
        dom_ticks=jnp.where(change_domain, jnp.asarray(dom_sec * 1000.0, dtype), state.dom_ticks),
        des_domain=jnp.where(change_domain, new_des, state.des_domain),
        des_vel=jnp.where(change_domain, des_vel, state.des_vel),
        cycle_idx=jnp.where(change_domain, state.cycle_idx + 1, state.cycle_idx),
    )


def plan_pace(motion: MotionConfig, state: PlannerState, change_domain, prev_des,
              toe_pos, com_filtered, rot, fwd_speed=0.0, lat_speed=0.0):
    """PACE domain update (`src/MotionPlanner.cpp:269-305`; it calls
    `updateVel` on domain change just like WALK)."""
    dtype = state.com_des.dtype
    dom_sec = 0.1
    new_des = jnp.where(prev_des[0] == 1, jnp.asarray(_PACE_A), jnp.asarray(_PACE_B))
    des_vel = _ramp_vel(state.des_vel, fwd_speed, lat_speed)
    kp = jnp.asarray([0.04, 0.02, 0.0], dtype)
    step_body = kp * (rot.T @ com_filtered - des_vel) + dom_sec * (rot.T @ des_vel) / 2.0
    step = rot @ step_body
    return state._replace(
        toe_init=jnp.where(change_domain, toe_pos.T, state.toe_init),
        step_len=jnp.where(change_domain, step, state.step_len),
        dom_ticks=jnp.where(change_domain, jnp.asarray(dom_sec * 1000.0, dtype), state.dom_ticks),
        des_domain=jnp.where(change_domain, new_des, state.des_domain),
        des_vel=jnp.where(change_domain, des_vel, state.des_vel),
        cycle_idx=jnp.where(change_domain, state.cycle_idx + 1, state.cycle_idx),
    )


def plan_inplace_trot(motion: MotionConfig, state: PlannerState, change_domain,
                      prev_des, toe_pos, hip_pos):
    """INPLACE_TROT (`src/MotionPlanner.cpp:178-187`): toes re-targeted under
    the hips each 0.16 s domain."""
    new_des = jnp.where(prev_des[0] == 1, jnp.asarray(_TROT_A), jnp.asarray(_TROT_B))
    toe_init = state.toe_init
    ti = jnp.concatenate([hip_pos.T[0:2], state.toe_init[2:3]], axis=0)
    return state._replace(
        toe_init=jnp.where(change_domain, ti, toe_init),
        dom_ticks=jnp.where(change_domain, 160.0, state.dom_ticks),
        des_domain=jnp.where(change_domain, new_des, state.des_domain),
        cycle_idx=jnp.where(change_domain, state.cycle_idx + 1, state.cycle_idx),
    )


_INPLACE_WALK = np.asarray(
    [[0, 1, 1, 1], [1, 0, 1, 1], [1, 1, 1, 0], [1, 1, 0, 1]], np.int32
)


def plan_tap(motion: MotionConfig, state: PlannerState, change_domain, toe_pos):
    """TAP (`src/MotionPlanner.cpp:155-163`): hold the FL leg raised
    ({1, 0, 1, 1}) for 1.5 s domains, zero step length."""
    new_des = jnp.asarray([1, 0, 1, 1], jnp.int32)
    return state._replace(
        toe_init=jnp.where(change_domain, toe_pos.T, state.toe_init),
        step_len=jnp.where(change_domain, jnp.zeros_like(state.step_len),
                           state.step_len),
        dom_ticks=jnp.where(change_domain, 1500.0, state.dom_ticks),
        des_domain=jnp.where(change_domain, new_des, state.des_domain),
        cycle_idx=jnp.where(change_domain, state.cycle_idx + 1,
                            state.cycle_idx),
    )


def plan_inplace_walk(motion: MotionConfig, state: PlannerState,
                      change_domain, toe_pos):
    """INPLACE_WALK (`src/MotionPlanner.cpp:164-177`): cycle one swing leg
    at a time (FR, FL, RL, RR) through 0.3 s domains, toes re-anchored."""
    n = jnp.mod(state.cycle_idx + 1, 4)
    new_des = jnp.asarray(_INPLACE_WALK)[n]
    return state._replace(
        toe_init=jnp.where(change_domain, toe_pos.T, state.toe_init),
        dom_ticks=jnp.where(change_domain, 300.0, state.dom_ticks),
        des_domain=jnp.where(change_domain, new_des, state.des_domain),
        cycle_idx=jnp.where(change_domain, state.cycle_idx + 1,
                            state.cycle_idx),
    )


def pose_com(motion: MotionConfig, pose_type: int, t, t_init, com_lock):
    """POSE teach-pendant sinusoids (`src/MotionPlanner.cpp:99-154`)."""
    freq = 0.8 * np.pi
    com = com_lock
    tt = t - t_init
    mags = {0: 0.04, 1: 0.04, 2: 0.05, 3: 0.3491, 4: 0.17453, 5: 0.13963}
    mag = mags.get(pose_type, 0.04)
    if pose_type in (0, 1):
        com = com.at[pose_type].add(mag * jnp.sin(freq * tt))
        com = com.at[pose_type + 3].add(mag * freq * jnp.cos(freq * tt))
    elif pose_type == 2:
        com = com.at[2].add(mag * jnp.cos(freq * tt) - mag)
        com = com.at[5].add(-mag * freq * jnp.sin(freq * tt))
    else:
        idx = pose_type + 3  # 3,4,5 -> ori rows 6,7,8
        com = com.at[idx].add(mag * jnp.sin(freq * tt))
        com = com.at[idx + 3].add(mag * freq * jnp.cos(freq * tt))
    return com


def com_des_from_velocity(state: PlannerState, q_xy, rot, stand_height,
                          dt: float = 1e-3):
    """Velocity-command COM reference for the standalone WALK/PACE gaits:
    comDes = q + R·desVel·dt at fixed stand height with desVel as the
    velocity reference (`src/MotionPlanner.cpp:222-226` — the snapshot
    carries this update commented out because its experiments drive COM
    from the MPC Bezier; it is the documented intent for MPC-less gaits)."""
    vel_w = rot @ state.des_vel
    com = state.com_des
    com = com.at[0].set(q_xy[0] + vel_w[0] * dt)
    com = com.at[1].set(q_xy[1] + vel_w[1] * dt)
    com = com.at[2].set(stand_height)
    com = com.at[3:6].set(vel_w)
    return state._replace(com_des=com)


def update_toe_final(state: PlannerState, change_domain, ind, ind_prev, toe_pos):
    """toeFinal bookkeeping (`src/MotionPlanner.cpp:307-315`)."""
    changed = (ind != ind_prev)[None, :]
    tf = jnp.where(changed, toe_pos.T, state.toe_final)
    tf = jnp.where(change_domain, toe_pos.T, tf)
    return state._replace(toe_final=tf)
