"""Nonlinear single-rigid-body (SRB) template model + GRF distribution.

The 12-state SRB reduced model of the legacy FastMPC controller
(`include/fast_MPC.hpp:29-31`, NUM_RED_STATE 12) and the per-leg ground
reaction force distribution QP (`FastMPC::updateDesiredForce`,
`src/fast_MPC.cpp:506-584`; also `src/forceUpdate.cpp:3-70`): given desired
COM accelerations, solve

  min ||H F − b||²  s.t. friction pyramids per stance leg,
  H = [I3 ... ; hat(r_i) ...],  b = [m(a_des + g); I ω̇_des + ω×Iω]

with the batched IPM. Dynamics are written directly in JAX with analytic
Jacobians by AD (per the BASELINE.json north star, replacing CasADi
codegen).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from srbx.config import QpConfig, SrbConfig
from srbx.ops import qp
from srbx.utils import transforms as tf


class SrbState(NamedTuple):
    p: jax.Array      # (3,) COM position
    v: jax.Array      # (3,) COM velocity
    r: jax.Array      # (3, 3) body->world rotation
    w: jax.Array      # (3,) world angular velocity


def init_state(p=(0.0, 0.0, 0.28), dtype=jnp.float64) -> SrbState:
    return SrbState(
        jnp.asarray(p, dtype), jnp.zeros(3, dtype),
        jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype),
    )


def dynamics(cfg: SrbConfig, state: SrbState, foot_pos, forces):
    """Continuous SRB dynamics under per-leg world forces.

    foot_pos: (4, 3) world foot positions; forces: (4, 3) world GRFs.
    Returns (dp, dv, dr, dw).
    """
    inertia = jnp.asarray(cfg.inertia, state.p.dtype)
    i_world = state.r @ inertia @ state.r.T
    f_tot = jnp.sum(forces, axis=0)
    dv = f_tot / cfg.mass - jnp.asarray([0.0, 0.0, cfg.g], state.p.dtype)
    torque = jnp.sum(jnp.cross(foot_pos - state.p, forces), axis=0)
    dw = jnp.linalg.solve(
        i_world, torque - jnp.cross(state.w, i_world @ state.w)
    )
    dr = tf.hat(state.w) @ state.r
    return state.v, dv, dr, dw


def step(cfg: SrbConfig, state: SrbState, foot_pos, forces, dt):
    """Semi-implicit integration with an exact SO(3) exponential for R."""
    _, dv, _, dw = dynamics(cfg, state, foot_pos, forces)
    v = state.v + dt * dv
    p = state.p + dt * v
    w = state.w + dt * dw
    r = tf.rodrigues(w * dt) @ state.r
    return SrbState(p, v, r, w)


def linearize(cfg: SrbConfig, state: SrbState, foot_pos, forces):
    """Analytic Jacobians of the (v, dv, dw) dynamics wrt (p, v, w, forces)
    via AD — the SQP-ready linearization of the template."""
    def f(p, v, w, fz):
        st = SrbState(p, v, state.r, w)
        dp, dv, _, dw = dynamics(cfg, st, foot_pos, fz)
        return jnp.concatenate([dp, dv, dw])

    jac = jax.jacfwd(f, argnums=(0, 1, 2, 3))(
        state.p, state.v, state.w, forces
    )
    return jac


def distribute_forces(
    cfg: SrbConfig,
    qp_cfg: QpConfig,
    com_pos,
    foot_pos,
    contact_ind,
    acc_des,
    omega_des,
    mu: float = 0.7,
):
    """GRF distribution QP (`FastMPC::updateDesiredForce`,
    `src/fast_MPC.cpp:506-584`), padded to 4 legs with masking.

    acc_des: (6,) desired (linear acc (3), angular acc (3));
    omega_des: (3,) current/desired angular rate (for the gyroscopic term).
    Returns (12,) per-leg world forces (masked legs zero).
    """
    dtype = com_pos.dtype
    con = contact_ind.astype(dtype)
    inertia = jnp.asarray(cfg.inertia, dtype)

    h = jnp.zeros((6, 12), dtype)
    for i in range(4):
        cols = slice(3 * i, 3 * i + 3)
        h = h.at[0:3, cols].set(con[i] * jnp.eye(3, dtype=dtype))
        r_i = foot_pos[i] - com_pos
        h = h.at[3:6, cols].set(con[i] * tf.hat(r_i))
    b = jnp.concatenate(
        [
            cfg.mass * (acc_des[0:3] + jnp.asarray([0.0, 0.0, cfg.g], dtype)),
            inertia @ acc_des[3:6] + tf.hat(omega_des) @ (inertia @ omega_des),
        ]
    )

    p_mat = h.T @ h + 1e-6 * jnp.eye(12, dtype=dtype)
    c = -(h.T @ b)

    gc = jnp.asarray(
        [
            [1.0, 0.0, -mu / jnp.sqrt(2.0)],
            [-1.0, 0.0, -mu / jnp.sqrt(2.0)],
            [0.0, 1.0, -mu / jnp.sqrt(2.0)],
            [0.0, -1.0, -mu / jnp.sqrt(2.0)],
            [0.0, 0.0, -1.0],
        ],
        dtype,
    )
    g = jnp.zeros((20, 12), dtype)
    h_ineq = jnp.ones((20,), dtype)
    for i in range(4):
        rows = slice(5 * i, 5 * i + 5)
        g = g.at[rows, 3 * i : 3 * i + 3].set(con[i] * gc)
        h_ineq = h_ineq.at[rows].set(jnp.where(con[i] > 0, 0.0, 1.0))

    a_eq = jnp.zeros((1, 12), dtype)
    b_eq = jnp.zeros((1,), dtype)
    sol = qp.solve(p_mat, c, a_eq, b_eq, g, h_ineq, qp_cfg)
    return sol.x * jnp.repeat(con, 3)
