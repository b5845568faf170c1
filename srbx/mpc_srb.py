"""Convex SRB-MPC — the legacy FastMPC's reduced-model MPC, realized.

The reference's previous-generation controller declares a 12-state SRB MPC
(`include/fast_MPC.hpp:98-103`: `runMPC`, `MPC_Cost`, `MPC_Constraints`,
`getLinearDynamics(Ad, Bd, Dd)`; `NUM_RED_STATE 12`, `CTRL_HORIZ 10`,
`include/fast_MPC.hpp:29-31`) but its definitions are absent from the
snapshot — only the downstream GRF-distribution QP exists
(`src/fast_MPC.cpp:506-584`, realized in srbx.models.srb). This module
completes the family: a condensed convex MPC over the linearized
single-rigid-body dynamics with per-leg ground-reaction forces as decision
variables and friction-pyramid constraints, solved with the batched IPM
(srbx.ops.qp) exactly like the flagship LIP NMPC.

TPU-first shape decisions:
  * static 12-state / 12-input / N-step shapes; swing legs handled by
    masking B columns (their forces are pulled to zero by the R-term, so no
    per-mode shape changes);
  * states eliminated in closed form (condensed QP over the N*12 force
    trajectory) — one dense PSD Hessian per lane, batched via vmap, the
    same speed-of-light regime as the condensed LIP path (srbx.ocp);
  * discretization uses the reference's Taylor-3 recipe
    (`src/MPC_dist.cpp:117-127`) extended with the affine gravity column Dd
    from the declared `getLinearDynamics(Ad, Bd, Dd)` signature.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from srbx.config import QpConfig, SrbConfig
from srbx.models import srb
from srbx.ops import qp
from srbx.utils import transforms as tf


@dataclasses.dataclass(frozen=True)
class SrbMpcConfig:
    """Reduced-model MPC settings (`include/fast_MPC.hpp:29-31`)."""

    srb: SrbConfig = SrbConfig()
    horizon: int = 10           # CTRL_HORIZ
    dt: float = 0.03            # MPC grid (one LL domain / horizon knot)
    mu: float = 0.7
    fz_min: float = 0.0
    fz_max: float = 200.0
    # Diagonal state weights on (p, v, rpy, omega) and force effort.
    w_pos: tuple = (50.0, 50.0, 200.0)
    w_vel: tuple = (5.0, 5.0, 20.0)
    w_rpy: tuple = (300.0, 300.0, 100.0)
    w_omega: tuple = (1.0, 1.0, 2.0)
    r_force: float = 1e-4

    @property
    def n_state(self) -> int:
        return 12

    @property
    def n_input(self) -> int:
        return 12

    @property
    def n_dec(self) -> int:
        return self.n_input * self.horizon

    @property
    def n_ineq(self) -> int:
        # 5 pyramid rows + 1 fz-max row per leg per knot.
        return 6 * 4 * self.horizon


class SrbMpcOutput(NamedTuple):
    forces: jax.Array     # (N, 4, 3) planned world GRFs
    states: jax.Array     # (N, 12) predicted states [p v rpy omega]
    sol: qp.QpSolution


def pack_state(state: srb.SrbState):
    """SrbState -> the 12-vector [p, v, rpy, omega_world]."""
    rpy = _rot_to_xyz(state.r)
    return jnp.concatenate([state.p, state.v, rpy, state.w])


def _rot_to_xyz(r):
    """XYZ-euler extraction matching tf.rot_xyz's convention."""
    sy = -r[2, 0]
    cy = jnp.sqrt(jnp.clip(r[0, 0] ** 2 + r[1, 0] ** 2, 1e-12))
    pitch = jnp.arctan2(sy, cy)
    roll = jnp.arctan2(r[2, 1], r[2, 2])
    yaw = jnp.arctan2(r[1, 0], r[0, 0])
    return jnp.stack([roll, pitch, yaw])


def get_linear_dynamics(cfg: SrbMpcConfig, x0, foot_pos):
    """(Ad, Bd, Dd): discrete linearized SRB dynamics — the declared
    `FastMPC::getLinearDynamics(Ad, Bd, Dd)` (`include/fast_MPC.hpp:103`).

    Linearization about the current yaw and foothold lever arms (roll/pitch
    small, gyroscopic term dropped):
        d p   = v
        d v   = (1/m) sum f_i - g zhat
        d rpy = Rz(yaw)^T omega
        d w   = Iw^{-1} sum hat(r_i - p) f_i,   Iw = Rz I Rz^T
    Discretized with the reference's Taylor-3 expm recipe
    (`src/MPC_dist.cpp:117-127`), extended to the affine gravity column.
    """
    dtype = x0.dtype
    m = cfg.srb.mass
    yaw = x0[8]
    rz = tf.rot_xyz(jnp.stack([jnp.zeros_like(yaw), jnp.zeros_like(yaw), yaw]))
    inertia = jnp.asarray(cfg.srb.inertia, dtype)
    iw = rz @ inertia @ rz.T
    iw_inv = jnp.linalg.inv(iw)

    a = jnp.zeros((12, 12), dtype)
    a = a.at[0:3, 3:6].set(jnp.eye(3, dtype=dtype))       # dp = v
    a = a.at[6:9, 9:12].set(rz.T)                          # drpy ~= Rz^T w

    lever = foot_pos - x0[0:3]                             # (4, 3)
    b = jnp.zeros((12, 12), dtype)
    for i in range(4):
        cols = slice(3 * i, 3 * i + 3)
        b = b.at[3:6, cols].set(jnp.eye(3, dtype=dtype) / m)
        b = b.at[9:12, cols].set(iw_inv @ tf.hat(lever[i]))

    d = jnp.zeros((12,), dtype).at[5].set(-cfg.srb.g)

    # Taylor-3 discretization (reference recipe, `src/MPC_dist.cpp:117-127`).
    dt = jnp.asarray(cfg.dt, dtype)
    a2, a3 = a @ a, a @ a @ a
    ad = jnp.eye(12, dtype=dtype) + dt * a + dt**2 / 2 * a2 + dt**3 / 6 * a3
    bint = dt * jnp.eye(12, dtype=dtype) + dt**2 / 2 * a + dt**3 / 6 * a2
    bd = bint @ b
    dd = bint @ d
    return ad, bd, dd


def _condense(cfg: SrbMpcConfig, ad, bd, dd, x0):
    """Closed-form state elimination: x_k = sx[k] x0 + su[k] u + sd[k]."""
    n_t = cfg.horizon
    sx = [ad]
    sd = [dd]
    for _ in range(n_t - 1):
        sx.append(ad @ sx[-1])
        sd.append(ad @ sd[-1] + dd)
    # su[k, j] = ad^(k-j) bd for j <= k
    su = [[None] * n_t for _ in range(n_t)]
    for k in range(n_t):
        blk = bd
        for j in range(k, -1, -1):
            su[k][j] = blk
            blk = ad @ blk
    zero = jnp.zeros_like(bd)
    su_mat = jnp.block(
        [[su[k][j] if j <= k else zero for j in range(n_t)] for k in range(n_t)]
    )
    sx_mat = jnp.concatenate(sx, axis=0)            # (12N, 12)
    sd_vec = jnp.concatenate(sd, axis=0)            # (12N,)
    return sx_mat @ x0 + sd_vec, su_mat


def mpc_cost(cfg: SrbMpcConfig, xfree, su, x_ref):
    """Condensed (P_QP, c_QP) — `FastMPC::MPC_Cost`
    (`include/fast_MPC.hpp:101`)."""
    dtype = xfree.dtype
    qdiag = jnp.asarray(
        cfg.w_pos + cfg.w_vel + cfg.w_rpy + cfg.w_omega, dtype
    )
    qbar = jnp.tile(qdiag, cfg.horizon)
    err = xfree - x_ref.reshape(-1)
    p_mat = (su.T * qbar) @ su + cfg.r_force * jnp.eye(cfg.n_dec, dtype=dtype)
    c = su.T @ (qbar * err)
    return p_mat, c


def mpc_constraints(cfg: SrbMpcConfig, contact_schedule, dtype):
    """(G, h) friction pyramids + fz bounds — `FastMPC::MPC_Constraints`
    (`include/fast_MPC.hpp:102`). Swing knots get inert rows (g=0, h=1),
    the srbx.ops.qp padding convention."""
    root2 = 2.0 ** 0.5
    gc = jnp.asarray(
        [
            [1.0, 0.0, -cfg.mu / root2],
            [-1.0, 0.0, -cfg.mu / root2],
            [0.0, 1.0, -cfg.mu / root2],
            [0.0, -1.0, -cfg.mu / root2],
            [0.0, 0.0, -1.0],
            [0.0, 0.0, 1.0],
        ],
        dtype,
    )
    hc = jnp.asarray([0.0, 0.0, 0.0, 0.0, -cfg.fz_min, cfg.fz_max], dtype)

    g = jnp.zeros((cfg.n_ineq, cfg.n_dec), dtype)
    h = jnp.ones((cfg.n_ineq,), dtype)
    for k in range(cfg.horizon):
        for i in range(4):
            c_ki = contact_schedule[k, i].astype(dtype)
            rows = slice(24 * k + 6 * i, 24 * k + 6 * i + 6)
            cols = slice(12 * k + 3 * i, 12 * k + 3 * i + 3)
            g = g.at[rows, cols].set(c_ki * gc)
            h = h.at[rows].set(jnp.where(c_ki > 0, hc, jnp.ones_like(hc)))
    return g, h


def run_mpc(
    cfg: SrbMpcConfig,
    qp_cfg: QpConfig,
    x0,
    foot_pos,
    contact_schedule,
    x_ref,
) -> SrbMpcOutput:
    """One SRB-MPC solve — the declared `FastMPC::runMPC`
    (`include/fast_MPC.hpp:100`).

    x0: (12,) packed state; foot_pos: (4, 3) world footholds;
    contact_schedule: (N, 4) stance mask over the horizon;
    x_ref: (N, 12) state reference.
    """
    ad, bd, dd = get_linear_dynamics(cfg, x0, foot_pos)
    xfree, su = _condense(cfg, ad, bd, dd, x0)
    g, h = mpc_constraints(cfg, contact_schedule, x0.dtype)

    # Swing-leg forces: zero their B columns so they cannot act, and let the
    # R-term pull them to exactly zero (their gradient entries are zero).
    mask = jnp.repeat(contact_schedule.reshape(-1), 3).astype(x0.dtype)
    su = su * mask[None, :]
    p_mat, c = mpc_cost(cfg, xfree, su, x_ref)

    a_eq = jnp.zeros((1, cfg.n_dec), x0.dtype)
    b_eq = jnp.zeros((1,), x0.dtype)
    sol = qp.solve(p_mat, c, a_eq, b_eq, g, h, qp_cfg)
    u = sol.x * mask
    states = (xfree + su @ u).reshape(cfg.horizon, 12)
    return SrbMpcOutput(u.reshape(cfg.horizon, 4, 3), states, sol)


def trot_schedule(cfg: SrbMpcConfig, phase0, knots_per_half: int = 5):
    """(N, 4) trot stance schedule: diagonal pairs alternate every
    `knots_per_half` knots, starting at integer half-cycle `phase0`."""
    pair_a = jnp.asarray([1, 0, 0, 1], jnp.int32)
    pair_b = jnp.asarray([0, 1, 1, 0], jnp.int32)
    k = jnp.arange(cfg.horizon)
    half = (phase0 + k // knots_per_half) % 2
    return jnp.where(half[:, None] == 0, pair_a[None, :], pair_b[None, :])


def hold_reference(cfg: SrbMpcConfig, p_des, yaw_des, v_des, dtype):
    """(N, 12) constant-velocity reference toward p_des at v_des."""
    k = (jnp.arange(cfg.horizon, dtype=dtype) + 1.0) * cfg.dt
    p = p_des[None, :] + k[:, None] * v_des[None, :]
    ref = jnp.zeros((cfg.horizon, 12), dtype)
    ref = ref.at[:, 0:3].set(p)
    ref = ref.at[:, 3:6].set(v_des[None, :])
    ref = ref.at[:, 8].set(yaw_des)
    return ref


run_mpc_batch = jax.vmap(run_mpc, in_axes=(None, None, 0, 0, 0, 0))


def raibert_footholds(cfg: SrbMpcConfig, x0, stance_dur: float,
                      v_des, k_raibert: float = 0.03):
    """Raibert-style touchdown targets for the SRB template
    (`src/MotionPlanner.cpp:227-268` heuristic, reduced to the template):
    hip projection + half-stance drift + velocity-error correction."""
    dtype = x0.dtype
    offsets = jnp.asarray(
        [
            [0.1830, -0.1320],
            [0.1830, 0.1320],
            [-0.1830, -0.1320],
            [-0.1830, 0.1320],
        ],
        dtype,
    )
    v = x0[3:5]
    aim = (
        x0[0:2][None, :]
        + offsets
        + 0.5 * stance_dur * v[None, :]
        + k_raibert * (v - v_des[0:2])[None, :]
    )
    z = jnp.zeros((4, 1), dtype)
    return jnp.concatenate([aim, z], axis=1)


def trot_template_rollout(
    cfg: SrbMpcConfig,
    qp_cfg: QpConfig,
    state: srb.SrbState,
    v_des,
    n_half_cycles: int = 10,
    knots_per_half: int = 5,
    substeps: int = 3,
):
    """Closed-loop trot on the nonlinear SRB template: the SRB-MPC replans
    EVERY knot over a receding horizon whose stance schedule rolls through
    the alternating diagonal pairs; the swing pair re-steps to Raibert
    targets at each half-cycle boundary; the nonlinear template integrates
    the first-knot forces — the reduced-model locomotion loop of the legacy
    FastMPC stack (`src/fast_MPC.cpp:250-505` trajectory planning +
    `:506-584` forces).

    Returns (final state, (n_half_cycles*knots_per_half, 12) state history).
    """
    dtype = state.p.dtype
    stance_dur = knots_per_half * cfg.dt
    height = jnp.asarray([0.0, 0.0, 0.28], dtype)
    pair_a = jnp.asarray([1, 0, 0, 1], jnp.int32)
    pair_b = jnp.asarray([0, 1, 1, 0], jnp.int32)

    @jax.jit
    def knot_step(state, foot, k_global):
        x0 = pack_state(state)
        # rolling schedule: half-cycle index of knot (k_global + j)
        j = jnp.arange(cfg.horizon)
        half = ((k_global + j) // knots_per_half) % 2
        sched = jnp.where(half[:, None] == 0, pair_a[None, :], pair_b[None, :])
        # re-step the incoming swing pair at half-cycle boundaries
        at_boundary = (k_global % knots_per_half) == 0
        aim = raibert_footholds(cfg, x0, stance_dur, v_des)
        swing = (1 - sched[0])[:, None].astype(dtype) * at_boundary
        foot = foot * (1.0 - swing) + aim * swing

        p_ref = x0[0:3] * jnp.asarray([1.0, 1.0, 0.0], dtype) + height
        ref = hold_reference(cfg, p_ref, x0[8], v_des, dtype)
        out = run_mpc(cfg, qp_cfg, x0, foot, sched, ref)

        def sub(s, _):
            return srb.step(cfg.srb, s, foot, out.forces[0],
                            cfg.dt / substeps), None

        state2, _ = jax.lax.scan(sub, state, None, length=substeps)
        return state2, foot, pack_state(state2)

    foot = raibert_footholds(cfg, pack_state(state), stance_dur,
                             jnp.zeros(3, dtype))
    hist = []
    for k in range(n_half_cycles * knots_per_half):
        state, foot, x = knot_step(state, foot, jnp.asarray(k, jnp.int32))
        hist.append(x)
    return state, jnp.stack(hist)
