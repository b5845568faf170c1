"""1 kHz whole-body low-level controller: virtual constraints + QP torques.

Functional, statically-shaped port of the reference's L4 layer:

  * `VirtualConstraints::updateVirtualConstraints`
    (`src/VirtualConstraints.cpp:15-125`): outputs y = h0 - hd stacking the
    base pose (6) and swing-toe positions; swing x/y track a time-varying
    cubic Bezier toward hip + step length, z an 8-point Bezier to swing
    height;
  * `LowLevelCtrl::calcTorque` (`src/LowLevelCtrl.cpp:18-226`): QP over
    [contact forces | joint torques | output defects (| CLF defect)] with
    I/O-linearization equality constraints, friction pyramids, torque
    bounds, and an optional CLF decrease constraint; swing-leg PD and
    inverse-kinematics joint integration.

Static padded shapes (variable contact count via masking):
  decision x = [F (12: 3 per leg) | tau (12) | aux (18: 6 base + 3 per leg)
                | clf defect]                                    -> n = 43
  equalities  : contact rows (12, masked to stance legs),
                output rows (18, masked to base + swing legs)    -> me = 30
  inequalities: friction pyramids (20, masked), +-tau (24), CLF  -> mi = 45
Masked legs' F slots have zero columns everywhere and are pinned by the
dfPen cost toward a zero target; masked aux slots are pinned by auxPen.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from srbx.config import LowLevelConfig, MotionConfig, QpConfig, TOTAL_DOF
from srbx.models import a1, rbd
from srbx.ops import bezier as bz
from srbx.ops import qp

N_DEC = 43
N_EQ = 30
N_INEQ = 45


class VcOut(NamedTuple):
    y: jax.Array        # (18,) outputs (masked rows zero)
    dy: jax.Array       # (18,)
    h0_mat: jax.Array   # (18, 18) output map H0 (masked rows zero)
    dh0: jax.Array      # (18,) J̇q̇ of outputs
    hd: jax.Array       # (18,) desired outputs
    dhd: jax.Array      # (18,)
    ddhd: jax.Array     # (18,)
    out_mask: jax.Array  # (18,) 1 for active output rows


class TrajIn(NamedTuple):
    """Per-domain trajectory data (MotionPlanner outputs)."""

    com_des: jax.Array     # (12,) pos3, vel3, ori3, omega3
    toe_init: jax.Array    # (3, 4) toe positions at domain start
    step_len: jax.Array    # (3,) Raibert step length
    dom_ticks: jax.Array   # () domain length in ticks
    toe_offset_z: jax.Array  # () ground-contact z offset


class LLOut(NamedTuple):
    tau: jax.Array         # (12,) joint torques
    grf: jax.Array         # (12,) QP contact forces (per-leg 3, masked 0)
    y: jax.Array
    dy: jax.Array
    ddq: jax.Array         # (18,) commanded accel
    q_next: jax.Array      # (18,) integrated joint command
    dq_next: jax.Array
    v_lyap: jax.Array      # () CLF value (0 when unused)
    dv_lyap: jax.Array
    qp_converged: jax.Array


def virtual_constraints(
    ll_cfg: LowLevelConfig,
    motion: MotionConfig,
    q,
    qd,
    contact_ind,
    phase,
    traj: TrajIn,
    prev_ddq,
    toe_pos,
    toe_jac,
    toe_jdqd,
    hip_pos,
    hip_jac,
    hip_jdqd,
):
    """Build outputs y/dy and the output map (padded 18-row layout:
    rows 0..5 base pose, rows 6+3i leg i's toe)."""
    dtype = q.dtype
    nq = TOTAL_DOF
    swing = 1.0 - contact_ind.astype(dtype)              # (4,)

    h0_mat = jnp.zeros((18, nq), dtype)
    h0_mat = h0_mat.at[0:6, 0:6].set(jnp.eye(6, dtype=dtype))
    dh0 = jnp.zeros((18,), dtype)
    hd = jnp.zeros((18,), dtype)
    dhd = jnp.zeros((18,), dtype)
    ddhd = jnp.zeros((18,), dtype)

    # base rows
    hd = hd.at[0:3].set(traj.com_des[0:3])
    dhd = dhd.at[0:3].set(traj.com_des[3:6])
    hd = hd.at[3:6].set(traj.com_des[6:9])
    dhd = dhd.at[3:6].set(traj.com_des[9:12])

    dt = traj.dom_ticks / (1.0 * ll_cfg.ctrl_hz)
    ds = 1.0 / dt

    # swing toe rows (computed for every leg, masked by `swing`)
    hip_vel = jnp.einsum("lin,n->li", hip_jac, qd)       # (4, 3)
    hip_acc = jnp.einsum("lin,n->li", hip_jac, prev_ddq) + hip_jdqd

    def leg_traj(i):
        ax = jnp.stack(
            [traj.toe_init[0, i], traj.toe_init[0, i],
             hip_pos[i, 0] + traj.step_len[0], hip_pos[i, 0] + traj.step_len[0]]
        )
        dax = jnp.stack([0.0, 0.0, hip_vel[i, 0], hip_vel[i, 0]]).astype(dtype)
        ddax = jnp.stack([0.0, 0.0, hip_acc[i, 0], hip_acc[i, 0]]).astype(dtype)
        px, vx, axx = bz.varying_bezier(ax, dax, ddax, phase, dt)

        ay = jnp.stack(
            [traj.toe_init[1, i], traj.toe_init[1, i],
             hip_pos[i, 1] + traj.step_len[1], hip_pos[i, 1] + traj.step_len[1]]
        )
        day = jnp.stack([0.0, 0.0, hip_vel[i, 1], hip_vel[i, 1]]).astype(dtype)
        dday = jnp.stack([0.0, 0.0, hip_acc[i, 1], hip_acc[i, 1]]).astype(dtype)
        py, vy, ayy = bz.varying_bezier(ay, day, dday, phase, dt)

        to = traj.toe_offset_z
        sw = motion.swing_height
        az = jnp.stack(
            [traj.toe_init[2, i], traj.toe_init[2, i], sw * jnp.ones_like(to),
             sw * jnp.ones_like(to), sw * jnp.ones_like(to),
             to + 0.005, to + 0.005, to]
        )
        pz = bz.bezier(az, phase)
        vz = bz.bezier_d(az, phase) * ds
        azz = bz.bezier_dd(az, phase) * ds * ds
        return (jnp.stack([px, py, pz]), jnp.stack([vx, vy, vz]),
                jnp.stack([axx, ayy, azz]))

    toe_hd, toe_dhd, toe_ddhd = jax.vmap(leg_traj)(jnp.arange(4))

    for i in range(4):
        rows = slice(6 + 3 * i, 9 + 3 * i)
        h0_mat = h0_mat.at[rows, :].set(swing[i] * toe_jac[i])
        dh0 = dh0.at[rows].set(swing[i] * toe_jdqd[i])
        hd = hd.at[rows].set(swing[i] * toe_hd[i])
        dhd = dhd.at[rows].set(swing[i] * toe_dhd[i])
        ddhd = ddhd.at[rows].set(swing[i] * toe_ddhd[i])

    out_mask = jnp.concatenate(
        [jnp.ones((6,), dtype), jnp.repeat(swing, 3)]
    )
    h0 = jnp.zeros((18,), dtype)
    h0 = h0.at[0:6].set(q[0:6])
    for i in range(4):
        h0 = h0.at[6 + 3 * i : 9 + 3 * i].set(swing[i] * toe_pos[i])
    dh0_vel = h0_mat @ qd

    y = (h0 - hd) * out_mask
    dy = (dh0_vel - dhd) * out_mask
    return VcOut(y, dy, h0_mat, dh0 * out_mask, hd, dhd, ddhd, out_mask)


def _clf_terms(ll_cfg: LowLevelConfig, y, dy, out_mask, dtype):
    """CLF from the closed-form Lyapunov solution
    (`src/LowLevelCtrl.cpp:171-225`)."""
    kp, kd = ll_cfg.kp, ll_cfg.kd
    p1 = (kd * kd + kp * kp + kp) / (2.0 * kp * kd)
    pd = 1.0 / (2.0 * kp)
    p2 = (kp + 1.0) / (2.0 * kd * kp)
    cc = 1.0 / (0.5 * (p1 + p2 + np.sqrt(p1 * p1 - 2 * p1 * p2 + p2 * p2 + 4 * pd * pd)))
    eps = ll_cfg.clf_eps
    # tuned P: top-left scaled by 1/eps twice, off-diagonals once
    v = (p1 / eps**2) * (y @ y) + 2.0 * (pd / eps) * (y @ dy) + p2 * (dy @ dy)
    lf_v = (
        -2.0 * kp * (pd / eps) * (y @ y)
        + 2.0 * ((p1 / eps**2) - kp * p2 - kd * (pd / eps)) * (y @ dy)
        + 2.0 * ((pd / eps) - kd * p2) * (dy @ dy)
    )
    lg_v = 2.0 * ((pd / eps) * y + p2 * dy)      # (18,) row over aux slots
    return v, lf_v, lg_v * out_mask, cc / eps


def calc_torque(
    ll_cfg: LowLevelConfig,
    qp_cfg: QpConfig,
    model: rbd.Model,
    q,
    qd,
    contact_ind,
    vc: VcOut,
    f_des,
    include_coriolis: bool = False,
):
    """Solve the LL QP and produce torques (`LowLevelCtrl::calcTorque`).

    f_des: (12,) desired per-leg GRF target (`vc->fDes`; the SRB force
    distribution of srbx.models.srb can supply it, else zeros).

    True-f32 matmuls: the QP data are products of dynamics quantities
    (Jc D^-1 Jc^T, ...); on TPU the default bf16-pass precision makes them
    inconsistent at the 1e-3 level and the IPM certificate becomes
    unreachable (measured: 57% vs 97% converged LL ticks in the f32
    whole-body loop). Forcing highest precision here covers the dynamics
    and assembly traced inside.
    """
    with jax.default_matmul_precision("highest"):
        return _calc_torque_impl(
            ll_cfg, qp_cfg, model, q, qd, contact_ind, vc, f_des,
            include_coriolis,
        )


class LLQpData(NamedTuple):
    """The LL QP operands (build stage output)."""

    P: jax.Array
    c: jax.Array
    A: jax.Array
    b: jax.Array
    G: jax.Array
    h: jax.Array


class LLCtx(NamedTuple):
    """Assembly context needed by the finish stage (post-QP torque math)."""

    d_inv: jax.Array       # (18, 18)
    b_mat: jax.Array       # (18, 12)
    h_bias: jax.Array      # (18,)
    jc_flat: jax.Array     # (12, 18) masked contact Jacobian
    toe_jac: jax.Array     # (4, 3, 18)
    toe_pos: jax.Array     # (4, 3)
    con: jax.Array         # (4,)
    v: jax.Array           # CLF terms (zeros when unused)
    lf_v: jax.Array
    lg_v: jax.Array
    c_eps: jax.Array


def ll_qp_build(
    ll_cfg: LowLevelConfig,
    model: rbd.Model,
    q,
    qd,
    contact_ind,
    vc: VcOut,
    f_des,
    include_coriolis: bool = False,
    d_inv=None,
):
    """Assemble the LL QP (the cost/constraints build of
    `LowLevelCtrl::calcTorque`, `src/LowLevelCtrl.cpp:115-225`) without
    solving it. Returns (LLQpData, LLCtx) so a caller can batch many lanes'
    solves through one fused kernel (srbx.ops.qp_fused) and then apply
    ll_qp_finish per lane. calc_torque == build -> qp.solve -> finish.

    d_inv: optional precomputed D(q)^-1. Batch callers compute it for ALL
    lanes through one lanes-last SPD kernel (srbx.ops.spd) — the per-lane
    jnp.linalg.inv here is a measured hot spot (scripts/bench_rbd_stages.py).

    Call under jax.default_matmul_precision("highest") on TPU (see
    calc_torque's docstring); vmapping this function preserves the context
    of the caller.
    """
    dtype = q.dtype
    nq = TOTAL_DOF
    h_bias = rbd.bias_forces(model, q, qd, include_coriolis=include_coriolis)
    if d_inv is None:
        d_inv = jnp.linalg.inv(rbd.mass_matrix(model, q))
    b_mat = jnp.zeros((nq, 12), dtype).at[6:, :].set(jnp.eye(12, dtype=dtype))

    sites_j = rbd.site_jacobians(model, q)
    toe_jac = sites_j[a1.TOE_SITES]                    # (4, 3, 18)
    toe_jdqd = rbd.site_jdot_qd(model, q, qd)[a1.TOE_SITES]

    con = contact_ind.astype(dtype)
    swing = 1.0 - con

    # Jc padded: per-leg rows masked by contact
    jc = toe_jac * con[:, None, None]                  # (4, 3, 18)
    jc_flat = jc.reshape(12, nq)
    djc_qd = (toe_jdqd * con[:, None]).reshape(12)

    kp, kd = ll_cfg.kp, ll_cfg.kd
    use_clf = 1 if ll_cfg.use_clf else 0

    # ------------------------------- cost --------------------------------- #
    p_diag = jnp.concatenate(
        [
            jnp.full((12,), ll_cfg.df_pen, dtype),
            jnp.full((12,), ll_cfg.tau_pen, dtype),
            jnp.full((18,), ll_cfg.aux_pen, dtype),
            jnp.full((1,), ll_cfg.clf_pen if use_clf else 1.0, dtype),
        ]
    )
    p_mat = jnp.diag(p_diag)
    c = jnp.zeros((N_DEC,), dtype)
    c = c.at[0:12].set(-ll_cfg.df_pen * f_des * jnp.repeat(con, 3))

    # ---------------------------- equalities ------------------------------ #
    a_eq = jnp.zeros((N_EQ, N_DEC), dtype)
    b_eq = jnp.zeros((N_EQ,), dtype)

    jc_dinv = jc_flat @ d_inv                          # (12, 18)
    a_eq = a_eq.at[0:12, 0:12].set(jc_dinv @ jc_flat.T)
    a_eq = a_eq.at[0:12, 12:24].set(jc_dinv @ b_mat)
    b_eq = b_eq.at[0:12].set(jc_dinv @ h_bias - djc_qd)

    h0_dinv = vc.h0_mat @ d_inv                        # (18, 18)
    a_eq = a_eq.at[12:30, 0:12].set(h0_dinv @ jc_flat.T)
    a_eq = a_eq.at[12:30, 12:24].set(h0_dinv @ b_mat)
    a_eq = a_eq.at[12:30, 24:42].set(jnp.diag(vc.out_mask))
    b_eq = b_eq.at[12:30].set(
        (-kp * vc.y - kd * vc.dy + h0_dinv @ h_bias - vc.dh0) * vc.out_mask
    )

    # --------------------------- inequalities ----------------------------- #
    g = jnp.zeros((N_INEQ, N_DEC), dtype)
    h = jnp.ones((N_INEQ,), dtype)
    mu = ll_cfg.mu
    gc = jnp.asarray(
        [
            [1.0, 0.0, -mu / np.sqrt(2)],
            [-1.0, 0.0, -mu / np.sqrt(2)],
            [0.0, 1.0, -mu / np.sqrt(2)],
            [0.0, -1.0, -mu / np.sqrt(2)],
            [0.0, 0.0, -1.0],
        ],
        dtype,
    )
    for i in range(4):
        rows = slice(5 * i, 5 * i + 5)
        g = g.at[rows, 3 * i : 3 * i + 3].set(con[i] * gc)
        h = h.at[rows].set(jnp.where(con[i] > 0, 0.0, 1.0))
    sat = jnp.tile(jnp.asarray(ll_cfg.sat, dtype), 4)
    g = g.at[20:32, 12:24].set(jnp.eye(12, dtype=dtype))
    g = g.at[32:44, 12:24].set(-jnp.eye(12, dtype=dtype))
    h = h.at[20:44].set(jnp.concatenate([sat, sat]))

    if use_clf:
        v, lf_v, lg_v, c_eps = _clf_terms(ll_cfg, vc.y, vc.dy, vc.out_mask, dtype)
        g = g.at[44, 24:42].set(lg_v)
        g = g.at[44, 42].set(-1.0)
        h = h.at[44].set(-lf_v - c_eps * v)
    else:
        v = jnp.zeros((), dtype)
        lf_v = jnp.zeros((), dtype)
        lg_v = jnp.zeros((18,), dtype)
        c_eps = jnp.zeros((), dtype)

    toe_pos = rbd.site_positions(model, q)[a1.TOE_SITES]
    data = LLQpData(p_mat, c, a_eq, b_eq, g, h)
    ctx = LLCtx(d_inv, b_mat, h_bias, jc_flat, toe_jac, toe_pos, con,
                v, lf_v, lg_v, c_eps)
    return data, ctx


def swing_delta_inv(ctx: LLCtx):
    """The swing operational-space inertia inverse Δ⁻¹ = Js D⁻¹ Jsᵀ (+ I on
    masked stance rows) whose inverse's diagonal sets the swing-PD gain
    (`src/LowLevelCtrl.cpp:73-93`). Exposed so batch callers can invert ALL
    lanes through one lanes-last SPD kernel (srbx.ops.spd) and pass `delta`
    into ll_qp_finish."""
    swing = 1.0 - ctx.con
    js_flat = (ctx.toe_jac * swing[:, None, None]).reshape(12, TOTAL_DOF)
    return js_flat @ ctx.d_inv @ js_flat.T + jnp.diag(jnp.repeat(ctx.con, 3))


def ll_qp_finish(
    ll_cfg: LowLevelConfig,
    ctx: LLCtx,
    q,
    qd,
    vc: VcOut,
    sol_x,
    converged,
    delta=None,
):
    """Post-solve torque math of `calcTorque`: parse GRF/tau, swing-leg PD
    add-on, joint-command integration (`src/LowLevelCtrl.cpp:40-111`).

    delta: optional precomputed inverse of swing_delta_inv(ctx)."""
    dtype = q.dtype
    nq = TOTAL_DOF
    con = ctx.con
    swing = 1.0 - con
    use_clf = 1 if ll_cfg.use_clf else 0
    d_inv, toe_jac, jc_flat = ctx.d_inv, ctx.toe_jac, ctx.jc_flat

    f_qp = sol_x[0:12] * jnp.repeat(con, 3)
    tau = sol_x[12:24]

    dv = (
        ctx.lf_v + ctx.c_eps * ctx.v + ctx.lg_v @ sol_x[24:42]
        if use_clf
        else jnp.zeros((), dtype)
    )

    # ------------------------- swing leg PD add-on ------------------------ #
    # (`src/LowLevelCtrl.cpp:73-93`): tau += Jsᵀ (Kp p_err + Kd v_err) with
    # Kp from the inverse operational-space inertia.
    js = toe_jac * swing[:, None, None]
    js_flat = js.reshape(12, nq)
    if delta is None:
        delta = jnp.linalg.inv(swing_delta_inv(ctx))
    wd, kd_sw = 40.0, 40.0
    toe_pos = ctx.toe_pos
    p_err = jnp.zeros((12,), dtype)
    v_err = jnp.zeros((12,), dtype)
    for i in range(4):
        rows = slice(6 + 3 * i, 9 + 3 * i)
        sl = slice(3 * i, 3 * i + 3)
        p_err = p_err.at[sl].set(swing[i] * (vc.hd[rows] - toe_pos[i]))
        v_err = v_err.at[sl].set(
            swing[i] * (vc.dhd[rows] - toe_jac[i] @ qd)
        )
    kp_sw = wd * wd * jnp.diag(jnp.diagonal(delta))
    tau_full = jnp.zeros((nq,), dtype).at[6:].set(tau)
    tau_full = tau_full + js_flat.T @ (kp_sw @ p_err + kd_sw * v_err)

    # --------------------- joint command integration ---------------------- #
    ddq = d_inv @ (
        ctx.b_mat @ tau_full[6:] + jc_flat.T @ (sol_x[0:12] * jnp.repeat(con, 3))
        - ctx.h_bias
    )
    hz = float(ll_cfg.ctrl_hz)
    dq_next = qd + ddq / hz
    q_next = q + dq_next / hz + 0.5 / (hz * hz) * ddq

    return LLOut(
        tau=tau_full[6:],
        grf=f_qp,
        y=vc.y,
        dy=vc.dy,
        ddq=ddq,
        q_next=q_next,
        dq_next=dq_next,
        v_lyap=ctx.v,
        dv_lyap=dv,
        qp_converged=converged,
    )


def _calc_torque_impl(
    ll_cfg: LowLevelConfig,
    qp_cfg: QpConfig,
    model: rbd.Model,
    q,
    qd,
    contact_ind,
    vc: VcOut,
    f_des,
    include_coriolis: bool = False,
):
    data, ctx = ll_qp_build(
        ll_cfg, model, q, qd, contact_ind, vc, f_des, include_coriolis
    )
    sol = qp.solve(data.P, data.c, data.A, data.b, data.G, data.h, qp_cfg)
    return ll_qp_finish(ll_cfg, ctx, q, qd, vc, sol.x, sol.converged)


N_DEC2 = 25
N_EQ2 = 12
N_INEQ2 = 45


def calc_torque_2(
    ll_cfg: LowLevelConfig,
    qp_cfg: QpConfig,
    model: rbd.Model,
    q,
    qd,
    contact_ind,
    vc: VcOut,
    f_des,
    include_coriolis: bool = False,
):
    """Alternative soft-output LL formulation
    (`LowLevelCtrl::calcTorque_2/cost_2/constraints_2`,
    `src/LowLevelCtrl.cpp:228-425`).

    Where `calc_torque` enforces the I/O-linearized output dynamics as
    equalities with explicit defect variables, this variant moves output
    tracking into the cost: auxPen * ||A x + C||^2 with
    A = H0 D^-1 [Jc^T, B] and C = -H0 D^-1 H + dH0 + kp y + kd dy
    (`cost_2`, `:327-341`), plus dfPen force tracking toward f_des and a
    tauPen torque penalty. The only equalities are the contact-consistency
    rows Jc D^-1 (Jc^T F + B tau) = Jc D^-1 H - dJc qd (`constraints_2`,
    `:371-373`); friction cones and torque bounds as in the primary path.
    The optional CLF row expresses the output-dynamics defect implicitly
    as A x + C (the same quantity the primary path's aux variables carry).

    Decision x = [F (12, padded) | tau (12) | clf defect] -> n = 25.
    """
    with jax.default_matmul_precision("highest"):
        return _calc_torque_2_impl(
            ll_cfg, qp_cfg, model, q, qd, contact_ind, vc, f_des,
            include_coriolis,
        )


class LLCtxR(NamedTuple):
    """Reduced-build context: primary ctx + the output map for recovering
    the eliminated aux variables (aux = -(a_out x + c_out))."""

    base: LLCtx
    a_out: jax.Array   # (18, 24)
    c_out: jax.Array   # (18,)


def ll_qp_build_reduced(
    ll_cfg: LowLevelConfig,
    model: rbd.Model,
    q,
    qd,
    contact_ind,
    vc: VcOut,
    f_des,
    include_coriolis: bool = False,
    d_inv=None,
):
    """Reduced LL QP build: the 18 aux output-defect variables eliminated in
    closed form through the output-dynamics equalities. Algebraically this
    IS the reference's alternative formulation (`cost_2/constraints_2`,
    `src/LowLevelCtrl.cpp:327-425`): substituting aux = r - A'x into the
    primary QP's auxPen*||aux||^2 yields exactly the auxPen*||A'x + C||^2
    soft-output cost. n 43->25, me 30->12, same eps-optimal solution set
    (objectives agree to ~1e-7 relative; the F-direction is soft at
    df_pen << aux_pen, so raw F can differ at the eps-optimality level).

    d_inv: optional precomputed D(q)^-1 (see ll_qp_build).

    Returns (LLQpData, LLCtxR); finish with ll_qp_finish_reduced, which
    recovers aux and applies the PRIMARY finish (swing-leg PD included).
    """
    dtype = q.dtype
    nq = TOTAL_DOF
    h_bias = rbd.bias_forces(model, q, qd, include_coriolis=include_coriolis)
    if d_inv is None:
        d_inv = jnp.linalg.inv(rbd.mass_matrix(model, q))
    b_mat = jnp.zeros((nq, 12), dtype).at[6:, :].set(jnp.eye(12, dtype=dtype))

    sites_j = rbd.site_jacobians(model, q)
    toe_jac = sites_j[a1.TOE_SITES]
    toe_jdqd = rbd.site_jdot_qd(model, q, qd)[a1.TOE_SITES]

    con = contact_ind.astype(dtype)
    jc = toe_jac * con[:, None, None]
    jc_flat = jc.reshape(12, nq)
    djc_qd = (toe_jdqd * con[:, None]).reshape(12)

    kp, kd = ll_cfg.kp, ll_cfg.kd
    use_clf = 1 if ll_cfg.use_clf else 0
    con_rep = jnp.repeat(con, 3)

    # ------------------------------- cost --------------------------------- #
    # A = H0 D^-1 [Jc^T | B] over the (F, tau) block; C = L + kp y + kd dy
    h0_dinv = vc.h0_mat @ d_inv                        # (18, 18)
    a_out = jnp.concatenate([h0_dinv @ jc_flat.T, h0_dinv @ b_mat], axis=1)
    a_out = a_out * vc.out_mask[:, None]               # (18, 24)
    c_out = (-h0_dinv @ h_bias + vc.dh0 + kp * vc.y + kd * vc.dy) * vc.out_mask

    p_mat = jnp.zeros((N_DEC2, N_DEC2), dtype)
    p_mat = p_mat.at[0:24, 0:24].set(ll_cfg.aux_pen * (a_out.T @ a_out))
    p_diag = jnp.concatenate(
        [
            jnp.full((12,), ll_cfg.df_pen, dtype),
            jnp.full((12,), ll_cfg.tau_pen, dtype),
            jnp.full((1,), ll_cfg.clf_pen if use_clf else 1.0, dtype),
        ]
    )
    p_mat = p_mat + jnp.diag(p_diag)
    c = jnp.zeros((N_DEC2,), dtype)
    c = c.at[0:12].set(-ll_cfg.df_pen * f_des * con_rep)
    c = c.at[0:24].add(ll_cfg.aux_pen * (a_out.T @ c_out))

    # ---------------------------- equalities ------------------------------ #
    jc_dinv = jc_flat @ d_inv
    a_eq = jnp.zeros((N_EQ2, N_DEC2), dtype)
    a_eq = a_eq.at[:, 0:12].set(jc_dinv @ jc_flat.T)
    a_eq = a_eq.at[:, 12:24].set(jc_dinv @ b_mat)
    b_eq = jc_dinv @ h_bias - djc_qd

    # --------------------------- inequalities ----------------------------- #
    g = jnp.zeros((N_INEQ2, N_DEC2), dtype)
    h = jnp.ones((N_INEQ2,), dtype)
    mu = ll_cfg.mu
    gc = jnp.asarray(
        [
            [1.0, 0.0, -mu / np.sqrt(2)],
            [-1.0, 0.0, -mu / np.sqrt(2)],
            [0.0, 1.0, -mu / np.sqrt(2)],
            [0.0, -1.0, -mu / np.sqrt(2)],
            [0.0, 0.0, -1.0],
        ],
        dtype,
    )
    for i in range(4):
        rows = slice(5 * i, 5 * i + 5)
        g = g.at[rows, 3 * i : 3 * i + 3].set(con[i] * gc)
        h = h.at[rows].set(jnp.where(con[i] > 0, 0.0, 1.0))
    sat = jnp.tile(jnp.asarray(ll_cfg.sat, dtype), 4)
    g = g.at[20:32, 12:24].set(jnp.eye(12, dtype=dtype))
    g = g.at[32:44, 12:24].set(-jnp.eye(12, dtype=dtype))
    h = h.at[20:44].set(jnp.concatenate([sat, sat]))

    if use_clf:
        v, lf_v, lg_v, c_eps = _clf_terms(ll_cfg, vc.y, vc.dy, vc.out_mask, dtype)
        # V' = LfV + cV + LgV . (A x + C) with the relaxation var's -1 column
        # Primary-convention CLF row: the primary path's constraint is
        # lg_v . aux - delta <= -LfV - cV with aux = r - A'x; substituting
        # aux = -(a_out x + c_out) gives -(lg_v a_out) x - delta <=
        # -LfV - cV + lg_v . c_out.
        g = g.at[44, 0:24].set(-(lg_v @ a_out))
        g = g.at[44, 24].set(-1.0)
        h = h.at[44].set(-lf_v - c_eps * v + lg_v @ c_out)
    else:
        v = jnp.zeros((), dtype)
        lf_v = jnp.zeros((), dtype)
        lg_v = jnp.zeros((18,), dtype)
        c_eps = jnp.zeros((), dtype)

    toe_pos = rbd.site_positions(model, q)[a1.TOE_SITES]
    data = LLQpData(p_mat, c, a_eq, b_eq, g, h)
    base = LLCtx(d_inv, b_mat, h_bias, jc_flat, toe_jac, toe_pos, con,
                 v, lf_v, lg_v, c_eps)
    return data, LLCtxR(base, a_out, c_out)


def expand_reduced_x(ctx: LLCtxR, sol_x):
    """Map a reduced solution [F, tau, clf] (25,) to the primary layout
    [F, tau, aux, clf] (43,): aux = -(a_out x + c_out)."""
    aux = -(ctx.a_out @ sol_x[0:24] + ctx.c_out)
    return jnp.concatenate([sol_x[0:24], aux, sol_x[24:25]])


def ll_qp_finish_reduced(
    ll_cfg: LowLevelConfig,
    ctx: LLCtxR,
    q,
    qd,
    vc: VcOut,
    sol_x,
    converged,
    delta=None,
):
    """Finish a reduced-build solve with the PRIMARY post-solve math
    (swing-leg PD add-on included)."""
    return ll_qp_finish(
        ll_cfg, ctx.base, q, qd, vc, expand_reduced_x(ctx, sol_x), converged,
        delta=delta,
    )


def _calc_torque_2_impl(
    ll_cfg: LowLevelConfig,
    qp_cfg: QpConfig,
    model: rbd.Model,
    q,
    qd,
    contact_ind,
    vc: VcOut,
    f_des,
    include_coriolis: bool = False,
):
    dtype = q.dtype
    nq = TOTAL_DOF
    data, ctx = ll_qp_build_reduced(
        ll_cfg, model, q, qd, contact_ind, vc, f_des, include_coriolis
    )
    sol = qp.solve(data.P, data.c, data.A, data.b, data.G, data.h, qp_cfg)
    con_rep = jnp.repeat(ctx.base.con, 3)
    use_clf = 1 if ll_cfg.use_clf else 0

    f_qp = sol.x[0:12] * con_rep
    tau = sol.x[12:24]

    dv = (
        ctx.base.lf_v + ctx.base.c_eps * ctx.base.v
        - ctx.base.lg_v @ (ctx.a_out @ sol.x[0:24] + ctx.c_out)
        if use_clf
        else jnp.zeros((), dtype)
    )

    tau_full = jnp.zeros((nq,), dtype).at[6:].set(tau)
    ddq = ctx.base.d_inv @ (
        ctx.base.b_mat @ tau - ctx.base.h_bias + ctx.base.jc_flat.T @ f_qp
    )
    hz = float(ll_cfg.ctrl_hz)
    dq_next = qd + ddq / hz
    q_next = q + dq_next / hz + 0.5 / (hz * hz) * ddq

    return LLOut(
        tau=tau_full[6:],
        grf=f_qp,
        y=vc.y,
        dy=vc.dy,
        ddq=ddq,
        q_next=q_next,
        dq_next=dq_next,
        v_lyap=ctx.base.v,
        dv_lyap=dv,
        qp_converged=sol.converged,
    )


def swing_inv_kin(model: rbd.Model, q, qd, vc: VcOut, contact_ind,
                  kp: float = 20.0, ctrl_hz: int = 1000):
    """Differential IK joint commands for the swing legs
    (`LowLevelCtrl::swingInvKin`, `src/LowLevelCtrl.cpp:451-489`): per swing
    leg, solve the 3x3 hip-relative toe Jacobian for joint velocities that
    realize the desired toe velocity plus a proportional pull (gain 20)
    toward the desired toe position, discounting base angular motion; then
    integrate one tick for the joint-position command (the on-robot joint
    PD setpoints). Masked fixed shapes: stance legs return the current
    (q, qd) unchanged.

    Returns (q_cmd (12,), dq_cmd (12,)) actuated-joint commands.
    """
    dtype = q.dtype
    sites_p = rbd.site_positions(model, q)
    sites_j = rbd.site_jacobians(model, q)
    toe_pos, hip_pos = sites_p[a1.TOE_SITES], sites_p[a1.HIP_SITES]
    toe_jac, hip_jac = sites_j[a1.TOE_SITES], sites_j[a1.HIP_SITES]
    swing = (1.0 - contact_ind.astype(dtype))

    dq_cmd = qd[6:]
    q_cmd = q[6:]
    for i in range(4):
        rows = slice(6 + 3 * i, 9 + 3 * i)      # this leg's rows in vc.hd
        jrel = toe_jac[i] - hip_jac[i]          # (3, 18)
        j_theta = jrel[:, 3:6]                  # base-orientation columns
        j_q = jrel[:, 6 + 3 * i : 9 + 3 * i]    # this leg's joint columns
        dxde_h = vc.dhd[rows] - hip_jac[i] @ qd
        xde_h = vc.hd[rows] - hip_pos[i]
        xe_h = toe_pos[i] - hip_pos[i]
        rhs = dxde_h + kp * (xde_h - xe_h) - j_theta @ qd[3:6]
        dq_i = jnp.linalg.solve(
            j_q + (1.0 - swing[i]) * jnp.eye(3, dtype=dtype), rhs
        )
        sl = slice(3 * i, 3 * i + 3)
        dq_cmd = dq_cmd.at[sl].set(
            swing[i] * dq_i + (1.0 - swing[i]) * dq_cmd[sl]
        )
        q_cmd = q_cmd.at[sl].set(
            q_cmd[sl] + swing[i] * dq_i / ctrl_hz
        )
    return q_cmd, dq_cmd
