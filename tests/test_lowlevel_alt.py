"""Alternative soft-output LL formulation (`LowLevelCtrl::calcTorque_2`,
`src/LowLevelCtrl.cpp:228-425`)."""

import jax.numpy as jnp
import numpy as np
import pytest

from srbx import lowlevel
from srbx.config import LowLevelConfig, MotionConfig, QpConfig
from srbx.models import a1, rbd
from srbx.sim import wholebody as wb

M = a1.model()
MO = MotionConfig()
QP = QpConfig()


def _vc_for(q, qd, ci, ll_cfg, com_offset=0.0):
    com_des = jnp.zeros(12).at[0:3].set(q[0:3]).at[0].add(com_offset)
    traj = lowlevel.TrajIn(
        com_des, rbd.site_positions(M, q)[a1.TOE_SITES].T,
        jnp.zeros(3), jnp.asarray(1000.0), jnp.asarray(0.01),
    )
    sites = rbd.site_positions(M, q)
    sj = rbd.site_jacobians(M, q)
    jd = rbd.site_jdot_qd(M, q, qd)
    return lowlevel.virtual_constraints(
        ll_cfg, MO, q, qd, ci, 0.5, traj, jnp.zeros(18),
        sites[a1.TOE_SITES], sj[a1.TOE_SITES], jd[a1.TOE_SITES],
        sites[a1.HIP_SITES], sj[a1.HIP_SITES], jd[a1.HIP_SITES],
    )


def test_alt_formulation_matches_primary_at_high_aux_pen():
    """As auxPen grows, the soft output penalty approaches the primary
    path's hard output-dynamics equalities: torques must agree."""
    q = wb.default_crouch(M)
    qd = jnp.zeros(18)
    ci = jnp.ones(4)
    cfg_hard = LowLevelConfig(use_clf=False)
    cfg_soft = LowLevelConfig(use_clf=False, aux_pen=1e6)
    vc = _vc_for(q, qd, ci, cfg_hard, com_offset=0.02)
    out1 = lowlevel.calc_torque(cfg_hard, QP, M, q, qd, ci, vc, jnp.zeros(12))
    out2 = lowlevel.calc_torque_2(cfg_soft, QP, M, q, qd, ci, vc, jnp.zeros(12))
    assert bool(out1.qp_converged) and bool(out2.qp_converged)
    # swing PD add-on only exists in the primary path; at full stance the
    # torque laws coincide
    np.testing.assert_allclose(
        np.asarray(out2.tau), np.asarray(out1.tau), atol=0.5
    )


def test_alt_formulation_respects_bounds_and_friction():
    q = wb.default_crouch(M)
    qd = jnp.zeros(18)
    ci = jnp.asarray([1.0, 0.0, 0.0, 1.0])       # diagonal stance pair
    cfg = LowLevelConfig(use_clf=False)
    vc = _vc_for(q, qd, ci, cfg, com_offset=0.01)
    out = lowlevel.calc_torque_2(cfg, QP, M, q, qd, ci, vc, jnp.zeros(12))
    assert bool(out.qp_converged)
    tau = np.asarray(out.tau)
    sat = np.tile(np.asarray(cfg.sat), 4)
    assert (np.abs(tau) <= sat + 1e-5).all()
    grf = np.asarray(out.grf).reshape(4, 3)
    mu = cfg.mu
    for i, c in enumerate(np.asarray(ci)):
        if c > 0:
            fx, fy, fz = grf[i]
            assert fz >= -1e-6
            assert abs(fx) <= mu / np.sqrt(2) * fz + 1e-4
            assert abs(fy) <= mu / np.sqrt(2) * fz + 1e-4
        else:
            np.testing.assert_allclose(grf[i], 0.0, atol=1e-12)


def test_alt_formulation_clf_row():
    """CLF variant: with tracking error the certified dV must be held below
    a fraction of V (the defect is penalized, as in the primary path)."""
    cfg = LowLevelConfig(use_clf=True, aux_pen=1e5, clf_pen=1e6)
    q = wb.default_crouch(M)
    qd = jnp.zeros(18)
    ci = jnp.ones(4)
    vc = _vc_for(q, qd, ci, cfg, com_offset=0.02)
    out = lowlevel.calc_torque_2(cfg, QP, M, q, qd, ci, vc, jnp.zeros(12))
    assert bool(out.qp_converged)
    assert float(out.v_lyap) > 0.0
    # The soft formulation trades the CLF decrease against the auxPen
    # tracking objective, so its penalized relaxation is looser than the
    # primary path's — but dV must still be held well below V's scale.
    assert float(out.dv_lyap) < 0.2 * float(out.v_lyap)


def test_reduced_build_is_exact_condensation():
    """ll_qp_build_reduced is the aux-eliminated primary QP: the mapped
    solution satisfies the primary equalities and reaches the same
    objective (eps-optimality)."""
    from srbx.ops import qp as qp_mod

    for use_clf in (False, True):
        for ci_v in ([1.0, 1.0, 1.0, 1.0], [1.0, 0.0, 0.0, 1.0]):
            cfg = LowLevelConfig(use_clf=use_clf)
            q = wb.default_crouch(M)
            qd = jnp.zeros(18)
            ci = jnp.asarray(ci_v)
            vc = _vc_for(q, qd, ci, cfg, com_offset=0.02)
            fd = jnp.zeros(12)
            data1, _ = lowlevel.ll_qp_build(cfg, M, q, qd, ci, vc, fd)
            s1 = qp_mod.solve(data1.P, data1.c, data1.A, data1.b,
                              data1.G, data1.h, QP)
            data2, ctx2 = lowlevel.ll_qp_build_reduced(cfg, M, q, qd, ci, vc, fd)
            s2 = qp_mod.solve(data2.P, data2.c, data2.A, data2.b,
                              data2.G, data2.h, QP)
            assert bool(s1.converged) and bool(s2.converged)
            x2m = np.asarray(lowlevel.expand_reduced_x(ctx2, s2.x))
            P, c = np.asarray(data1.P), np.asarray(data1.c)
            obj = lambda x: 0.5 * x @ P @ x + c @ x
            o1, o2 = obj(np.asarray(s1.x)), obj(x2m)
            # mapped solution satisfies the primary equalities
            r = np.abs(np.asarray(data1.A) @ x2m - np.asarray(data1.b)).max()
            assert r < 1e-6, r
            # same objective to eps-optimality
            denom = max(1.0, abs(o1))
            assert abs(o1 - o2) / denom < 1e-5, (o1, o2)


@pytest.mark.slow
def test_run_batch_reduced_closed_loop_equivalent():
    """The reduced LL build in the batched loop must control the plant the
    same way (torques on the determined directions match; only the soft
    F-nullspace differs at eps-optimality)."""
    import jax as _jax
    from srbx import refplan
    from srbx.config import MpcConfig
    from srbx.sim import closedloop

    traj = refplan.generate(
        refplan.two_agent_config(loop_size=8_000),
        jnp.asarray([0.0, 0.0, 0.0, -1.0]),
        jnp.asarray([[100.0] * 20, [100.0] * 20]),
    )
    B = 2
    loop = closedloop.LoopConfig(stand_ticks=150, n_domains=1,
                                 ticks_per_domain=30)
    pr = jnp.stack([traj.pr[0:2]] * B)
    prd = jnp.stack([traj.prd[0:2]] * B)
    a0 = jnp.asarray([[0.0, 0.0], [0.0, -1.0]])
    pobs = jnp.stack([jnp.asarray([[100.0] * 20, [100.0] * 20])] * B)
    args = (MpcConfig(use_sqp=False), LowLevelConfig(), MotionConfig(), QP,
            wb.SimConfig(), loop, M, pr, prd, a0, pobs)
    full = _jax.jit(lambda: closedloop.run_batch(*args, backend="xla"))()
    red = _jax.jit(lambda: closedloop.run_batch(*args, backend="xla",
                                                ll_reduced=True))()
    assert float(red.qp_ok.min()) > 0.95
    np.testing.assert_allclose(
        np.asarray(red.sim.q), np.asarray(full.sim.q), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(red.com_hist), np.asarray(full.com_hist), atol=2e-3
    )
