"""CLF-constrained low-level QP (the useCLF=1 path of the reference)."""

import jax.numpy as jnp
import numpy as np

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


def test_clf_qp_solves_and_enforces_decrease():
    """With a tracking error, the CLF row must certify dV <= -c/eps V (up to
    the penalized defect)."""
    ll_cfg = LowLevelConfig(use_clf=True)
    q = wb.default_crouch(M)
    qd = jnp.zeros(18)
    ci = jnp.ones(4)
    vc = _vc_for(q, qd, ci, ll_cfg, com_offset=0.02)   # 2 cm tracking error
    out = lowlevel.calc_torque(ll_cfg, QP, M, q, qd, ci, vc, jnp.zeros(12))
    assert bool(out.qp_converged)
    assert float(out.v_lyap) > 0.0
    # dV should be (near-)negative: the defect variable is heavily penalized
    assert float(out.dv_lyap) < 0.1 * float(out.v_lyap)


def test_clf_matches_no_clf_when_error_zero():
    """At zero output error the CLF constraint is inactive; torques match the
    plain controller closely."""
    q = wb.default_crouch(M)
    qd = jnp.zeros(18)
    ci = jnp.ones(4)
    out_clf = lowlevel.calc_torque(
        LowLevelConfig(use_clf=True), QP, M, q, qd, ci,
        _vc_for(q, qd, ci, LowLevelConfig(use_clf=True)), jnp.zeros(12),
    )
    out_plain = lowlevel.calc_torque(
        LowLevelConfig(use_clf=False), QP, M, q, qd, ci,
        _vc_for(q, qd, ci, LowLevelConfig(use_clf=False)), jnp.zeros(12),
    )
    assert bool(out_clf.qp_converged) and bool(out_plain.qp_converged)
    np.testing.assert_allclose(
        np.asarray(out_clf.tau), np.asarray(out_plain.tau), atol=0.5
    )
