"""SRB-MPC -> whole-body bridge (srbx.sim.srb_wholebody): the FastMPC
control stack (`src/fast_MPC.cpp:1038-1071` compute; force mapping per
`src/forceUpdate.cpp:3-70`)."""

import jax.numpy as jnp
import numpy as np
import pytest

from srbx import mpc_srb
from srbx.config import QpConfig
from srbx.models import a1, rbd
from srbx.sim import srb_wholebody as sw
from srbx.sim import wholebody as wb

MODEL = a1.model()


def test_torque_mapping_stance_and_swing():
    q = wb.default_crouch(MODEL)
    qd = jnp.zeros(18)
    forces = jnp.zeros((4, 3)).at[:, 2].set(30.0)
    ci = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    q_ref = q[6:] + 0.1
    tau = sw.torques_from_forces(MODEL, q, forces, ci, q_ref, qd,
                                 kp=25.0, kd=1.0)
    jac = rbd.site_jacobians(MODEL, q)[a1.TOE_SITES]
    # stance legs: exactly -J^T f on their joint rows
    expect = -jnp.einsum("lin,li->n", jac[0:2], forces[0:2])[6:12]
    np.testing.assert_allclose(np.asarray(tau[0:6]), np.asarray(expect),
                               atol=1e-12)
    # swing legs: pure PD toward q_ref
    np.testing.assert_allclose(np.asarray(tau[6:]), 25.0 * 0.1 * np.ones(6),
                               atol=1e-9)


def test_pack_from_wholebody_shapes():
    q = wb.default_crouch(MODEL)
    x = sw.pack_from_wholebody(MODEL, q, jnp.zeros(18))
    assert x.shape == (12,)
    np.testing.assert_allclose(np.asarray(x[0:3]), np.asarray(q[0:3]))


@pytest.mark.slow
def test_standing_balance_rises_to_setpoint():
    cfg = mpc_srb.SrbMpcConfig()
    qp = QpConfig(abstol=1e-4, reltol=1e-4, reg_primal=1e-6, reg_dual=1e-6,
                  max_iters=15)
    p_des = jnp.asarray([0.0, 0.0, 0.25])
    sim, hist = sw.run_standing(cfg, qp, wb.SimConfig(), MODEL, p_des,
                                n_mpc_cycles=25)
    h = np.asarray(hist)
    assert h[-1, 2] > h[0, 2] + 0.05          # rose from the crouch
    assert abs(float(sim.q[2]) - 0.25) < 0.02
    assert float(jnp.abs(sim.q[3:5]).max()) < 0.05   # level attitude
    assert float(jnp.linalg.norm(sim.qd[0:3])) < 0.1


@pytest.mark.slow
def test_standing_balance_survives_push():
    cfg = mpc_srb.SrbMpcConfig()
    qp = QpConfig(abstol=1e-4, reltol=1e-4, reg_primal=1e-6, reg_dual=1e-6,
                  max_iters=15)
    p_des = jnp.asarray([0.0, 0.0, 0.25])
    sim, hist = sw.run_standing(
        cfg, qp, wb.SimConfig(), MODEL, p_des, n_mpc_cycles=30,
        push=jnp.asarray([25.0, 0.0, 0.0]), push_cycle=20,
    )
    assert abs(float(sim.q[2]) - 0.25) < 0.03
    assert float(jnp.abs(sim.q[3:5]).max()) < 0.08
    assert np.isfinite(np.asarray(sim.q)).all()
