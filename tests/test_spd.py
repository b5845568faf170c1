"""srbx.ops.spd (batched tiny-SPD solves/inverses) and their consumers:
the lanes-last Pallas kernel agrees with the plain-jax reference (interpret
mode on CPU), and the batched physics step / LL build-finish threading is
exactly the per-lane math."""

import jax
import jax.numpy as jnp
import numpy as np

from srbx.models import a1, rbd
from srbx.ops import spd
from srbx.sim import wholebody as wb

MODEL = a1.model()


def _spd_batch(rng, b, n, dtype=jnp.float64):
    a = rng.standard_normal((b, n, n))
    return jnp.asarray(a @ a.transpose(0, 2, 1) + 4 * np.eye(n), dtype)


def test_spd_solve_matches_xla():
    rng = np.random.default_rng(0)
    for b, n, r in [(5, 18, 0), (37, 12, 3), (256, 18, 18)]:
        d = _spd_batch(rng, b, n)
        rhs = jnp.asarray(rng.standard_normal((b, n) if r == 0 else (b, n, r)))
        x0 = spd.solve(d, rhs, backend="xla")
        x1 = spd.solve(d, rhs, backend="fused", tile=64, interpret=True)
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x0),
                                   rtol=1e-12, atol=1e-12)


def test_spd_inverse_matches_linalg_inv():
    rng = np.random.default_rng(1)
    for b, n in [(3, 12), (130, 18)]:
        d = _spd_batch(rng, b, n)
        i0 = jnp.linalg.inv(d)
        i1 = spd.inverse(d, backend="fused", tile=64, interpret=True)
        np.testing.assert_allclose(np.asarray(i1), np.asarray(i0),
                                   rtol=1e-9, atol=1e-11)


def test_step_batch_xla_equals_vmap_step():
    """wb.step_batch(backend='xla') must be vmap(wb.step) exactly."""
    cfg = wb.SimConfig()
    rng = np.random.default_rng(2)
    B = 4
    q0 = wb.default_crouch(MODEL)
    qs = jnp.tile(q0, (B, 1)) + 1e-3 * jnp.asarray(
        rng.standard_normal((B, 18)))
    qds = 0.1 * jnp.asarray(rng.standard_normal((B, 18)))
    taus = jnp.asarray(rng.standard_normal((B, 12)))
    states = wb.SimState(qs, qds)
    ref = jax.vmap(lambda s, t: wb.step(cfg, MODEL, s, t))(states, taus)
    out = wb.step_batch(cfg, MODEL, states, taus, backend="xla")
    # unrolled substeps + batched cho reassociate a few ops: agreement is
    # at machine epsilon, not bitwise
    np.testing.assert_allclose(np.asarray(out.q), np.asarray(ref.q),
                               rtol=1e-13, atol=1e-15)
    np.testing.assert_allclose(np.asarray(out.qd), np.asarray(ref.qd),
                               rtol=1e-13, atol=1e-12)


def test_forward_dynamics_batch_matches_vmap():
    """forward_dynamics_batch == vmap(forward_dynamics) on the xla route."""
    cfg = wb.SimConfig()
    rng = np.random.default_rng(3)
    B = 3
    q0 = wb.default_crouch(MODEL)
    qs = jnp.tile(q0, (B, 1)) + 1e-3 * jnp.asarray(
        rng.standard_normal((B, 18)))
    qds = 0.1 * jnp.asarray(rng.standard_normal((B, 18)))
    taus = jnp.asarray(rng.standard_normal((B, 12)))
    f_ext = jnp.zeros((B, len(MODEL.sites), 3)).at[:, 0:4].set(
        jax.vmap(lambda q, qd: wb.contact_forces(cfg, MODEL, q, qd))(qs, qds))
    tau_full = jnp.zeros((B, 18)).at[:, 6:].set(taus)
    fdb = rbd.forward_dynamics_batch(MODEL, qs, qds, tau_full,
                                     f_ext_sites=f_ext, backend="xla")
    fdl = jax.vmap(
        lambda q, qd, t, f: rbd.forward_dynamics(MODEL, q, qd, t,
                                                 f_ext_sites=f))(
        qs, qds, tau_full, f_ext)
    np.testing.assert_allclose(np.asarray(fdb), np.asarray(fdl),
                               rtol=1e-10, atol=1e-10)


def test_build_finish_with_precomputed_operands():
    """ll_qp_build(d_inv=...) and ll_qp_finish(delta=...) with the values
    they would otherwise compute are bit-identical to the defaults."""
    from srbx import lowlevel
    from srbx.config import LowLevelConfig, MotionConfig

    ll_cfg = LowLevelConfig()
    rng = np.random.default_rng(4)
    q = jnp.asarray(wb.default_crouch(MODEL))
    qd = 0.05 * jnp.asarray(rng.standard_normal(18))
    ci = jnp.asarray([1.0, 0.0, 0.0, 1.0])
    toe = rbd.site_positions(MODEL, q)[a1.TOE_SITES]
    hip = rbd.site_positions(MODEL, q)[a1.HIP_SITES]
    sj = rbd.site_jacobians(MODEL, q)
    jdqd = rbd.site_jdot_qd(MODEL, q, qd)
    mo = MotionConfig()
    traj = lowlevel.TrajIn(
        com_des=jnp.zeros(12).at[2].set(mo.stand_height),
        toe_init=toe.T, step_len=jnp.zeros(3),
        dom_ticks=jnp.asarray(172.0),
        toe_offset_z=jnp.asarray(mo.toe_offset_z))
    vc = lowlevel.virtual_constraints(
        ll_cfg, mo, q, qd, ci, jnp.asarray(0.4), traj, jnp.zeros(18),
        toe, sj[a1.TOE_SITES], jdqd[a1.TOE_SITES],
        hip, sj[a1.HIP_SITES], jdqd[a1.HIP_SITES])
    f_des = jnp.zeros(12)

    data0, ctx0 = lowlevel.ll_qp_build_reduced(ll_cfg, MODEL, q, qd, ci, vc,
                                               f_des)
    d_inv = jnp.linalg.inv(rbd.mass_matrix(MODEL, q))
    data1, ctx1 = lowlevel.ll_qp_build_reduced(ll_cfg, MODEL, q, qd, ci, vc,
                                               f_des, d_inv=d_inv)
    np.testing.assert_array_equal(np.asarray(data0.P), np.asarray(data1.P))
    np.testing.assert_array_equal(np.asarray(data0.c), np.asarray(data1.c))

    x = jnp.asarray(rng.standard_normal(data0.P.shape[0]))
    out0 = lowlevel.ll_qp_finish_reduced(ll_cfg, ctx0, q, qd, vc, x,
                                         jnp.asarray(True))
    delta = jnp.linalg.inv(lowlevel.swing_delta_inv(ctx0.base))
    out1 = lowlevel.ll_qp_finish_reduced(ll_cfg, ctx0, q, qd, vc, x,
                                         jnp.asarray(True), delta=delta)
    np.testing.assert_array_equal(np.asarray(out0.tau), np.asarray(out1.tau))
    np.testing.assert_array_equal(np.asarray(out0.ddq), np.asarray(out1.ddq))
