"""Whole-body integration tests: LL QP, stand-up, and the full-fidelity
NMPC trot closed loop (config 1 of BASELINE.json at whole-body fidelity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srbx import lowlevel, motion, refplan
from srbx.config import Gait, LowLevelConfig, MotionConfig, MpcConfig, QpConfig
from srbx.models import a1, rbd
from srbx.sim import closedloop
from srbx.sim import wholebody as wb

M = a1.model()
LL = LowLevelConfig()
MO = MotionConfig()
QP = QpConfig()
SIM = wb.SimConfig()


def test_ll_qp_static_stance_supports_weight():
    """All-stance LL QP at rest: vertical GRFs must sum to the robot weight
    and every QP must converge."""
    q = wb.default_crouch(M)
    q = q.at[2].add(0.0)
    qd = jnp.zeros(18)
    ci = jnp.ones(4)
    com_des = jnp.zeros(12).at[0:3].set(q[0:3])
    traj = lowlevel.TrajIn(com_des, rbd.site_positions(M, q)[a1.TOE_SITES].T,
                           jnp.zeros(3), jnp.asarray(1000.0), jnp.asarray(0.01))
    sites = rbd.site_positions(M, q)
    sj = rbd.site_jacobians(M, q)
    jd = rbd.site_jdot_qd(M, q, qd)
    vc = lowlevel.virtual_constraints(
        LL, MO, q, qd, ci, 0.0, traj, jnp.zeros(18),
        sites[a1.TOE_SITES], sj[a1.TOE_SITES], jd[a1.TOE_SITES],
        sites[a1.HIP_SITES], sj[a1.HIP_SITES], jd[a1.HIP_SITES])
    out = lowlevel.calc_torque(LL, QP, M, q, qd, ci, vc, jnp.zeros(12))
    assert bool(out.qp_converged)
    fz = np.asarray(out.grf).reshape(4, 3)[:, 2]
    assert fz.min() > 0
    np.testing.assert_allclose(fz.sum(), 12.453 * 9.81, rtol=0.05)


def test_stand_up_reaches_height():
    """Crouch -> stand under the STAND gait reaches the configured height."""
    from srbx import agent as agent_mod

    q0 = wb.default_crouch(M)
    sim = wb.SimState(q0, jnp.zeros(18))
    ast = agent_mod.init(MO, M, q0)
    ast = ast._replace(planner=ast.planner._replace(
        stand_from=q0[0:3], dom_ticks=jnp.asarray(800.0)))

    @jax.jit
    def tick(carry, _):
        sim, ast = carry
        force = wb.foot_force_measurement(SIM, M, sim)
        ll_out, ast, _ = agent_mod.tick(LL, MO, QP, M, Gait.STAND, ast,
                                        sim.q, sim.qd, force)
        sim = wb.step(SIM, M, sim, ll_out.tau)
        return (sim, ast), ll_out.qp_converged

    (sim, ast), conv = jax.lax.scan(tick, (sim, ast), None, length=1000)
    assert float(jnp.mean(conv.astype(jnp.float64))) > 0.99
    assert abs(float(sim.q[2]) - MO.stand_height) < 0.01
    assert np.abs(np.asarray(sim.q[3:6])).max() < 0.02


@pytest.mark.slow
def test_full_fidelity_trot_tracks_reference():
    """Stand-up + 10 NMPC trot domains through whole-body physics: forward
    progress tracking the APF reference, level posture, bounded torques."""
    traj = refplan.generate(
        refplan.two_agent_config(loop_size=20_000),
        jnp.asarray([0.0, 0.0, 0.0, -1.0]),
        jnp.asarray([[100.0] * 20, [100.0] * 20]),
    )
    res = jax.jit(lambda: closedloop.run(
        MpcConfig(use_sqp=False), LL, MO, QP, SIM,
        closedloop.LoopConfig(stand_ticks=800, n_domains=10), M,
        traj.pr[0:2], traj.prd[0:2],
        jnp.asarray([0.0, 0.0]), jnp.asarray([[100.0] * 20, [100.0] * 20]),
    ))()
    q = np.asarray(res.sim.q)
    ref_x = float(traj.pr[0, 40])
    assert q[0] > 0.15, f"no forward progress: x={q[0]}"
    assert abs(q[0] - ref_x) < 0.15, f"x tracking off: {q[0]} vs ref {ref_x}"
    assert abs(q[1]) < 0.1, f"lateral drift: y={q[1]}"
    assert abs(q[2] - MO.stand_height) < 0.02
    assert np.abs(q[3:6]).max() < 0.1
    assert float(res.qp_ok) > 0.98
    assert float(res.mpc_ok) == 1.0
    tau_max = float(res.tau_hist[:, 0].max())
    assert tau_max <= 50.0 + 1e-6


def test_contact_estimator_debounce_and_latch():
    from srbx.estimation import contact

    st = contact.init()
    st = contact.set_des_domain(st, jnp.asarray([0, 1, 1, 0]))
    assert int(st.cnt) == 2
    # leg 0 airborne then touches down before phase gate: no latch
    for _ in range(12):
        st = contact.update(st, jnp.asarray([0.0, 100.0, 100.0, 0.0]), 0.3, 30.0)
    assert not bool(st.change_domain)
    assert int(st.ind[0]) == 0
    # touchdown after phase 0.7 on both swing legs -> latch + domain change
    for _ in range(12):
        st = contact.update(st, jnp.asarray([100.0] * 4), 0.8, 30.0)
    assert bool(st.change_domain)
    assert int(st.cnt) == 4


def test_swing_inv_kin_tracks_desired_toe_velocity():
    """swing_inv_kin (`src/LowLevelCtrl.cpp:451-489`): the commanded joint
    velocities realize the desired hip-relative toe velocity + position
    pull for swing legs, and leave stance joints untouched."""
    from srbx import lowlevel as llmod

    MODEL = a1.model()
    q = wb.default_crouch(MODEL).at[2].set(0.28)
    qd = jnp.zeros(18).at[0].set(0.1).at[4].set(0.05)
    ci = jnp.asarray([1.0, 0.0, 0.0, 1.0])   # FL, RR swing

    hd = jnp.zeros(18)
    dhd = jnp.zeros(18)
    toe_pos = rbd.site_positions(MODEL, q)[a1.TOE_SITES]
    for i in range(4):
        rows = slice(6 + 3 * i, 9 + 3 * i)
        hd = hd.at[rows].set(toe_pos[i] + jnp.asarray([0.02, 0.0, 0.03]))
        dhd = dhd.at[rows].set(jnp.asarray([0.1, 0.0, 0.2]))
    vc = llmod.VcOut(y=jnp.zeros(18), dy=jnp.zeros(18),
                     h0_mat=jnp.zeros((18, 18)), dh0=jnp.zeros(18),
                     hd=hd, dhd=dhd, ddhd=jnp.zeros(18),
                     out_mask=jnp.ones(18))

    q_cmd, dq_cmd = llmod.swing_inv_kin(MODEL, q, qd, vc, ci)
    # stance joints unchanged
    np.testing.assert_allclose(np.asarray(dq_cmd[0:3]), np.asarray(qd[6:9]))
    np.testing.assert_allclose(np.asarray(q_cmd[9:12]), np.asarray(q[15:18]))

    # swing legs: J_rel qdot_cmd == dxde_h + 20 (xde - xe) - Jtheta w
    sites_j = rbd.site_jacobians(MODEL, q)
    hip_jac = sites_j[a1.HIP_SITES]
    hip_pos = rbd.site_positions(MODEL, q)[a1.HIP_SITES]
    for i in (1, 2):
        rows = slice(6 + 3 * i, 9 + 3 * i)
        jrel = sites_j[a1.TOE_SITES][i] - hip_jac[i]
        qd_full = qd.at[6 + 3 * i : 9 + 3 * i].set(dq_cmd[3 * i : 3 * i + 3])
        lhs = jrel[:, 6 + 3 * i : 9 + 3 * i] @ dq_cmd[3 * i : 3 * i + 3]
        rhs = (dhd[rows] - hip_jac[i] @ qd
               + 20.0 * ((hd[rows] - hip_pos[i]) - (toe_pos[i] - hip_pos[i]))
               - jrel[:, 3:6] @ qd[3:6])
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                                   atol=1e-9)


@pytest.mark.slow
def test_run_batch_matches_vmapped_run():
    """closedloop.run_batch (fused-path restructure: one batched LL-QP per
    tick across lanes) must reproduce vmap(closedloop.run) at the xla
    backend."""
    traj = refplan.generate(
        refplan.two_agent_config(loop_size=20_000),
        jnp.asarray([0.0, 0.0, 0.0, -1.0]),
        jnp.asarray([[100.0] * 20, [100.0] * 20]),
    )
    B = 2
    loop = closedloop.LoopConfig(stand_ticks=200, n_domains=2,
                                 ticks_per_domain=40)
    mpc_cfg = MpcConfig(use_sqp=False)
    pr = jnp.stack([traj.pr[0:2]] * B)
    prd = jnp.stack([traj.prd[0:2]] * B)
    a0 = jnp.asarray([[0.0, 0.0], [0.0, -1.0]])
    pobs = jnp.stack([jnp.asarray([[100.0] * 20, [100.0] * 20])] * B)

    ref = jax.jit(jax.vmap(lambda p, pd, a, po: closedloop.run(
        mpc_cfg, LL, MO, QP, SIM, loop, M, p, pd, a, po)))(pr, prd, a0, pobs)
    bat = jax.jit(lambda: closedloop.run_batch(
        mpc_cfg, LL, MO, QP, SIM, loop, M, pr, prd, a0, pobs,
        backend="xla"))()
    np.testing.assert_allclose(
        np.asarray(bat.sim.q), np.asarray(ref.sim.q), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(bat.com_hist), np.asarray(ref.com_hist), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(bat.qp_ok), np.asarray(ref.qp_ok), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(bat.mpc_ok), np.asarray(ref.mpc_ok), atol=1e-12
    )


@pytest.mark.slow
def test_velocity_gait_walk_and_pace():
    """MPC-less velocity-commanded gaits through the full plant
    (`MotionPlanner` WALK/PACE modes): WALK advances with the ramped
    forward command at held height; PACE cycles stably (the reference's
    standalone PACE position reference is commented out — parity is
    stability + convergence, not tracking)."""
    import dataclasses

    cl = closedloop

    dtype = jnp.float64
    model = a1.model()
    B = 2
    loop = cl.LoopConfig(stand_ticks=400)
    qp_cfg = QpConfig(abstol=2e-3, reltol=1e-4, reg_primal=1e-6,
                      reg_dual=1e-6, max_iters=12)
    mo = dataclasses.replace(MotionConfig(), fwd_speed=0.15)
    a0 = jnp.zeros((B, 2), dtype)

    walk = jax.jit(lambda s: cl.run_velocity_gait(
        Gait.WALK, LowLevelConfig(), mo, qp_cfg, wb.SimConfig(), loop,
        model, s, n_ticks=2000, dtype=dtype, backend="xla",
        ll_reduced=True))(a0)
    assert int(walk.domains.min()) >= 8          # 0.2 s walk domains cycled
    assert float(walk.qp_ok.min()) > 0.95
    assert float(np.asarray(walk.com_hist)[:, :, 2].min()) > 0.25
    assert float(np.asarray(walk.sim.q)[:, 0].min()) > 0.05  # walked forward

    pace = jax.jit(lambda s: cl.run_velocity_gait(
        Gait.PACE, LowLevelConfig(), mo, qp_cfg, wb.SimConfig(), loop,
        model, s, n_ticks=1200, dtype=dtype, backend="xla",
        ll_reduced=True))(a0)
    assert int(pace.domains.min()) >= 8          # 0.1 s pace domains cycled
    assert float(pace.qp_ok.min()) > 0.9
    assert float(np.asarray(pace.com_hist)[:, :, 2].min()) > 0.25


@pytest.mark.slow
def test_inplace_gaits_and_pose_through_plant():
    """INPLACE_TROT / INPLACE_WALK / TAP cycle their stance tables in place
    (bounded drift, held height); POSE oscillates the commanded axis about
    the locked stand pose (`src/MotionPlanner.cpp:99-187`)."""
    import dataclasses

    from srbx.config import Gait
    cl = closedloop

    dtype = jnp.float64
    model = a1.model()
    loop = cl.LoopConfig(stand_ticks=400)
    qp_cfg = QpConfig(abstol=2e-3, reltol=1e-4, reg_primal=1e-6,
                      reg_dual=1e-6, max_iters=12)
    a0 = jnp.zeros((1, 2), dtype)

    for gait, nt, min_dom in ((Gait.INPLACE_TROT, 1000, 5),
                              (Gait.INPLACE_WALK, 1300, 4),
                              (Gait.TAP, 1800, 1)):
        res = jax.jit(lambda s, g=gait, n=nt: cl.run_velocity_gait(
            g, LowLevelConfig(), MotionConfig(), qp_cfg, wb.SimConfig(),
            loop, model, s, n_ticks=n, dtype=dtype, backend="xla",
            ll_reduced=True))(a0)
        ch = np.asarray(res.com_hist)
        assert int(res.domains.min()) >= min_dom, Gait(gait).name
        assert float(res.qp_ok.min()) > 0.95, Gait(gait).name
        assert ch[:, :, 2].min() > 0.25, Gait(gait).name
        assert np.abs(np.asarray(res.sim.q)[:, 0:2]).max() < 0.05, \
            Gait(gait).name

    mo = dataclasses.replace(MotionConfig(), pose_type=0)
    res = jax.jit(lambda s: cl.run_velocity_gait(
        Gait.POSE, LowLevelConfig(), mo, qp_cfg, wb.SimConfig(), loop,
        model, s, n_ticks=2500, dtype=dtype, backend="xla",
        ll_reduced=True))(a0)
    ch = np.asarray(res.com_hist)
    amp = (ch[0, 400:, 0].max() - ch[0, 400:, 0].min()) / 2
    assert 0.02 < amp < 0.06          # commanded x amplitude 0.04
    assert float(res.qp_ok.min()) > 0.95
    # POSE never cycles domains beyond the forced kick-off at tick 0
    assert int(res.domains.max()) <= 1
