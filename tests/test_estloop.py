"""Estimation-in-the-loop tests: sensors → kinEst/KF/prob-contact → control.

The reference's deployable stack feeds the controller estimates, never
ground truth (`driver_scripts/qp_only_exp.cpp:256,484`, `src/kalman.cpp:39`).
These tests close srbx's estimation pipeline into the whole-body loops and
bound the estimate error while the controller stays converged.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srbx import refplan
from srbx.config import LowLevelConfig, MotionConfig, MpcConfig, QpConfig
from srbx.estimation import pipeline
from srbx.models import a1, rbd
from srbx.sim import closedloop, sensors
from srbx.sim import wholebody as wb

M = a1.model()
LL = LowLevelConfig()
MO = MotionConfig()
QP = QpConfig()
SIM = wb.SimConfig()


def _settled_stance():
    """A genuinely loaded quasi-static stance: run the STAND controller
    until the plant carries the weight (a raw crouch state has unloaded
    feet, so contact force — and hence the contact posterior — is zero)."""
    from srbx import agent as agent_mod
    from srbx.config import Gait

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
        return (wb.step(SIM, M, sim, ll_out.tau), ast), None

    (sim, ast), _ = jax.lax.scan(tick, (sim, ast), None, length=1000)
    return sim


def test_sensor_model_static_reads():
    """On a settled stance the IMU must read +g in the (near-level) body z
    axis, the gyro ~zero, encoders the joint angles, and the foot-force
    sum the robot weight — with biases zeroed so the identity is exact up
    to averaging noise."""
    cfg = sensors.SensorConfig(accel_bias=0.0, gyro_bias=0.0)
    sim = _settled_stance()
    sim = wb.SimState(sim.q, jnp.zeros(18))  # freeze residual motion
    st = sensors.init(cfg, jax.random.PRNGKey(0), sim.qd)
    # average many reads to suppress the per-sample noise
    def one(st, _):
        st, rd = sensors.read(cfg, SIM, M, st, sim)
        return st, rd
    st, rds = jax.lax.scan(one, st, None, length=512)
    accel = np.asarray(jnp.mean(rds.imu_accel, axis=0))
    gyro = np.asarray(jnp.mean(rds.gyro, axis=0))
    # specific force = Rᵀ g e_z; the stance is near-level
    assert abs(accel[2] - 9.81) < 0.1
    assert np.abs(accel[0:2]).max() < 0.15
    assert np.abs(gyro).max() < 0.01
    np.testing.assert_allclose(np.asarray(jnp.mean(rds.q_joints, axis=0)),
                               np.asarray(sim.q[6:]), atol=1e-3)
    # foot forces carry the robot weight
    f = np.asarray(jnp.mean(rds.foot_force, axis=0))
    np.testing.assert_allclose(f.sum(), 12.453 * 9.81, rtol=0.1)


def test_pipeline_static_estimate_converges():
    """Standing (settled, loaded stance, motion frozen), both estimator
    sources must converge to the true base state within mm / cm-per-s."""
    sim = _settled_stance()
    sim = wb.SimState(sim.q, jnp.zeros(18))
    q = sim.q
    for src in ("kinest", "kf"):
        cfg = pipeline.EstConfig(source=src)
        est = pipeline.init(cfg, M, sim, jax.random.PRNGKey(3))

        def one(est, _):
            est, out = pipeline.update(cfg, SIM, M, est, sim, 0.5)
            return est, (out.q_hat[0:3], out.qd_hat[0:3], out.p_contact)
        est, (pos, vel, pc) = jax.lax.scan(one, est, None, length=400)
        pos_err = np.abs(np.asarray(pos[-50:]) - np.asarray(q[0:3])).max()
        vel_err = np.abs(np.asarray(vel[-50:])).max()
        assert pos_err < 5e-3, f"{src}: static pos err {pos_err}"
        assert vel_err < 5e-2, f"{src}: static vel err {vel_err}"
        # all four feet loaded -> contact posterior ≈ 1
        assert np.asarray(pc[-1]).min() > 0.9


@pytest.mark.slow
def test_estimation_in_the_loop_trot():
    """Whole-body NMPC trot with the controller fed ONLY estimates
    (kinest odometry source): convergence and tracking must hold and the
    measured estimate-error budget must stay in the odometry regime."""
    traj = refplan.generate(
        refplan.two_agent_config(loop_size=20_000),
        jnp.asarray([0.0, 0.0, 0.0, -1.0]),
        jnp.asarray([[100.0] * 20, [100.0] * 20]),
    )
    B = 2
    loop = closedloop.LoopConfig(stand_ticks=600, n_domains=6,
                                 ticks_per_domain=172)
    pr = jnp.stack([traj.pr[0:2]] * B)
    prd = jnp.stack([traj.prd[0:2]] * B)
    a0 = jnp.asarray([[0.0, 0.0], [0.0, -1.0]])
    pobs = jnp.stack([jnp.asarray([[100.0] * 20, [100.0] * 20])] * B)
    res = jax.jit(lambda: closedloop.run_batch(
        MpcConfig(use_sqp=False), LL, MO, QP, SIM, loop, M, pr, prd, a0,
        pobs, backend="xla", est_cfg=pipeline.EstConfig(),
        est_key=jax.random.PRNGKey(7)))()
    q = np.asarray(res.sim.q)
    assert q[:, 0].min() > 0.10, f"no forward progress: {q[:, 0]}"
    assert np.abs(q[:, 2] - MO.stand_height).max() < 0.03
    assert np.abs(q[:, 3:6]).max() < 0.1
    assert np.asarray(res.qp_ok).min() > 0.98
    assert np.asarray(res.mpc_ok).min() == 1.0
    rmse = np.asarray(res.est_rmse)
    assert rmse[:, 0].max() < 0.01, f"pos RMSE {rmse[:, 0]}"
    assert rmse[:, 1].max() < 0.10, f"vel RMSE {rmse[:, 1]}"


@pytest.mark.slow
def test_estimation_aware_event_triggers():
    """Event-driven loop with estimation in the loop: the contact debouncer
    (and hence the per-lane domain trigger) runs on the MEASURED foot force
    and the controller consumes estimates — the reference's deployable
    event topology (`src/ContactEst.cpp:20-67` fed by hardware footForce,
    `src/LocoWrapper.cpp:193-200`). Domains must still cycle (triggers fire
    from sensed touchdowns), the plant must progress, and the estimate
    error budget must hold."""
    traj = refplan.generate(
        refplan.two_agent_config(loop_size=20_000),
        jnp.asarray([0.0, 0.0, 0.0, -1.0]),
        jnp.asarray([[100.0] * 20, [100.0] * 20]),
    )
    B = 2
    n_ticks = 700
    loop = closedloop.LoopConfig(stand_ticks=600, mpc_latency_ticks=5)
    pr = jnp.stack([traj.pr[0:2]] * B)
    prd = jnp.stack([traj.prd[0:2]] * B)
    a0 = jnp.asarray([[0.0, 0.0], [0.0, -1.0]])
    pobs = jnp.stack([jnp.asarray([[100.0] * 20, [100.0] * 20])] * B)
    res = jax.jit(lambda: closedloop.run_batch_event(
        MpcConfig(use_sqp=False), LL, MO, QP, SIM, loop, M, pr, prd, a0,
        pobs, n_ticks=n_ticks, backend="xla", mpc_period_ticks=20,
        est_cfg=pipeline.EstConfig(), est_key=jax.random.PRNGKey(7)))()
    q = np.asarray(res.sim.q)
    dom = np.asarray(res.domains)
    assert dom.min() >= 3, f"event triggers did not cycle domains: {dom}"
    assert q[:, 0].min() > 0.05, f"no forward progress: {q[:, 0]}"
    assert np.abs(q[:, 2] - MO.stand_height).max() < 0.03
    assert np.asarray(res.qp_ok).min() > 0.98
    rmse = np.asarray(res.est_rmse)
    assert rmse[:, 0].max() < 0.01, f"pos RMSE {rmse[:, 0]}"
    assert rmse[:, 1].max() < 0.10, f"vel RMSE {rmse[:, 1]}"


def test_ground_truth_path_unchanged():
    """est_cfg=None must keep the exact pre-estimation program: est_rmse is
    None and the loop consumes plant truth (smoke at tiny sizes)."""
    traj = refplan.generate(
        refplan.two_agent_config(loop_size=20_000),
        jnp.asarray([0.0, 0.0, 0.0, -1.0]),
        jnp.asarray([[100.0] * 20, [100.0] * 20]),
    )
    B = 2
    loop = closedloop.LoopConfig(stand_ticks=100, n_domains=1,
                                 ticks_per_domain=20)
    pr = jnp.stack([traj.pr[0:2]] * B)
    prd = jnp.stack([traj.prd[0:2]] * B)
    a0 = jnp.asarray([[0.0, 0.0], [0.0, -1.0]])
    pobs = jnp.stack([jnp.asarray([[100.0] * 20, [100.0] * 20])] * B)
    res = jax.jit(lambda: closedloop.run_batch(
        MpcConfig(use_sqp=False), LL, MO, QP, SIM, loop, M, pr, prd, a0,
        pobs, backend="xla"))()
    assert res.est_rmse is None


def test_team_batch_estimation_smoke():
    """run_team_batch(est_cfg=...): per-robot estimator lanes, HL/LL and
    the broadcast neighbor 4-state all consume estimates (the reference
    shares the kinEst-written store state, `qp_only_exp.cpp:256,484` +
    SET_DATA `:262-265`). Tiny shapes: shapes/arity/finiteness + the
    ground-truth path keeps the 4-tuple return."""
    S, A = 2, 2
    traj = refplan.generate(
        refplan.two_agent_config(loop_size=2_000),
        jnp.asarray([0.0, 0.0, 0.0, -1.0]), jnp.full((2, 20), 100.0))
    loop = closedloop.LoopConfig(stand_ticks=100, n_domains=1,
                                 ticks_per_domain=20)
    pr = jnp.broadcast_to(
        jnp.stack([traj.pr[0:2], traj.pr[2:4]]), (S, A, 2, traj.pr.shape[-1]))
    prd = jnp.broadcast_to(
        jnp.stack([traj.prd[0:2], traj.prd[2:4]]),
        (S, A, 2, traj.pr.shape[-1]))
    a0 = jnp.broadcast_to(jnp.asarray([[0.0, 0.0], [0.0, -1.0]]), (S, A, 2))
    pobs = jnp.full((S, 2, 20), 100.0)
    out = jax.jit(lambda: closedloop.run_team_batch(
        MpcConfig(use_sqp=False), LL, MO, QP, SIM, loop, M, pr, prd, a0,
        pobs, backend="xla", est_cfg=pipeline.EstConfig(),
        est_key=jax.random.PRNGKey(5)))()
    assert len(out) == 5
    sims, com_ends, margins, llok, est_rmse = out
    assert est_rmse.shape == (S, A, 2)
    r = np.asarray(est_rmse)
    assert np.isfinite(np.asarray(sims.q)).all()
    # short window right after stand-up: loose sanity bounds only
    assert r[:, :, 0].max() < 0.05 and r[:, :, 1].max() < 0.5

    out4 = jax.jit(lambda: closedloop.run_team_batch(
        MpcConfig(use_sqp=False), LL, MO, QP, SIM, loop, M, pr, prd, a0,
        pobs, backend="xla"))()
    assert len(out4) == 4
