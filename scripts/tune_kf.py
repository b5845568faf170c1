"""KF noise tuning + analysis vs kinest, on a recorded trot stream.

VERDICT r2 item 4 ("rehabilitate the KF"). Context established against the
reference first:

- The reference's flagship multi-agent drivers never call the KF —
  `driver_scripts/qp_only_exp.cpp:256,484` run `kinEst0/1`, not
  `KF::updateKalman`.
- The single-agent hardware drivers DO call it (`src/A1_Exp.cpp:251`,
  `src/A1_Exp_w_HL.cpp:297`, `src/trot_ctrl.cpp:253`) but DISCARD the
  estimate: the lines feeding `comPosVel` into q/dq are commented out with
  "This part is temporary until the kalman filter is done"
  (`src/A1_Exp.cpp:254-264`) and the controller runs on kinematic odometry
  (the same scheme kinEst implements). The reference never closes a loop
  on the KF anywhere.
- `srbx/estimation/kalman.py` matches `src/kalman.cpp:39-127` exactly in
  structure (A/B/C, contact-gated Q with (sd*dt)^2 diagonals, R=I order),
  so round 2's 32 mm / 0.44 m/s in-loop RMSE is a property of the
  reference's NOISE VALUES (accel sd 2000 m/s^2 -> Q_vel = 4 m^2/s^2 PER
  1 ms TICK; R = 1 m^2 against mm-accurate kinematics), not an
  implementation divergence.

Method: record ONE ground-truth trot (NMPC + 1 kHz LL + whole-body plant,
the single-lane `closedloop.run` program instrumented per tick), synthesize
one fixed-key sensor stream from it, then replay kinest and the KF over the
SAME stream for a grid of (accel_noise sd, meas noise var) — vmapped over
the grid, so the whole sweep is one compile. Reports locomotion-phase base
pos/vel RMSE. Writes docs/kf_tuning.json.

Run: python scripts/tune_kf.py            (TPU f32; add `cpu` for CPU x64)
"""
import json
import os
import sys

if "cpu" in sys.argv[1:]:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_ENABLE_X64"] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from srbx import agent as agent_mod
from srbx import mpc as mpc_mod
from srbx import motion as motion_mod
from srbx import refplan
from srbx.config import (Gait, LowLevelConfig, MotionConfig, MpcConfig,
                         QpConfig)
from srbx.estimation import kalman, kinest
from srbx.models import a1, rbd
from srbx.sim import closedloop, sensors
from srbx.sim import wholebody as wb
from srbx.utils import transforms as tf

DT = jnp.float32 if "cpu" not in sys.argv[1:] else jnp.float64
M = a1.model()
LL, MO, QP, SIM = (LowLevelConfig(), MotionConfig(), QpConfig(),
                   wb.SimConfig())
N_DOMAINS = 8


def record_trot():
    """Ground-truth single-lane trot (the `closedloop.run` program,
    `srbx/sim/closedloop.py:52`) instrumented to emit per-tick
    (q, qd, contact_ind, phase). Returns arrays of shape (T, ...)."""
    traj = refplan.generate(refplan.two_agent_config(loop_size=20_000),
                            jnp.asarray([0.0, 0.0, 0.0, -1.0], DT),
                            jnp.full((2, 20), 100.0, DT), dtype=DT)
    pr, prd = traj.pr[0:2], traj.prd[0:2]
    a0 = jnp.asarray([0.0, 0.0], DT)
    pobs = jnp.full((2, 20), 100.0, DT)
    loop = closedloop.LoopConfig(stand_ticks=600, n_domains=N_DOMAINS,
                                 ticks_per_domain=172)
    mpc_cfg = MpcConfig(use_sqp=False)

    q0 = wb.default_crouch(M, DT)
    sim = wb.SimState(q0, jnp.zeros((18,), DT))
    ast = agent_mod.init(MO, M, q0, DT)
    mcarry = mpc_mod.init_carry(a0, DT)
    ast = ast._replace(planner=ast.planner._replace(
        stand_from=q0[0:3],
        dom_ticks=jnp.asarray(float(loop.stand_ticks), DT)))

    def stand_tick(carry, _):
        sim, ast = carry
        force = wb.foot_force_measurement(SIM, M, sim)
        ll_out, ast, _ = agent_mod.tick(LL, MO, QP, M, Gait.STAND, ast,
                                        sim.q, sim.qd, force)
        sim = wb.step(SIM, M, sim, ll_out.tau)
        return (sim, ast), None

    (sim, ast), _ = jax.lax.scan(stand_tick, (sim, ast), None,
                                 length=loop.stand_ticks)

    trot_dom_ticks = float(MO.trot_dom_ticks)

    def domain_step(carry, dom_idx):
        sim, ast, mcarry = carry
        toe_xy = rbd.site_positions(M, sim.q)[a1.TOE_SITES][:, 0:2].T
        contact_ind = motion_mod.next_trot_domain(ast.con.des).astype(DT)
        out = mpc_mod.run_nmpc(mpc_cfg, QP, mcarry, sim.q[0:2], sim.qd[0:2],
                               toe_xy, contact_ind, pr, prd, a0, pobs)
        ast2 = agent_mod.set_mpc_data(ast, out.alpha_com, out.states)

        def ll_tick(carry, k):
            sim, ast = carry
            phase = ast.loco_tick / trot_dom_ticks
            force = wb.foot_force_measurement(SIM, M, sim)
            ll_out, ast, _ = agent_mod.tick(
                LL, MO, QP, M, Gait.TROT, ast, sim.q, sim.qd, force,
                force_new_domain=(k == 0), allow_contact_trigger=False)
            ast = ast._replace(mpc_available=jnp.logical_or(
                ast.mpc_available, k >= loop.mpc_latency_ticks))
            rec = (sim.q, sim.qd, ast.con.ind.astype(jnp.int32), phase)
            sim = wb.step(SIM, M, sim, ll_out.tau)
            return (sim, ast), rec

        (sim, ast3), recs = jax.lax.scan(
            ll_tick, (sim, ast2), jnp.arange(loop.ticks_per_domain))
        return (sim, ast3, out.carry), recs

    (_, _, _), recs = jax.lax.scan(domain_step, (sim, ast, mcarry),
                                   jnp.arange(loop.n_domains))
    qs, qds, inds, phases = recs
    flat = lambda x: x.reshape((-1,) + x.shape[2:])
    return flat(qs), flat(qds), flat(inds), flat(phases)


def sensor_stream(qs, qds, key):
    """One fixed-key sensor stream over the recorded states."""
    cfg = sensors.SensorConfig()
    st = sensors.init(cfg, key, qds[0])

    def tick(st, x):
        q, qd = x
        st, rd = sensors.read(cfg, SIM, M, st, wb.SimState(q, qd))
        return st, rd

    _, rds = jax.lax.scan(tick, st, (qs, qds))
    return rds


def replay_kinest(rds, inds, q0):
    st = kinest.KinEstState(
        com=q0[0:3],
        toe_prev=rbd.site_positions(M, q0.at[0:3].set(0.0))[a1.TOE_SITES])

    def tick(st, x):
        rd, ind = x
        eul_rate = jnp.linalg.solve(
            rbd.euler_rate_matrix(rd.eul), tf.rot_xyz(rd.eul) @ rd.gyro)
        qd_fk = jnp.zeros(18, DT).at[3:6].set(eul_rate).at[6:].set(
            rd.qd_joints)
        st, com, vel = kinest.update(M, st, rd.q_joints, qd_fk, rd.eul,
                                     rd.foot_force, ind.astype(DT))
        return st, (com, vel)

    _, (coms, vels) = jax.lax.scan(tick, st, (rds, inds))
    return coms, vels


def replay_kf(rds, inds, q0, qd0, accel_noise, meas_noise, swing_noise):
    st = kalman.KfState(
        x=jnp.concatenate([
            q0[0:3], qd0[0:3],
            rbd.site_positions(M, q0)[a1.TOE_SITES].reshape(-1)]).astype(DT),
        p=(1e-2 * jnp.eye(18, dtype=DT)))

    def tick(st, x):
        rd, ind = x
        q_fk = jnp.zeros(18, DT).at[3:6].set(rd.eul).at[6:].set(rd.q_joints)
        toes_rel = rbd.site_positions(M, q_fk)[a1.TOE_SITES]
        st = kalman.update(st, ind.astype(DT), rd.imu_accel,
                           tf.rot_xyz(rd.eul), -toes_rel, dt=SIM.dt,
                           accel_noise=accel_noise, meas_noise=meas_noise,
                           g=M.g, swing_noise=swing_noise)
        return st, (st.x[0:3], st.x[3:6])

    _, (coms, vels) = jax.lax.scan(tick, st, (rds, inds))
    return coms, vels


def rmse(coms, vels, qs, qds):
    ep = jnp.sqrt(jnp.mean(jnp.sum((coms - qs[:, 0:3]) ** 2, axis=-1)))
    ev = jnp.sqrt(jnp.mean(jnp.sum((vels - qds[:, 0:3]) ** 2, axis=-1)))
    return ep, ev


def main():
    print(f"platform {jax.devices()[0].platform}, dtype {DT.__name__}",
          flush=True)
    qs, qds, inds, phases = jax.jit(record_trot)()
    qs, qds = jax.block_until_ready((qs, qds))
    print(f"recorded {qs.shape[0]} trot ticks; x: "
          f"{float(qs[0, 0]):.3f} -> {float(qs[-1, 0]):.3f} m", flush=True)
    # gate estimators with the PREVIOUS tick's controller index, as the
    # pipeline does
    inds_prev = jnp.concatenate([inds[:1], inds[:-1]], axis=0)
    rds = jax.jit(sensor_stream)(qs, qds, jax.random.PRNGKey(7))

    q0, qd0 = qs[0], qds[0]
    kp, kv = jax.jit(replay_kinest)(rds, inds_prev, q0)
    ep, ev = rmse(kp, kv, qs, qds)
    rows = [dict(source="kinest", accel_noise=None, meas_noise=None,
                 pos_rmse_mm=float(ep) * 1e3, vel_rmse=float(ev))]
    print(f"kinest                  pos {float(ep)*1e3:7.2f} mm   "
          f"vel {float(ev):.4f} m/s", flush=True)

    grid = ([(2000.0, 1.0, 1e6)] +     # reference values (src/kalman.cpp)
            [(a, r, s)
             for a in (20.0, 2.0, 0.5, 0.1)
             for r in (1e-3, 1e-4, 1e-5, 1e-6)
             for s in (1e3,)])
    a_arr = jnp.asarray([c[0] for c in grid], DT)
    r_arr = jnp.asarray([c[1] for c in grid], DT)
    s_arr = jnp.asarray([c[2] for c in grid], DT)
    f = jax.jit(jax.vmap(
        lambda a, r, s: replay_kf(rds, inds_prev, q0, qd0, a, r, s)))
    cps, cvs = f(a_arr, r_arr, s_arr)
    for i, (a, r, s) in enumerate(grid):
        ep, ev = rmse(cps[i], cvs[i], qs, qds)
        rows.append(dict(source="kf", accel_noise=a, meas_noise=r,
                         swing_noise=s,
                         pos_rmse_mm=float(ep) * 1e3, vel_rmse=float(ev)))
        print(f"kf a={a:<7g} r={r:<7g} s={s:<7g}  pos {float(ep)*1e3:8.2f} mm"
              f"   vel {float(ev):.4f} m/s", flush=True)

    out_path = os.path.join(os.path.dirname(__file__), os.pardir, "docs",
                            "kf_tuning.json")
    with open(out_path, "w") as fo:
        json.dump(dict(platform=jax.devices()[0].platform,
                       dtype=np.dtype(DT).name, n_ticks=int(qs.shape[0]),
                       rows=rows), fo, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
