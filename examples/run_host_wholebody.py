"""FULL-FIDELITY host deployment: the 18-DoF whole-body control chain driven
by the native dual-rate runtime — `agent.tick` + compliant-ground plant at a
true 1 kHz `RateLoop`, event-based NMPC served by a second 20 ms-polled
loop, the two exchanging state/plan through the seqlock `SharedStore`.

This is the deployment shape of the reference's hardware driver
(`driver_scripts/qp_only_exp.cpp:156-370`: `ExternalComm::Calc` @1 ms and
`ExternalComm::HighLevel` @20 ms wired at `:665-668`, sharing `sharedData`
through the boost::mutex store) with the whole-body chain — not the LIP
template of examples/run_host.py — in the loop. The plant stands in for the
robot+SDK; everything the controller consumes crosses the store, nothing
else does.

`--est` runs the full deployable topology: the controller NEVER reads the
plant — every 1 ms tick synthesizes IMU/encoder/foot-force measurements
(srbx.sim.sensors), runs kinEst + contact gating (srbx.estimation.pipeline),
and the tick (and the 4-state the store carries to the NMPC thread) consumes
the ESTIMATE, exactly as the reference's drivers run `kinEst0/1` per tick
and SET_DATA the estimator-written state (`qp_only_exp.cpp:256,484`).

Runs on the host CPU (the reference's 1 kHz chain also runs on the robot's
host PC): per-call device latencies at B=1 are µs-scale there, so the 1 ms
deadline is real. Run with JAX_PLATFORMS=cpu (forced below).

    python examples/run_host_wholebody.py [seconds] [ll_period_us] [--est]
    python examples/run_host_wholebody.py [seconds] [ctrl_us] [plant_us] --split
      (--split: controller and plant in SEPARATE RateLoops exchanging
       torque/sensor packets through the store — the hardware topology)
"""

from __future__ import annotations

import os
import pathlib
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
try:
    import jax.extend.backend as _jeb

    _jeb.clear_backends()
except Exception:
    pass
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from srbx import agent as agent_mod
from srbx import mpc as mpc_mod
from srbx import refplan, runtime
from srbx.config import Gait, LowLevelConfig, MotionConfig, MpcConfig, QpConfig
from srbx.estimation import pipeline
from srbx.models import a1, rbd
from srbx.sim import wholebody as wb

STATE_SLOT, PLAN_SLOT, TAU_SLOT, SENS_SLOT = 0, 1, 2, 3
M = a1.model()
LL, MO, QP, SIM = (LowLevelConfig(), MotionConfig(), QpConfig(),
                   wb.SimConfig())
MPC = MpcConfig(use_sqp=True, sqp_iters=1)
EST = pipeline.EstConfig()


def main_split(seconds: float = 2.0, ll_period_us: int = 1_000,
               plant_period_us: int = 1_000):
    """--split: the DEPLOYMENT topology — the 1 kHz CONTROLLER runs in its
    own RateLoop against sensor packets from the store, exactly what it
    would consume from the robot's UDP; the PLANT (the robot stand-in) runs
    in a second RateLoop, consuming torque packets and publishing sensors.
    The controller chain (build + LL-QP + finish, CRBA shared with nothing
    — the plant is remote) is the thing the 1 ms budget applies to on
    hardware (`driver_scripts/qp_only_exp.cpp:665-668`); the plant's own
    cost (the physics that hardware replaces) no longer sits inside the
    controller callback. Ground-truth sensors only (est mode needs the
    in-process sensor synthesis of the fused demo)."""
    import dataclasses as _dc

    from srbx.ops import qp as qp_mod

    # f64 RAW solve: refinement measurably changes nothing here (the static
    # shifts are 1e-9 against penalty scales ~1e9 — measured d_tau identical
    # with refine 0 vs 2, docs/ROUND4.md §1.2), so skip its cost in the
    # 1 kHz callback.
    QP_LL = _dc.replace(QP, kkt_refine_iters=0)
    ref = refplan.generate(refplan.two_agent_config(loop_size=8_000),
                           jnp.asarray([0.0, 0.5, 0.0, -0.5]),
                           jnp.full((2, 20), 100.0))
    pr, prd = ref.pr[0:2], ref.prd[0:2]
    p_start = jnp.asarray([0.0, 0.5])
    pobs = jnp.full((2, 20), 100.0)

    @jax.jit
    def ctrl_fn(ast, sens):
        q, qd, force = sens[0:18], sens[18:36], sens[36:40]
        d0 = rbd.mass_matrix(M, q)
        d_inv = jnp.linalg.inv(d0)
        data, ctx = agent_mod.tick_build(
            LL, MO, M, Gait.TROT, ast, q, qd, force,
            allow_contact_trigger=True, reduced=True, d_inv=d_inv)
        with jax.default_matmul_precision("highest"):
            sol = qp_mod.solve(data.P, data.c, data.A, data.b, data.G,
                               data.h, QP_LL)
        ll_out, ast, run_mpc = agent_mod.tick_finish(
            LL, ctx, q, qd, sol.x, sol.converged, reduced=True)
        # one packed output -> ONE host transfer in the callback
        pkt = jnp.concatenate([
            ll_out.tau,
            jnp.stack([run_mpc.astype(jnp.float64),
                       ll_out.qp_converged.astype(jnp.float64)]),
            ast.con.des.astype(jnp.float64)])
        return pkt, ast

    @jax.jit
    def plant_fn(sim, tau):
        sim = wb.step(SIM, M, sim, tau)
        force = wb.foot_force_measurement(SIM, M, sim)
        return sim, force

    @jax.jit
    def hl_fn(domain, alpha_buf, q, qd, ci):
        carry = mpc_mod.MpcCarry(domain, alpha_buf)
        toe_xy = rbd.site_positions(M, q)[a1.TOE_SITES][:, 0:2].T
        out = mpc_mod.run_nmpc(MPC, QP, carry, q[0:2], qd[0:2], toe_xy, ci,
                               pr, prd, p_start, pobs)
        return out.alpha_com, out.states, out.carry, out.qp_converged

    # stand-up in-process (the deployment starts from the standing robot)
    q0 = wb.default_crouch(M).at[0:2].add(p_start)
    sim = wb.SimState(q0, jnp.zeros(18))
    ast = agent_mod.init(MO, M, q0)
    ast = ast._replace(planner=ast.planner._replace(
        stand_from=q0[0:3], dom_ticks=jnp.asarray(800.0, jnp.float64)))

    @jax.jit
    def stand(sim, ast):
        def tick(carry, _):
            sim, ast = carry
            force = wb.foot_force_measurement(SIM, M, sim)
            ll_out, ast, _ = agent_mod.tick(LL, MO, QP, M, Gait.STAND, ast,
                                            sim.q, sim.qd, force)
            return (wb.step(SIM, M, sim, ll_out.tau), ast), None
        (sim, ast), _ = jax.lax.scan(tick, (sim, ast), None, length=1000)
        return sim, ast

    sim, ast = stand(sim, ast)
    force = plant_fn(sim, jnp.zeros(12))[1]
    # warm both signatures
    sens0 = jnp.concatenate([sim.q, sim.qd, force])
    pkt, ast = ctrl_fn(ast, sens0)
    pkt, ast = ctrl_fn(ast, sens0)
    tau = pkt[0:12]
    sim, force = plant_fn(sim, tau)
    c0 = mpc_mod.init_carry(p_start)
    al_, st_, ca_, _ = hl_fn(c0.gait_domain, c0.alpha_buffer, sim.q,
                             sim.qd, jnp.ones(4))
    jax.block_until_ready((tau, sim.q, al_))
    assert ctrl_fn._cache_size() == 1 and plant_fn._cache_size() == 1

    lib = runtime.load()
    store = runtime.SharedStore(lib, n_slots=4, slot_bytes=512)
    store.write(SENS_SLOT, np.concatenate(
        [np.asarray(sim.q), np.asarray(sim.qd),
         np.asarray(force)]).astype(np.float64).tobytes())
    store.write(TAU_SLOT, np.asarray(tau, np.float64).tobytes())

    H = {"sim": sim, "ast": ast, "carry": mpc_mod.init_carry(p_start),
         "plan_ver": 0, "state_ver": 0, "ll_ok": 0, "ll_n": 0, "hl_n": 0,
         "hl_ok": 0, "mpc_req": 0, "plant_n": 0}

    def plant_cb(_):
        raw = np.frombuffer(store.read(TAU_SLOT), np.float64, 12)
        sim, force = plant_fn(H["sim"], jnp.asarray(raw))
        H["sim"] = sim
        H["plant_n"] += 1
        pkt = np.concatenate([np.asarray(sim.q), np.asarray(sim.qd),
                              np.asarray(force)])
        store.write(SENS_SLOT, pkt.astype(np.float64).tobytes())

    def ctrl_cb(_):
        v = store.version(PLAN_SLOT)
        if v != H["plan_ver"] and v > 0:
            raw = np.frombuffer(store.read(PLAN_SLOT), np.float64, 36)
            H["ast"] = agent_mod.set_mpc_data(
                H["ast"], jnp.asarray(raw[:20].reshape(4, 5)),
                jnp.asarray(raw[20:36].reshape(4, 4)))
            H["plan_ver"] = v
        raw = np.frombuffer(store.read(SENS_SLOT), np.float64, 40)
        pkt, ast = ctrl_fn(H["ast"], jnp.asarray(raw))
        H["ast"] = ast
        out = np.asarray(pkt)              # single host sync per tick
        store.write(TAU_SLOT, out[0:12].tobytes())
        H["ll_n"] += 1
        H["ll_ok"] += int(out[13] > 0.5)
        if out[12] > 0.5:
            st = np.concatenate([raw[0:36], out[14:18]])
            store.write(STATE_SLOT, st.astype(np.float64).tobytes())
            H["mpc_req"] += 1

    def hl_cb(_):
        v = store.version(STATE_SLOT)
        if v == H["state_ver"] or v == 0:
            return
        H["state_ver"] = v
        raw = np.frombuffer(store.read(STATE_SLOT), np.float64, 40)
        carry = H["carry"]
        alpha, states, carry, ok = hl_fn(
            carry.gait_domain, carry.alpha_buffer, jnp.asarray(raw[0:18]),
            jnp.asarray(raw[18:36]), jnp.asarray(raw[36:40]))
        H["carry"] = carry
        out = np.concatenate([np.asarray(alpha).ravel(),
                              np.asarray(states).ravel()])
        store.write(PLAN_SLOT, out.astype(np.float64).tobytes())
        H["hl_n"] += 1
        H["hl_ok"] += int(ok)

    ctrl = runtime.RateLoop(lib, period_us=ll_period_us, callback=ctrl_cb,
                            cpu=-1)
    plant = runtime.RateLoop(lib, period_us=plant_period_us,
                             callback=plant_cb, cpu=-1)
    hl = runtime.RateLoop(lib, period_us=20_000, callback=hl_cb, cpu=-1)
    x0v = float(sim.q[0])
    hl.start(); plant.start(); ctrl.start()
    time.sleep(seconds)
    ctrl.stop(); plant.stop(); hl.stop()

    simf = H["sim"]
    print(f"[split] ran {seconds}s: ctrl ticks {H['ll_n']} "
          f"(target {seconds/(ll_period_us*1e-6):.0f} @ {ll_period_us} us), "
          f"plant ticks {H['plant_n']}, HL events {H['hl_n']} "
          f"(requests {H['mpc_req']})")
    print(f"[split] CONTROLLER latency p50 {ctrl.latency_ns(50)/1e3:.0f} us  "
          f"p99 {ctrl.latency_ns(99)/1e3:.0f} us  overruns {ctrl.overruns}")
    print(f"[split] plant latency p50 {plant.latency_ns(50)/1e3:.0f} us  "
          f"p99 {plant.latency_ns(99)/1e3:.0f} us  overruns {plant.overruns}")
    print(f"[split] LL-QP converged {H['ll_ok']}/{H['ll_n']}  "
          f"NMPC {H['hl_ok']}/{H['hl_n']}")
    print(f"[split] COM: x {x0v:.3f} -> {float(simf.q[0]):.3f} m  "
          f"z {float(simf.q[2]):.3f} m")
    ctrl.close(); plant.close(); hl.close(); store.close()


def main(seconds: float = 5.0, ll_period_us: int = 1_000,
         use_est: bool = False):
    p_start = jnp.asarray([0.0, 0.0], jnp.float64)
    pobs = jnp.full((2, 20), 100.0)
    ref = refplan.generate(
        refplan.two_agent_config(loop_size=20_000),
        jnp.asarray([0.0, 0.0, 0.0, -1.0]), pobs)
    pr, prd = ref.pr[0:2], ref.prd[0:2]

    # ----------------- jitted steps (compiled before the loops) ---------- #
    # production LL operating point: reduced QP build (n 43->25) + Ruiz
    # equilibration (the batch loops' conditioning fix, ROUND1)
    import dataclasses as _dc

    from srbx.ops import qp as qp_mod

    # f64 host path: run the LL QP RAW (no Ruiz) — the iSWIFT cross-
    # validation (docs/ROUND4.md) measured raw f64 torque agreement at
    # median 3e-5 Nm vs the reference solver, while the equilibrated solve
    # terminates ~1 Nm off (weakly-determined scaled optimum). Ruiz remains
    # the f32/TPU batch-lane default (closedloop._resolve_ll_qp_cfg).
    QP_LL = QP

    def _ll_tick(sim, ast, est, gait):
        """One controller+plant tick; with est, the controller (and the
        4-state later SET into the store) sees only the estimate."""
        d0 = d_inv = None
        if est is None:
            q_c, qd_c = sim.q, sim.qd
            force = wb.foot_force_measurement(SIM, M, sim)
            # CRBA sharing (ground truth only: controller view == plant
            # state): one D(q) evaluation serves the LL build's D^-1 AND
            # the first physics substep — removes one of the tick's three
            # mass-matrix evaluations (VERDICT r3 #4).
            d0 = rbd.mass_matrix(M, q_c)
            d_inv = jnp.linalg.inv(d0)
        else:
            phase = ast.loco_tick / jnp.maximum(ast.planner.dom_ticks, 1.0)
            est, out = pipeline.update(EST, SIM, M, est, sim, phase)
            q_c, qd_c, force = out.q_hat, out.qd_hat, out.foot_force
        data, ctx = agent_mod.tick_build(
            LL, MO, M, gait, ast, q_c, qd_c, force,
            allow_contact_trigger=True, reduced=True, d_inv=d_inv)
        with jax.default_matmul_precision("highest"):
            sol = qp_mod.solve(data.P, data.c, data.A, data.b, data.G,
                               data.h, QP_LL)
        ll_out, ast, run_mpc = agent_mod.tick_finish(
            LL, ctx, q_c, qd_c, sol.x, sol.converged, reduced=True)
        err = None
        if est is not None:
            est = pipeline.set_contact_ind(est, ast.con.ind)
            # base pos/vel estimate error vs truth (report-only; the
            # controller never sees these). Computed against the PRE-step
            # sim state — q_hat estimates the state the sensors were
            # synthesized from, before wb.step advances the plant.
            err = jnp.stack([
                jnp.linalg.norm(est.q_hat[0:3] - sim.q[0:3]),
                jnp.linalg.norm(est.qd_hat[0:3] - sim.qd[0:3]),
            ])
        sim = wb.step(SIM, M, sim, ll_out.tau, d0=d0)
        return sim, ast, est, run_mpc, ll_out.qp_converged, err

    if use_est:
        @jax.jit
        def ll_fn(sim, ast, est):
            sim, ast, est, run_mpc, ok, err = _ll_tick(
                sim, ast, est, Gait.TROT)
            return sim, ast, est, run_mpc, ok, err
    else:
        @jax.jit
        def ll_fn(sim, ast):
            sim, ast, _, run_mpc, ok, _e = _ll_tick(sim, ast, None, Gait.TROT)
            return sim, ast, run_mpc, ok

    @jax.jit
    def hl_fn(domain, alpha_buf, q, qd, ci):
        carry = mpc_mod.MpcCarry(domain, alpha_buf)
        toe_xy = rbd.site_positions(M, q)[a1.TOE_SITES][:, 0:2].T
        out = mpc_mod.run_nmpc(
            MPC, QP, carry, q[0:2], qd[0:2], toe_xy, ci, pr, prd,
            p_start, pobs)
        return out.alpha_com, out.states, out.carry, out.qp_converged

    # ----------------------------- stand-up ------------------------------ #
    q0 = wb.default_crouch(M)
    sim = wb.SimState(q0, jnp.zeros(18))
    ast = agent_mod.init(MO, M, q0)
    # explicit dtype: a weak-typed scalar here would flip to strong after
    # the first TROT tick (plan_trot rewrites dom_ticks) and force a 30 s
    # recompile inside the 1 kHz callback
    ast = ast._replace(planner=ast.planner._replace(
        stand_from=q0[0:3], dom_ticks=jnp.asarray(800.0, jnp.float64)))

    est = (pipeline.init(EST, M, wb.SimState(q0, jnp.zeros(18)),
                         jax.random.PRNGKey(7)) if use_est else None)

    @jax.jit
    def stand(sim, ast, est):
        def tick(carry, _):
            sim, ast, est = carry
            sim, ast, est, _, _, _ = _ll_tick(sim, ast, est, Gait.STAND)
            return (sim, ast, est), None
        (sim, ast, est), _ = jax.lax.scan(tick, (sim, ast, est), None,
                                          length=1000)
        return sim, ast, est

    sim, ast, est = stand(sim, ast, est)
    jax.block_until_ready(sim.q)

    # warm the loop compiles: tick twice feeding outputs back so the real
    # steady-state input signature (not just the post-stand one) is cached,
    # then start the loops from the warmed state
    if use_est:
        sim, ast, est, _, _, _ = ll_fn(sim, ast, est)
        sim, ast, est, _, _, _ = ll_fn(sim, ast, est)
    else:
        sim, ast, _, _ = ll_fn(sim, ast)
        sim, ast, _, _ = ll_fn(sim, ast)
    c0 = mpc_mod.init_carry(p_start)
    al_, st_, ca_, _ = hl_fn(c0.gait_domain, c0.alpha_buffer,
                             sim.q, sim.qd, jnp.ones(4))
    al_, st_, ca_, _ = hl_fn(ca_.gait_domain, ca_.alpha_buffer,
                             sim.q, sim.qd, jnp.ones(4))
    jax.block_until_ready((sim.q, al_))
    assert ll_fn._cache_size() == 1, "unstable LL tick signature (recompile)"
    assert hl_fn._cache_size() == 1, "unstable HL cycle signature (recompile)"

    # ------------------------- store + callbacks ------------------------- #
    lib = runtime.load()
    store = runtime.SharedStore(lib, n_slots=2, slot_bytes=512)

    holders = {
        "sim": sim, "ast": ast, "est": est,
        "carry": mpc_mod.init_carry(p_start),
        "plan_applied_ver": 0, "state_seen_ver": 0,
        "ll_ok": 0, "ll_n": 0, "hl_ok": 0, "hl_n": 0, "mpc_req": 0,
        "err_sq": np.zeros(2), "err_n": 0,
    }

    def ll_cb(tick):
        # deliver a fresh plan if the HL published one
        v = store.version(PLAN_SLOT)
        if v != holders["plan_applied_ver"] and v > 0:
            raw = np.frombuffer(store.read(PLAN_SLOT), np.float64, 36)
            holders["ast"] = agent_mod.set_mpc_data(
                holders["ast"], jnp.asarray(raw[:20].reshape(4, 5)),
                jnp.asarray(raw[20:36].reshape(4, 4)))
            holders["plan_applied_ver"] = v
        if use_est:
            sim, ast, est, run_mpc, ok, err = ll_fn(
                holders["sim"], holders["ast"], holders["est"])
            holders["est"] = est
            holders["err_sq"] += np.asarray(err) ** 2
            holders["err_n"] += 1
            # what crosses the store is the ESTIMATE (the reference SET_DATAs
            # the kinEst-written state, `qp_only_exp.cpp:256,484`)
            q_hl, qd_hl = est.q_hat, est.qd_hat
        else:
            sim, ast, run_mpc, ok = ll_fn(holders["sim"], holders["ast"])
            q_hl, qd_hl = sim.q, sim.qd
        holders["sim"], holders["ast"] = sim, ast
        holders["ll_n"] += 1
        holders["ll_ok"] += int(ok)
        if bool(run_mpc):
            # the trigger tick already advanced con.des to the NEW domain
            st = np.concatenate([
                np.asarray(q_hl), np.asarray(qd_hl),
                np.asarray(ast.con.des, np.float64)])
            store.write(STATE_SLOT, st.astype(np.float64).tobytes())
            holders["mpc_req"] += 1

    def hl_cb(_):
        v = store.version(STATE_SLOT)
        if v == holders["state_seen_ver"] or v == 0:
            return              # no pending event — the 20 ms poll idles
        holders["state_seen_ver"] = v
        raw = np.frombuffer(store.read(STATE_SLOT), np.float64, 40)
        carry = holders["carry"]
        alpha, states, carry, ok = hl_fn(
            carry.gait_domain, carry.alpha_buffer,
            jnp.asarray(raw[0:18]), jnp.asarray(raw[18:36]),
            jnp.asarray(raw[36:40]))
        holders["carry"] = carry
        out = np.concatenate([np.asarray(alpha).ravel(),
                              np.asarray(states).ravel()])
        store.write(PLAN_SLOT, out.astype(np.float64).tobytes())
        holders["hl_n"] += 1
        holders["hl_ok"] += int(ok)

    # unpinned on purpose: this container exposes 2 CPUs, and pinning the
    # loop threads starves XLA's compute pool (the reference pins on a
    # multi-core desktop, `driver_scripts/qp_only_exp.cpp:666-668`)
    ll = runtime.RateLoop(lib, period_us=ll_period_us, callback=ll_cb, cpu=-1)
    hl = runtime.RateLoop(lib, period_us=20_000, callback=hl_cb, cpu=-1)
    x_start = float(sim.q[0])
    hl.start()
    ll.start()
    time.sleep(seconds)
    ll.stop()
    hl.stop()

    simf = holders["sim"]
    print(f"ran {seconds}s: LL ticks {holders['ll_n']} "
          f"(target {seconds/(ll_period_us*1e-6):.0f} @ {ll_period_us} us), "
          f"HL events served {holders['hl_n']} "
          f"(requests {holders['mpc_req']}, poll 20 ms)")
    print(f"LL callback latency p50 {ll.latency_ns(50)/1e3:.0f} us  "
          f"p99 {ll.latency_ns(99)/1e3:.0f} us  overruns {ll.overruns}")
    print(f"HL callback latency p50 {hl.latency_ns(50)/1e3:.0f} us  "
          f"p99 {hl.latency_ns(99)/1e3:.0f} us  overruns {hl.overruns}")
    print(f"LL-QP converged {holders['ll_ok']}/{holders['ll_n']}  "
          f"NMPC converged {holders['hl_ok']}/{holders['hl_n']}")
    print(f"COM: x {x_start:.3f} -> {float(simf.q[0]):.3f} m  "
          f"z {float(simf.q[2]):.3f} m  domains {int(holders['ast'].gait_domain)}")
    if use_est and holders["err_n"]:
        rmse = np.sqrt(holders["err_sq"] / holders["err_n"])
        print(f"estimation (controller ran on estimates): base pos RMSE "
              f"{rmse[0]*1e3:.1f} mm  vel RMSE {rmse[1]:.3f} m/s "
              f"over {holders['err_n']} ticks")
    ll.close()
    hl.close()
    store.close()


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--split" in sys.argv[1:]:
        main_split(float(args[0]) if len(args) > 0 else 2.0,
                   int(args[1]) if len(args) > 1 else 1_000,
                   int(args[2]) if len(args) > 2 else 1_000)
    else:
        main(float(args[0]) if len(args) > 0 else 5.0,
             int(args[1]) if len(args) > 1 else 1_000,
             use_est="--est" in sys.argv[1:])
