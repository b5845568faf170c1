"""Full-fidelity closed loop: stand-up + event-based trot under the NMPC.

The fixed-cadence structure of the reference sim (SURVEY.md §2.3): an outer
scan over gait domains (one NMPC replan each, the 172 ms event cycle) with
an inner scan over the domain's 1 kHz LL+physics ticks — the batched
equivalent of `src/A1_Sim.cpp:1193-1217`'s while loop. Contact-triggered
early replans reduce to the time trigger in nominal trot
(`src/LocoWrapper.cpp:165-200`); the stale-Bezier fallback still engages
whenever the MPC of a domain is marked unavailable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from srbx import agent as agent_mod
from srbx import mpc as mpc_mod
from srbx.config import (Gait, LowLevelConfig, MotionConfig, MpcConfig, QpConfig)
from srbx.models import a1, rbd
from srbx.sim import wholebody as wb


class LoopConfig(NamedTuple):
    stand_ticks: int = 1000
    n_domains: int = 40
    ticks_per_domain: int = 172   # 4 grids x 43 ms
    # Ticks until the domain's NMPC solution "arrives" (the reference's HL
    # thread latency); until then the LL runs on the stale-Bezier fallback.
    mpc_latency_ticks: int = 0


class LoopResult(NamedTuple):
    """Closed-loop run result. Shapes below are for `run` (single lane);
    `run_batch` returns the same tuple with a leading lane axis B on every
    field: com_hist (B, n_domains, ticks, 3), qp_ok (B,), mpc_ok (B,),
    tau_hist (B, n_domains, 2)."""

    sim: wb.SimState
    agent: agent_mod.AgentState
    com_hist: jax.Array       # (n_domains, ticks, 3)
    qp_ok: jax.Array          # () fraction of converged LL QPs
    mpc_ok: jax.Array         # () fraction of converged MPC cycles
    tau_hist: jax.Array       # (n_domains, 2) max |tau| per domain, V
    # estimation-in-the-loop only (est_cfg passed): per-lane RMSE of the
    # base-state estimate over the locomotion phase, [pos (m), vel (m/s)]
    est_rmse: jax.Array | None = None   # (B, 2)


def run(
    mpc_cfg: MpcConfig,
    ll_cfg: LowLevelConfig,
    motion_cfg: MotionConfig,
    qp_cfg: QpConfig,
    sim_cfg: wb.SimConfig,
    loop: LoopConfig,
    model: rbd.Model,
    pr_agent,
    prd_agent,
    agent_initial,
    pobs_real,
    q0=None,
    dtype=jnp.float64,
    stiction: bool = False,
):
    """Single-agent full-fidelity run. vmap over scenarios/agents upstream.

    stiction=True runs the plant with the anchor-point stick-slip tangential
    contact model (wb.ContactState); the final state's `sim.con.slip` is the
    per-foot cumulative stance-slip metric."""
    if q0 is None:
        q0 = wb.default_crouch(model, dtype)
        q0 = q0.at[0:2].add(agent_initial)
    con0 = wb.init_contact_state(model, q0) if stiction else None
    sim = wb.SimState(q0, jnp.zeros((18,), dtype), con0)
    ast = agent_mod.init(motion_cfg, model, q0, dtype)
    mcarry = mpc_mod.init_carry(agent_initial, dtype)

    # ------------------------- stand-up phase ------------------------- #
    stand_from = q0[0:3]
    ast = ast._replace(planner=ast.planner._replace(
        stand_from=stand_from,
        dom_ticks=jnp.asarray(float(loop.stand_ticks), dtype),
    ))

    def stand_tick(carry, _):
        sim, ast = carry
        force = wb.foot_force_measurement(sim_cfg, model, sim)
        ll_out, ast, _ = agent_mod.tick(
            ll_cfg, motion_cfg, qp_cfg, model, Gait.STAND, ast,
            sim.q, sim.qd, force,
        )
        sim = wb.step(sim_cfg, model, sim, ll_out.tau)
        return (sim, ast), None

    (sim, ast), _ = jax.lax.scan(
        stand_tick, (sim, ast), None, length=loop.stand_ticks
    )

    # --------------------- trot domains with NMPC ---------------------- #
    def domain_step(carry, dom_idx):
        sim, ast, mcarry, ok_cnt = carry

        # HL replan at the domain boundary (event-triggered in the
        # reference; here the trigger IS the domain boundary). The COP must
        # be confined to the *upcoming* domain's stance diagonal — the
        # reference calls run_NMPC after setDesDomain has switched the
        # contact index (`src/A1_Sim.cpp:227-234`).
        from srbx import motion as motion_mod

        toe_xy = rbd.site_positions(model, sim.q)[a1.TOE_SITES][:, 0:2].T
        contact_ind = motion_mod.next_trot_domain(ast.con.des).astype(dtype)
        out = mpc_mod.run_nmpc(
            mpc_cfg, qp_cfg, mcarry, sim.q[0:2], sim.qd[0:2], toe_xy,
            contact_ind, pr_agent, prd_agent, agent_initial, pobs_real,
        )
        ast2 = agent_mod.set_mpc_data(ast, out.alpha_com, out.states)

        def ll_tick(carry, k):
            sim, ast = carry
            force = wb.foot_force_measurement(sim_cfg, model, sim)
            ll_out, ast, _ = agent_mod.tick(
                ll_cfg, motion_cfg, qp_cfg, model, Gait.TROT, ast,
                sim.q, sim.qd, force,
                force_new_domain=(k == 0),
                allow_contact_trigger=False,
            )
            # the domain's fresh MPC data becomes visible after the modeled
            # HL latency (tick 0 clears availability; stale fallback covers).
            ast = ast._replace(
                mpc_available=jnp.logical_or(
                    ast.mpc_available, k >= loop.mpc_latency_ticks
                )
            )
            sim = wb.step(sim_cfg, model, sim, ll_out.tau)
            return (sim, ast), (sim.q[0:3], ll_out.qp_converged,
                                jnp.abs(ll_out.tau).max())

        (sim, ast3), (com, llok, taumax) = jax.lax.scan(
            ll_tick, (sim, ast2), jnp.arange(loop.ticks_per_domain)
        )
        ok_cnt = ok_cnt + out.qp_converged.astype(jnp.int32)
        stats = jnp.stack([jnp.max(taumax), jnp.mean(llok.astype(dtype))])
        return (sim, ast3, out.carry, ok_cnt), (com, stats)

    init_carry = (sim, ast, mcarry, jnp.zeros((), jnp.int32))
    (sim, ast, mcarry, ok_cnt), (com_hist, stats) = jax.lax.scan(
        domain_step, init_carry, jnp.arange(loop.n_domains)
    )
    return LoopResult(
        sim=sim,
        agent=ast,
        com_hist=com_hist,
        qp_ok=jnp.mean(stats[:, 1]),
        mpc_ok=ok_cnt.astype(dtype) / loop.n_domains,
        tau_hist=stats,
    )


def _tick_batch(ll_cfg, motion_cfg, qp_cfg, model, gait, states, qs, qds,
                forces, backend, tile, force_new_domain=None,
                allow_contact_trigger=True, reduced=False, return_d=False):
    """Batched control tick: vmap(tick_build) -> ONE fused/batched LL-QP
    solve over all lanes -> vmap(tick_finish).

    On the non-xla backends the tick's small-SPD linear algebra also runs
    batched: D^-1 (the build's 18x18 inverse) and the swing operational-
    space 12x12 inverse go through the lanes-last Pallas SPD kernel
    (srbx.ops.spd) instead of per-lane jnp.linalg.inv — the measured hot
    spot of the whole-body tick (scripts/bench_rbd_stages.py).

    return_d: additionally return the (B, 18, 18) mass matrices evaluated
    at qs, so a ground-truth caller (controller view == plant state) can
    hand them to wb.step_batch(d0=...) and skip one of the tick's three
    CRBA evaluations. Only honored on the non-xla path (the xla path does
    not form D batched)."""
    from srbx import lowlevel
    from srbx.ops import qp_batch, spd

    spd_backend = None if backend == "xla" else "fused"
    d_b = None

    if spd_backend is not None:
        with jax.default_matmul_precision("highest"):
            d_b = jax.vmap(lambda q: rbd.mass_matrix(model, q))(qs)
        d_inv_b = spd.inverse(d_b, backend=spd_backend, tile=tile)

        def build_d(st, q, qd, f, dinv):
            return agent_mod.tick_build(
                ll_cfg, motion_cfg, model, gait, st, q, qd, f,
                force_new_domain=force_new_domain,
                allow_contact_trigger=allow_contact_trigger,
                reduced=reduced, d_inv=dinv,
            )

        data, ctx = jax.vmap(build_d)(states, qs, qds, forces, d_inv_b)
    else:
        def build(st, q, qd, f):
            return agent_mod.tick_build(
                ll_cfg, motion_cfg, model, gait, st, q, qd, f,
                force_new_domain=force_new_domain,
                allow_contact_trigger=allow_contact_trigger,
                reduced=reduced,
            )

        data, ctx = jax.vmap(build)(states, qs, qds, forces)
    sol = qp_batch.solve(data.P, data.c, data.A, data.b, data.G, data.h,
                         qp_cfg, backend=backend, tile=tile)

    if spd_backend is not None:
        base_ctx = ctx.ll_ctx.base if reduced else ctx.ll_ctx
        with jax.default_matmul_precision("highest"):
            delta_inv_b = jax.vmap(lowlevel.swing_delta_inv)(base_ctx)
        # NOTE: the Cholesky-based fused inverse assumes swing_delta_inv is
        # SPD, i.e. full-rank swing-leg Jacobian rows. At an exact kinematic
        # singularity (fully stretched/folded leg — outside the operating
        # envelope of every gait here; swing targets keep the knee bent) the
        # per-lane LU path (spd_backend=None) degrades more gracefully.
        delta_b = spd.inverse(delta_inv_b, backend=spd_backend, tile=tile)

        def finish_d(c, q, qd, x, cv, dl):
            return agent_mod.tick_finish(ll_cfg, c, q, qd, x, cv,
                                         reduced=reduced, delta=dl)

        out = jax.vmap(finish_d)(ctx, qs, qds, sol.x, sol.converged, delta_b)
        return out + (d_b,) if return_d else out

    def finish(c, q, qd, x, cv):
        return agent_mod.tick_finish(ll_cfg, c, q, qd, x, cv, reduced=reduced)

    out = jax.vmap(finish)(ctx, qs, qds, sol.x, sol.converged)
    return out + (None,) if return_d else out


def _resolve_ll_qp_cfg(qp_cfg, ll_reduced, ll_qp_cfg, dtype=None):
    """Default LL solver config for the batched loops, per dtype.

    The reduced LL QP's Hessian carries auxPen * A'^T A' (condition
    ~auxPen/df_pen ~ 1e10). The iSWIFT cross-validation (docs/ROUND4.md)
    measured, against the reference solver on 464 captured LL instances:

      * f64 RAW (no Ruiz): torque agreement median 3e-5 / max 1.5e-2 Nm —
        the accurate configuration; equilibration actively HURTS in f64
        (the scaled optimum is weakly determined: ~1 Nm unscaled error at
        a converged scaled residual).
      * f32 raw: 0% convergence (Cholesky of a cond-1e10 operator); Ruiz
        (5 sweeps) restores convergence but accuracy is representation-
        limited to ~1.9 Nm median regardless of algorithm — evaluating the
        KKT gradient at the TRUE optimum on f32-rounded operands already
        carries error larger than the gradient scale.

    So: f64 lanes run raw (exact), f32 lanes run Ruiz (converged, with the
    quantified representation-limited gap)."""
    if ll_qp_cfg is not None:
        return ll_qp_cfg
    if dtype is not None and jnp.dtype(dtype) == jnp.float64:
        return qp_cfg
    import dataclasses as _dc
    return (_dc.replace(qp_cfg, ruiz_iters=max(qp_cfg.ruiz_iters, 5))
            if ll_reduced else qp_cfg)


def _init_lanes(motion_cfg, loop, model, a0_l, dtype, stiction=False):
    """Per-lane crouch init: sim state, agent state (stand planner armed),
    MPC carry."""
    def init_one(a0):
        q0 = wb.default_crouch(model, dtype)
        q0 = q0.at[0:2].add(a0)
        con0 = wb.init_contact_state(model, q0) if stiction else None
        sim = wb.SimState(q0, jnp.zeros((18,), dtype), con0)
        ast = agent_mod.init(motion_cfg, model, q0, dtype)
        ast = ast._replace(planner=ast.planner._replace(
            stand_from=q0[0:3],
            dom_ticks=jnp.asarray(float(loop.stand_ticks), dtype)))
        return sim, ast, mpc_mod.init_carry(a0, dtype)

    return jax.vmap(init_one)(a0_l)


def _init_ests(est_cfg, model, sims, est_key):
    """Per-lane estimator init (estimation-in-the-loop runs)."""
    from srbx.estimation import pipeline

    if est_key is None:
        est_key = jax.random.PRNGKey(0)
    bsz = sims.q.shape[0]
    keys = jax.random.split(est_key, bsz)
    return jax.vmap(lambda s, k: pipeline.init(est_cfg, model, s, k))(
        sims, keys)


def _est_step(est_cfg, sim_cfg, model, ests, sims, phases):
    """Batched estimation tick: (ests, EstOut with leading lane axis)."""
    from srbx.estimation import pipeline

    return jax.vmap(
        lambda e, s, p: pipeline.update(est_cfg, sim_cfg, model, e, s, p)
    )(ests, sims, phases)


def _ctrl_inputs(est_cfg, sim_cfg, model, ests, sims, phases):
    """The controller's view of the state for one tick: ground truth when
    est_cfg is None, otherwise the estimation pipeline's (q̂, q̇̂, measured
    force) with truth confined to the plant/sensors."""
    if est_cfg is None:
        forces = jax.vmap(
            lambda s: wb.foot_force_measurement(sim_cfg, model, s)
        )(sims)
        return ests, sims.q, sims.qd, forces
    ests, out = _est_step(est_cfg, sim_cfg, model, ests, sims, phases)
    return ests, out.q_hat, out.qd_hat, out.foot_force


def _stand_phase(ll_cfg, motion_cfg, ll_qp_cfg, sim_cfg, loop, model,
                 sims, asts, backend, tile, ll_reduced,
                 est_cfg=None, ests=None):
    """Batched stand-up scan shared by the batch loop runners. With
    estimation in the loop the estimators run (and converge) during
    stand-up, exactly like the settle/stand phases of the hardware drivers
    (`driver_scripts/qp_only_exp.cpp:256-310`)."""
    from srbx.estimation import pipeline

    def stand_tick(carry, _):
        sims, asts, ests = carry
        phases = asts.loco_tick / jnp.maximum(asts.planner.dom_ticks, 1.0)
        ests, qs, qds, forces = _ctrl_inputs(
            est_cfg, sim_cfg, model, ests, sims, phases)
        ll_outs, asts, _, d_b = _tick_batch(
            ll_cfg, motion_cfg, ll_qp_cfg, model, Gait.STAND, asts,
            qs, qds, forces, backend, tile, reduced=ll_reduced,
            return_d=True,
        )
        if est_cfg is not None:
            ests = jax.vmap(pipeline.set_contact_ind)(ests, asts.con.ind)
        sims = wb.step_batch(
            sim_cfg, model, sims, ll_outs.tau,
            backend=("xla" if backend == "xla" else "fused"), tile=tile,
            d0=d_b if est_cfg is None else None,
        )
        return (sims, asts, ests), None

    (sims, asts, ests), _ = jax.lax.scan(
        stand_tick, (sims, asts, ests), None, length=loop.stand_ticks
    )
    return sims, asts, ests


def run_batch(
    mpc_cfg: MpcConfig,
    ll_cfg: LowLevelConfig,
    motion_cfg: MotionConfig,
    qp_cfg: QpConfig,
    sim_cfg: wb.SimConfig,
    loop: LoopConfig,
    model: rbd.Model,
    pr_agent,        # (B, 2, T)
    prd_agent,       # (B, 2, T)
    agent_initial,   # (B, 2)
    pobs_real,       # (B, 2, n_obs)
    dtype=jnp.float64,
    backend: str = "fused",
    tile: int = 256,
    ll_reduced: bool = False,
    ll_qp_cfg: QpConfig | None = None,
    est_cfg=None,
    est_key=None,
    stiction: bool = False,
    push=None,
) -> LoopResult:
    """Batched full-fidelity loop: `run` with the lane axis inside.

    Mathematically the same per-lane program as vmap(run) (test-enforced at
    the xla backend), but every 1 kHz LL-QP and every domain's NMPC runs as
    ONE batched solve across lanes, so the fused Pallas IPM
    (srbx.ops.qp_fused) gets the whole batch in its lane axis instead of
    XLA batching per-lane ops.

    est_cfg (an `srbx.estimation.pipeline.EstConfig`): run with ESTIMATION
    IN THE LOOP — the controller (LL ticks and HL replans) consumes only the
    sensor-driven kinEst/KF/prob-contact estimates, ground truth stays inside
    the plant+sensor model, exactly the reference's deployable topology
    (`driver_scripts/qp_only_exp.cpp:256,484`, `src/kalman.cpp:39`). The
    result then carries `est_rmse` (B, 2): locomotion-phase RMSE of the base
    position / velocity estimate.

    push: optional (force (B, 3), start_tick (B,), duration_ticks (B,)) —
    per-lane trunk force pulses, the batched analogue of the reference's
    external disturbance generator (`src/A1_Sim.cpp:84-107`: a constant
    force on the trunk between two control ticks). start_tick counts
    LOCOMOTION ticks (the stand phase is excluded)."""
    from srbx import mpc_batch
    from srbx import motion as motion_mod
    from srbx.estimation import pipeline

    ll_qp_cfg = _resolve_ll_qp_cfg(qp_cfg, ll_reduced, ll_qp_cfg, dtype)
    bsz = agent_initial.shape[0]
    sims, asts, mcarries = _init_lanes(motion_cfg, loop, model,
                                       agent_initial, dtype,
                                       stiction=stiction)
    ests = (_init_ests(est_cfg, model, sims, est_key)
            if est_cfg is not None else None)
    sims, asts, ests = _stand_phase(
        ll_cfg, motion_cfg, ll_qp_cfg, sim_cfg, loop, model, sims, asts,
        backend, tile, ll_reduced, est_cfg=est_cfg, ests=ests)

    trot_dom_ticks = float(motion_cfg.trot_dom_ticks)

    def domain_step(carry, dom_idx):
        sims, asts, mcarries, ok_cnt, ests = carry
        # HL replan inputs come from the controller's state view: the latest
        # estimate when estimation is in the loop, truth otherwise.
        q_view = sims.q if est_cfg is None else ests.q_hat
        qd_view = sims.qd if est_cfg is None else ests.qd_hat
        toe_xy = jax.vmap(
            lambda q: rbd.site_positions(model, q)[a1.TOE_SITES][:, 0:2].T
        )(q_view)
        contact_ind = jax.vmap(
            lambda a: motion_mod.next_trot_domain(a.con.des).astype(dtype)
        )(asts)
        out = mpc_batch.run_nmpc_batch(
            mpc_cfg, qp_cfg, mcarries, q_view[:, 0:2], qd_view[:, 0:2],
            toe_xy, contact_ind, pr_agent, prd_agent, agent_initial,
            pobs_real, backend=backend, tile=tile,
        )
        asts2 = jax.vmap(agent_mod.set_mpc_data)(asts, out.alpha_com, out.states)

        def ll_tick(carry, k):
            sims, asts, ests = carry
            phases = asts.loco_tick / trot_dom_ticks
            ests, qs, qds, forces = _ctrl_inputs(
                est_cfg, sim_cfg, model, ests, sims, phases)
            errsq = jnp.stack(
                [jnp.sum((qs[:, 0:3] - sims.q[:, 0:3]) ** 2, axis=-1),
                 jnp.sum((qds[:, 0:3] - sims.qd[:, 0:3]) ** 2, axis=-1)],
                axis=-1,
            )                                          # (B, 2)
            ll_outs, asts, _, d_b = _tick_batch(
                ll_cfg, motion_cfg, ll_qp_cfg, model, Gait.TROT, asts,
                qs, qds, forces, backend, tile,
                force_new_domain=(k == 0), allow_contact_trigger=False,
                reduced=ll_reduced, return_d=True,
            )
            if est_cfg is not None:
                ests = jax.vmap(pipeline.set_contact_ind)(ests, asts.con.ind)
            asts = asts._replace(
                mpc_available=jnp.logical_or(
                    asts.mpc_available, k >= loop.mpc_latency_ticks
                )
            )
            bf = None
            if push is not None:
                p_force, p_start, p_dur = push
                t = dom_idx * loop.ticks_per_domain + k
                on = jnp.logical_and(t >= p_start, t < p_start + p_dur)
                bf = p_force * on[:, None].astype(dtype)
            sims = wb.step_batch(
                sim_cfg, model, sims, ll_outs.tau,
                backend=("xla" if backend == "xla" else "fused"), tile=tile,
                d0=d_b if est_cfg is None else None,
                base_force=bf,
            )
            return (sims, asts, ests), (sims.q[:, 0:3], ll_outs.qp_converged,
                                        jnp.abs(ll_outs.tau).max(axis=-1),
                                        errsq)

        (sims, asts3, ests), (com, llok, taumax, errsq) = jax.lax.scan(
            ll_tick, (sims, asts2, ests), jnp.arange(loop.ticks_per_domain)
        )
        ok_cnt = ok_cnt + out.qp_converged.astype(jnp.int32)
        stats = jnp.stack(
            [jnp.max(taumax, axis=0), jnp.mean(llok.astype(dtype), axis=0)],
            axis=-1,
        )                                              # (B, 2)
        return (sims, asts3, out.carry, ok_cnt, ests), (
            com, stats, jnp.mean(errsq, axis=0))

    init_carry = (sims, asts, mcarries, jnp.zeros((bsz,), jnp.int32), ests)
    (sims, asts, mcarries, ok_cnt, ests), (com_hist, stats, errsq) = (
        jax.lax.scan(domain_step, init_carry, jnp.arange(loop.n_domains)))
    # com_hist: (n_domains, ticks, B, 3) -> (B, n_domains, ticks, 3)
    return LoopResult(
        sim=sims,
        agent=asts,
        com_hist=jnp.moveaxis(com_hist, 2, 0),
        qp_ok=jnp.mean(stats[:, :, 1], axis=0),
        mpc_ok=ok_cnt.astype(dtype) / loop.n_domains,
        tau_hist=jnp.moveaxis(stats, 1, 0),
        est_rmse=(jnp.sqrt(jnp.mean(errsq, axis=0))
                  if est_cfg is not None else None),
    )


def run_team(
    mpc_cfg: MpcConfig,
    ll_cfg: LowLevelConfig,
    motion_cfg: MotionConfig,
    qp_cfg: QpConfig,
    sim_cfg: wb.SimConfig,
    loop: LoopConfig,
    model: rbd.Model,
    pr,
    prd,
    agent_initials,
    pobs_real,
    dtype=jnp.float64,
):
    """Multi-agent full-fidelity loop: the whole-body analogue of the
    reference's 2-/4-agent sims (`src/A1_Sim.cpp`, `src/A1_Sim_4_agents.cpp`).

    Agents run as a vmapped axis; at each domain boundary every agent's NMPC
    receives its neighbor's broadcast 4-state (x, y, dx, dy) — the
    distributed coupling of the paper — and adds it as a CBF circle.

    pr, prd: (A, 2, T) per-agent reference tables;
    agent_initials: (A, 2) start positions.
    """
    from srbx import motion as motion_mod

    n_agents = agent_initials.shape[0]

    def init_one(a0):
        q0 = wb.default_crouch(model, dtype)
        q0 = q0.at[0:2].add(a0)
        sim = wb.SimState(q0, jnp.zeros((18,), dtype))
        ast = agent_mod.init(motion_cfg, model, q0, dtype)
        ast = ast._replace(planner=ast.planner._replace(
            stand_from=q0[0:3],
            dom_ticks=jnp.asarray(float(loop.stand_ticks), dtype)))
        return sim, ast, mpc_mod.init_carry(a0, dtype)

    sims, asts, mcarries = jax.vmap(init_one)(agent_initials)

    def stand_tick(carry, _):
        sims, asts = carry

        def one(sim, ast):
            force = wb.foot_force_measurement(sim_cfg, model, sim)
            ll_out, ast, _ = agent_mod.tick(
                ll_cfg, motion_cfg, qp_cfg, model, Gait.STAND, ast,
                sim.q, sim.qd, force)
            return wb.step(sim_cfg, model, sim, ll_out.tau), ast

        sims, asts = jax.vmap(one)(sims, asts)
        return (sims, asts), None

    (sims, asts), _ = jax.lax.scan(
        stand_tick, (sims, asts), None, length=loop.stand_ticks)

    def domain_step(carry, dom_idx):
        sims, asts, mcarries = carry
        # neighbor broadcast: each agent sees the next agent's 4-state
        states4 = jnp.concatenate([sims.q[:, 0:2], sims.qd[:, 0:2]], axis=1)
        others = jnp.roll(states4, shift=-1, axis=0)

        def replan(sim, ast, mcarry, other, a0, pr_a, prd_a):
            toe_xy = rbd.site_positions(model, sim.q)[a1.TOE_SITES][:, 0:2].T
            ci = motion_mod.next_trot_domain(ast.con.des).astype(dtype)
            out = mpc_mod.run_nmpc(
                mpc_cfg, qp_cfg, mcarry, sim.q[0:2], sim.qd[0:2], toe_xy,
                ci, pr_a, prd_a, a0, pobs_real,
                state_other=other, agent_circle_eps=mpc_cfg.cbf_eps,
            )
            return out

        outs = jax.vmap(replan)(sims, asts, mcarries, others,
                                agent_initials, pr, prd)
        asts = jax.vmap(agent_mod.set_mpc_data)(asts, outs.alpha_com, outs.states)

        def ll_tick(carry, k):
            sims, asts = carry

            def one(sim, ast):
                force = wb.foot_force_measurement(sim_cfg, model, sim)
                ll_out, ast, _ = agent_mod.tick(
                    ll_cfg, motion_cfg, qp_cfg, model, Gait.TROT, ast,
                    sim.q, sim.qd, force,
                    force_new_domain=(k == 0), allow_contact_trigger=False)
                ast = ast._replace(mpc_available=jnp.logical_or(
                    ast.mpc_available, k >= loop.mpc_latency_ticks))
                return wb.step(sim_cfg, model, sim, ll_out.tau), ast, ll_out.qp_converged

            sims, asts, ok = jax.vmap(one)(sims, asts)
            return (sims, asts), (sims.q[:, 0:3], ok)

        (sims, asts), (com, ok) = jax.lax.scan(
            ll_tick, (sims, asts), jnp.arange(loop.ticks_per_domain))
        return (sims, asts, outs.carry), (com[-1], outs.cbf_margin,
                                          jnp.mean(ok.astype(dtype)))

    (sims, asts, mcarries), (com_ends, margins, llok) = jax.lax.scan(
        domain_step, (sims, asts, mcarries), jnp.arange(loop.n_domains))
    return sims, com_ends, margins, llok


def run_team_batch(
    mpc_cfg: MpcConfig,
    ll_cfg: LowLevelConfig,
    motion_cfg: MotionConfig,
    qp_cfg: QpConfig,
    sim_cfg: wb.SimConfig,
    loop: LoopConfig,
    model: rbd.Model,
    pr,              # (S, A, 2, T)
    prd,             # (S, A, 2, T)
    agent_initials,  # (S, A, 2)
    pobs_real,       # (S, 2, n_obs)
    dtype=jnp.float64,
    backend: str = "fused",
    tile: int = 256,
    ll_reduced: bool = False,
    ll_qp_cfg: QpConfig | None = None,
    est_cfg=None,
    est_key=None,
):
    """Scenario-batched multi-agent team loop: run_team with a scenario
    axis, flattened to (S*A) solver lanes — whole-body multi-robot teams at
    campaign scale on one chip. Neighbor broadcast (the distributed CBF
    coupling) is a roll on the agent sub-axis of the lane axis; every
    1 kHz LL QP and every domain's NMPC across all scenarios and agents is
    ONE batched/fused solve.

    est_cfg (an `srbx.estimation.pipeline.EstConfig`): estimation in the
    loop PER ROBOT — each agent lane runs its own sensors + kinEst/KF
    pipeline, the LL ticks and HL replans consume estimates, and the
    neighbor 4-state each agent broadcasts is its ESTIMATE (on hardware the
    reference shares `q/dq` that kinEst0/1 wrote into the store, never
    truth: `driver_scripts/qp_only_exp.cpp:256,484` then SET_DATA at
    `:262-265`). Ground truth stays inside the plant+sensor model.

    Returns (sims, com_ends (D, S, A, 3), margins (D, S, A), llok (D, S));
    with est_cfg, a 5th element est_rmse (S, A, 2) is appended.
    """
    from srbx import mpc_batch
    from srbx import motion as motion_mod
    from srbx.estimation import pipeline

    ll_qp_cfg = _resolve_ll_qp_cfg(qp_cfg, ll_reduced, ll_qp_cfg, dtype)
    n_scen, n_agents = agent_initials.shape[0:2]
    n_lanes = n_scen * n_agents
    a0_l = agent_initials.reshape(n_lanes, 2).astype(dtype)
    pr_l = pr.reshape(n_lanes, 2, -1)
    prd_l = prd.reshape(n_lanes, 2, -1)
    pobs_l = jnp.repeat(pobs_real.astype(dtype), n_agents, axis=0)

    sims, asts, mcarries = _init_lanes(motion_cfg, loop, model, a0_l, dtype)
    ests = (_init_ests(est_cfg, model, sims, est_key)
            if est_cfg is not None else None)
    sims, asts, ests = _stand_phase(
        ll_cfg, motion_cfg, ll_qp_cfg, sim_cfg, loop, model, sims, asts,
        backend, tile, ll_reduced, est_cfg=est_cfg, ests=ests)

    trot_dom_ticks = float(motion_cfg.trot_dom_ticks)

    def domain_step(carry, dom_idx):
        sims, asts, mcarries, ests = carry
        # HL state view: per-robot estimates when estimation is in the
        # loop — including the broadcast neighbor 4-state, which on
        # hardware is the estimate the other robot wrote to the store
        q_view = sims.q if est_cfg is None else ests.q_hat
        qd_view = sims.qd if est_cfg is None else ests.qd_hat
        states4 = jnp.concatenate([q_view[:, 0:2], qd_view[:, 0:2]], axis=1)
        others = jnp.roll(
            states4.reshape(n_scen, n_agents, 4), shift=-1, axis=1
        ).reshape(n_lanes, 4)

        toe_xy = jax.vmap(
            lambda q: rbd.site_positions(model, q)[a1.TOE_SITES][:, 0:2].T
        )(q_view)
        contact_ind = jax.vmap(
            lambda a: motion_mod.next_trot_domain(a.con.des).astype(dtype)
        )(asts)
        out = mpc_batch.run_nmpc_batch(
            mpc_cfg, qp_cfg, mcarries, q_view[:, 0:2], qd_view[:, 0:2],
            toe_xy, contact_ind, pr_l, prd_l, a0_l, pobs_l,
            backend=backend, tile=tile,
            state_other=others, agent_circle_eps=mpc_cfg.cbf_eps,
        )
        asts2 = jax.vmap(agent_mod.set_mpc_data)(asts, out.alpha_com, out.states)

        def ll_tick(carry, k):
            sims, asts, ests = carry
            phases = asts.loco_tick / trot_dom_ticks
            ests, qs, qds, forces = _ctrl_inputs(
                est_cfg, sim_cfg, model, ests, sims, phases)
            if est_cfg is not None:
                errsq = jnp.stack(
                    [jnp.sum((qs[:, 0:3] - sims.q[:, 0:3]) ** 2, axis=-1),
                     jnp.sum((qds[:, 0:3] - sims.qd[:, 0:3]) ** 2, axis=-1)],
                    axis=-1,
                )                                  # (S*A, 2)
            else:
                errsq = jnp.zeros((n_lanes, 2), dtype)
            ll_outs, asts, _, d_b = _tick_batch(
                ll_cfg, motion_cfg, ll_qp_cfg, model, Gait.TROT, asts,
                qs, qds, forces, backend, tile,
                force_new_domain=(k == 0), allow_contact_trigger=False,
                reduced=ll_reduced, return_d=True,
            )
            if est_cfg is not None:
                ests = jax.vmap(pipeline.set_contact_ind)(ests, asts.con.ind)
            asts = asts._replace(mpc_available=jnp.logical_or(
                asts.mpc_available, k >= loop.mpc_latency_ticks))
            sims = wb.step_batch(
                sim_cfg, model, sims, ll_outs.tau,
                backend=("xla" if backend == "xla" else "fused"), tile=tile,
                d0=d_b if est_cfg is None else None,
            )
            return (sims, asts, ests), (ll_outs.qp_converged, errsq)

        (sims, asts3, ests), (ok, errsq) = jax.lax.scan(
            ll_tick, (sims, asts2, ests), jnp.arange(loop.ticks_per_domain)
        )
        com = sims.q[:, 0:3].reshape(n_scen, n_agents, 3)
        llok = jnp.mean(ok.astype(dtype), axis=0).reshape(n_scen, n_agents)
        return (sims, asts3, out.carry, ests), (
            com, out.cbf_margin.reshape(n_scen, n_agents), llok.mean(axis=1),
            jnp.mean(errsq, axis=0),
        )

    (sims, asts, mcarries, ests), (com_ends, margins, llok, errsq) = (
        jax.lax.scan(domain_step, (sims, asts, mcarries, ests),
                     jnp.arange(loop.n_domains)))
    if est_cfg is None:
        return sims, com_ends, margins, llok
    est_rmse = jnp.sqrt(jnp.mean(errsq, axis=0)).reshape(n_scen, n_agents, 2)
    return sims, com_ends, margins, llok, est_rmse


class EventBatchResult(NamedTuple):
    """run_batch_event result (all leading axis B)."""

    sim: wb.SimState
    agent: agent_mod.AgentState
    com_hist: jax.Array       # (B, n_ticks, 3)
    qp_ok: jax.Array          # (B,) fraction of converged LL QPs
    domains: jax.Array        # (B,) gait domains completed (int32)
    mpc_solves: jax.Array     # (B,) NMPC replans actually applied
    trigger_hist: jax.Array   # (B, n_ticks) bool — replan requested
    # estimation-in-the-loop only (est_cfg passed): per-lane RMSE of the
    # base-state estimate over the locomotion ticks, [pos (m), vel (m/s)]
    est_rmse: jax.Array | None = None   # (B, 2)


def run_batch_event(
    mpc_cfg: MpcConfig,
    ll_cfg: LowLevelConfig,
    motion_cfg: MotionConfig,
    qp_cfg: QpConfig,
    sim_cfg: wb.SimConfig,
    loop: LoopConfig,
    model: rbd.Model,
    pr_agent,        # (B, 2, T)
    prd_agent,       # (B, 2, T)
    agent_initial,   # (B, 2)
    pobs_real,       # (B, 2, n_obs)
    n_ticks: int,
    dtype=jnp.float64,
    backend: str = "fused",
    tile: int = 256,
    ll_reduced: bool = False,
    ll_qp_cfg: QpConfig | None = None,
    mpc_period_ticks: int = 1,
    est_cfg=None,
    est_key=None,
) -> EventBatchResult:
    """Batched GENUINELY EVENT-DRIVEN loop: per-lane contact/phase-overrun
    domain triggers (`src/LocoWrapper.cpp:165-200` semantics, per lane), not
    the fixed 172 ms cadence of run_batch.

    Mechanism: the scan runs over 1 kHz ticks. tick_build already computes
    each lane's trigger (`run_mpc`); the NMPC is evaluated for ALL lanes at
    the HL cadence (`mpc_period_ticks`; 1 = every tick, 20 = the reference's
    20 ms HL thread) under a lax.cond, and its output is APPLIED only to
    lanes whose trigger latched since the last HL poll — the batched,
    fixed-shape realization of event-driven replanning. The fused QP solve
    is so much cheaper than the whole-body tick that the discarded lanes
    cost a few percent. Between a lane's trigger and its solution delivery
    (`loop.mpc_latency_ticks` later), the LL runs on the stale-Bezier
    fallback, exactly the reference's real-time elasticity.

    est_cfg: ESTIMATION-AWARE event triggers — the contact debouncer (and
    hence the per-lane domain trigger) runs on the MEASURED foot force from
    the sensor model, and the LL ticks and HL replans consume the estimated
    (q̂, q̇̂), exactly the reference's deployable topology where ContactEst
    sees the hardware footForce and kinEst/KF produce the controller state
    (`src/ContactEst.cpp:20-67`, `src/LocoWrapper.cpp:193-200`,
    `driver_scripts/qp_only_exp.cpp:256,484`). Ground truth stays in the
    plant+sensor model; the result carries `est_rmse`.
    """
    from srbx import mpc_batch
    from srbx.estimation import pipeline

    ll_qp_cfg = _resolve_ll_qp_cfg(qp_cfg, ll_reduced, ll_qp_cfg, dtype)
    bsz = agent_initial.shape[0]
    sims, asts, mcarries = _init_lanes(motion_cfg, loop, model,
                                       agent_initial, dtype)
    ests = (_init_ests(est_cfg, model, sims, est_key)
            if est_cfg is not None else None)
    sims, asts, ests = _stand_phase(
        ll_cfg, motion_cfg, ll_qp_cfg, sim_cfg, loop, model, sims, asts,
        backend, tile, ll_reduced, est_cfg=est_cfg, ests=ests)

    latency = jnp.asarray(loop.mpc_latency_ticks, jnp.int32)
    trot_dom_ticks = float(motion_cfg.trot_dom_ticks)

    def hl_poll(args):
        """One HL invocation: batched NMPC for all lanes; masked apply.
        qs/qds are the controller's state view for this tick (estimates
        when estimation is in the loop)."""
        (sims, asts, mcarries, pend_alpha, pend_states, countdown,
         n_solves, req, qs, qds) = args
        toe_xy = jax.vmap(
            lambda q: rbd.site_positions(model, q)[a1.TOE_SITES][:, 0:2].T
        )(qs)
        # the triggering tick already advanced con.des to the NEW domain
        contact_ind = asts.con.des.astype(dtype)
        out = mpc_batch.run_nmpc_batch(
            mpc_cfg, qp_cfg, mcarries, qs[:, 0:2], qds[:, 0:2],
            toe_xy, contact_ind, pr_agent, prd_agent, agent_initial,
            pobs_real, backend=backend, tile=tile,
        )
        m = req
        mcarries = jax.tree.map(
            lambda n, o: jnp.where(
                m.reshape((bsz,) + (1,) * (n.ndim - 1)), n, o
            ),
            out.carry, mcarries,
        )
        pend_alpha = jnp.where(m[:, None, None], out.alpha_com, pend_alpha)
        pend_states = jnp.where(m[:, None, None], out.states, pend_states)
        countdown = jnp.where(m, latency, countdown)
        n_solves = n_solves + m.astype(jnp.int32)
        req = jnp.zeros_like(req)
        return (sims, asts, mcarries, pend_alpha, pend_states, countdown,
                n_solves, req, qs, qds)

    def tick_step(carry, k):
        (sims, asts, mcarries, pend_alpha, pend_states, countdown,
         n_solves, req, ests) = carry
        phases = asts.loco_tick / trot_dom_ticks
        ests, qs, qds, forces = _ctrl_inputs(
            est_cfg, sim_cfg, model, ests, sims, phases)
        # estimate-error accumulator only exists in the estimation path;
        # the ground-truth program is structurally unchanged (ADVICE r2)
        if est_cfg is not None:
            errsq = jnp.stack(
                [jnp.sum((qs[:, 0:3] - sims.q[:, 0:3]) ** 2, axis=-1),
                 jnp.sum((qds[:, 0:3] - sims.qd[:, 0:3]) ** 2, axis=-1)],
                axis=-1,
            )                                      # (B, 2)
        else:
            errsq = jnp.zeros((qs.shape[0], 2), qs.dtype)
        ll_outs, asts, run_mpc, d_b = _tick_batch(
            ll_cfg, motion_cfg, ll_qp_cfg, model, Gait.TROT, asts,
            qs, qds, forces, backend, tile,
            force_new_domain=(k == 0), allow_contact_trigger=True,
            reduced=ll_reduced, return_d=True,
        )
        if est_cfg is not None:
            ests = jax.vmap(pipeline.set_contact_ind)(ests, asts.con.ind)
        req = jnp.logical_or(req, run_mpc)

        state = (sims, asts, mcarries, pend_alpha, pend_states, countdown,
                 n_solves, req, qs, qds)
        state = jax.lax.cond(
            jnp.logical_and(k % mpc_period_ticks == 0, req.any()),
            hl_poll, lambda a: a, state,
        )
        (sims, asts, mcarries, pend_alpha, pend_states, countdown,
         n_solves, req, _, _) = state

        # delivery: countdown reaches 0 -> the lane gets its fresh solution
        deliver = countdown == 0
        asts = asts._replace(
            mpc_alpha=jnp.where(deliver[:, None, None], pend_alpha,
                                asts.mpc_alpha),
            mpc_states=jnp.where(deliver[:, None, None], pend_states,
                                 asts.mpc_states),
            mpc_available=jnp.logical_or(asts.mpc_available, deliver),
        )
        countdown = jnp.where(countdown >= 0, countdown - 1, countdown)

        sims = wb.step_batch(
            sim_cfg, model, sims, ll_outs.tau,
            backend=("xla" if backend == "xla" else "fused"), tile=tile,
            d0=d_b if est_cfg is None else None,
        )
        carry = (sims, asts, mcarries, pend_alpha, pend_states, countdown,
                 n_solves, req, ests)
        return carry, (sims.q[:, 0:3], ll_outs.qp_converged, run_mpc, errsq)

    init = (
        sims, asts, mcarries,
        jnp.zeros((bsz, 4, 5), dtype), jnp.zeros((bsz, 4, 4), dtype),
        jnp.full((bsz,), -1, jnp.int32), jnp.zeros((bsz,), jnp.int32),
        jnp.zeros((bsz,), bool), ests,
    )
    carry, (com, llok, trig, errsq) = jax.lax.scan(
        tick_step, init, jnp.arange(n_ticks)
    )
    sims, asts, mcarries = carry[0:3]
    n_solves = carry[6]
    return EventBatchResult(
        sim=sims,
        agent=asts,
        com_hist=jnp.moveaxis(com, 1, 0),
        qp_ok=jnp.mean(llok.astype(dtype), axis=0),
        domains=asts.gait_domain,
        mpc_solves=n_solves,
        trigger_hist=jnp.moveaxis(trig, 1, 0),
        est_rmse=(jnp.sqrt(jnp.mean(errsq, axis=0))
                  if est_cfg is not None else None),
    )


class VelocityGaitResult(NamedTuple):
    sim: wb.SimState
    agent: agent_mod.AgentState
    com_hist: jax.Array       # (B, n_ticks, 3)
    qp_ok: jax.Array          # (B,)
    domains: jax.Array        # (B,)


def run_velocity_gait(
    gait: Gait,
    ll_cfg: LowLevelConfig,
    motion_cfg: MotionConfig,
    qp_cfg: QpConfig,
    sim_cfg: wb.SimConfig,
    loop: LoopConfig,
    model: rbd.Model,
    agent_initial,   # (B, 2)
    n_ticks: int,
    dtype=jnp.float64,
    backend: str = "fused",
    tile: int = 256,
    ll_reduced: bool = False,
    ll_qp_cfg: QpConfig | None = None,
) -> VelocityGaitResult:
    """Batched MPC-less velocity-commanded gait (WALK / PACE): stand-up,
    then per-lane contact/phase-triggered domains under the gait's own
    Raibert stepping with the ramped `motion_cfg.fwd_speed`/`lat_speed`
    command — the reference's `MotionPlanner` WALK/PACE modes
    (`src/MotionPlanner.cpp:188-226,269-305`) closed through the full
    18-DoF plant. Also drives the in-place bring-up gaits (INPLACE_TROT /
    INPLACE_WALK / TAP, `:155-187`), which hold the COM at the stand
    target while cycling stance tables."""
    assert gait in (Gait.WALK, Gait.PACE, Gait.INPLACE_TROT,
                    Gait.INPLACE_WALK, Gait.TAP, Gait.POSE)
    ll_qp_cfg = _resolve_ll_qp_cfg(qp_cfg, ll_reduced, ll_qp_cfg, dtype)
    sims, asts, _ = _init_lanes(motion_cfg, loop, model, agent_initial, dtype)
    sims, asts, _ = _stand_phase(ll_cfg, motion_cfg, ll_qp_cfg, sim_cfg, loop,
                                 model, sims, asts, backend, tile, ll_reduced)

    def tick(carry, k):
        sims, asts = carry
        forces = jax.vmap(
            lambda s: wb.foot_force_measurement(sim_cfg, model, s)
        )(sims)
        ll_outs, asts, _, d_b = _tick_batch(
            ll_cfg, motion_cfg, ll_qp_cfg, model, gait, asts,
            sims.q, sims.qd, forces, backend, tile,
            force_new_domain=(k == 0), allow_contact_trigger=True,
            reduced=ll_reduced, return_d=True,
        )
        sims = wb.step_batch(
            sim_cfg, model, sims, ll_outs.tau,
            backend=("xla" if backend == "xla" else "fused"), tile=tile,
            d0=d_b,
        )
        return (sims, asts), (sims.q[:, 0:3], ll_outs.qp_converged)

    (sims, asts), (com, llok) = jax.lax.scan(
        tick, (sims, asts), jnp.arange(n_ticks)
    )
    return VelocityGaitResult(
        sim=sims,
        agent=asts,
        com_hist=jnp.moveaxis(com, 1, 0),
        qp_ok=jnp.mean(llok.astype(dtype), axis=0),
        domains=asts.gait_domain,
    )
