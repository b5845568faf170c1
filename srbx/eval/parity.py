"""Instance capture for the iSWIFT cross-validation study (VERDICT r3 #1).

Captures the EXACT QP instances srbx's closed loops assemble — NMPC
template QPs from the campaign loop and 1 kHz low-level QPs from the
whole-body loop — so they can be solved by the *reference's own* vendored
iSWIFT solver (srbx.eval.iswift_ref) and diffed against srbx.ops.qp.

Two capture paths:

  * `capture_nmpc_instances` replays the template campaign's per-domain
    cycle (srbx.eval.campaign.run_scenario) and records the
    (x0, ref, foothold_xy, ci) quadruple of every agent-cycle via
    `mpc.nmpc_qp_inputs` — the same function run_nmpc itself calls — then
    re-assembles the padded QPs with `ocp.assemble`.  Both contact modes
    appear naturally (4-contact at gait_domain<=1, 2-contact trot after).
  * `capture_ll_instances` replays the whole-body loop (stand + trot
    domains, `closedloop.run` semantics) recording the LL QP operands of
    every tick from `agent.tick_build` (reduced n=25 or full n=43).

`compact_rows` drops structurally inert padded rows (all-zero A rows with
b=0, all-zero G rows) before handing an instance to iSWIFT: the reference
wrapper never produces empty constraint rows (it assembles compact,
contact-dependent shapes, `src/MPC_dist.cpp:132-135`), and iSWIFT's
formkktmatrix_full skips the -I diagonal entry for an empty G row
(`optimization/iSWIFT/src/Auxilary.c:115-126`), which would leave the KKT
matrix singular in that column.  Dropping a 0·x=0 / 0·x<=h row is the
identity on the solution set.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from srbx import agent as agent_mod
from srbx import mpc as mpc_mod
from srbx import ocp, refplan
from srbx.config import (Gait, LowLevelConfig, MotionConfig, MpcConfig,
                         QpConfig)
from srbx.eval import campaign
from srbx.models import a1, rbd
from srbx.sim import wholebody as wb


class NmpcInputs(NamedTuple):
    """Per-cycle assemble() inputs, leading axis = instance."""

    x0: jax.Array          # (B, 4)
    ref: jax.Array         # (B, 4, N)
    foothold_xy: jax.Array  # (B, 2, 4)
    ci: jax.Array          # (B, 4)


def capture_nmpc_instances(cfg: MpcConfig, qp_cfg: QpConfig,
                           n_scenarios: int, n_domains: int,
                           seed: int = 0, dtype=jnp.float64) -> NmpcInputs:
    """Replay the 2-agent template campaign, recording every agent-cycle's
    QP inputs. Returns n_scenarios * n_domains * 2 instances."""
    camp = campaign.CampaignConfig(n_domains=n_domains)
    na = camp.n_agents
    key = jax.random.PRNGKey(seed)
    kobs, krun = jax.random.split(key)
    pobs, pobs_real_all = campaign.sample_obstacles(
        kobs, n_scenarios, camp.n_obstacles)
    p_start = jnp.asarray([0.0, 0.5, 0.0, -0.5], dtype)
    agent0 = p_start.reshape(na, 2)
    contacts = campaign._contact_table(n_domains, dtype)

    def one_scenario(pobs_s, pobs_real, key_s):
        ref = refplan.generate(refplan.two_agent_config(), p_start, pobs_s,
                               dtype=dtype)
        pr = ref.pr.reshape(na, 2, -1)
        prd = ref.prd.reshape(na, 2, -1)

        def agent_cycle(carry_a, q_a, dq_a, ci, other, init_a, pr_a, prd_a):
            return mpc_mod.run_nmpc(
                cfg, qp_cfg, carry_a, q_a, dq_a,
                ocp.default_footholds(q_a), ci, pr_a, prd_a, init_a,
                pobs_real, state_other=other,
                agent_circle_eps=cfg.cbf_eps if camp.inter_agent_cbf else 0.0)

        def step(carry, inp):
            carries, q, dq = carry
            ci, _key_d = inp
            other = jnp.roll(jnp.concatenate([q, dq], axis=1), -1, axis=0)
            # record the quadruple run_nmpc will assemble from
            rec = jax.vmap(
                lambda c_a, q_a, dq_a, init_a, pr_a, prd_a:
                mpc_mod.nmpc_qp_inputs(
                    cfg, c_a, q_a, dq_a, ocp.default_footholds(q_a), ci,
                    pr_a, prd_a, init_a),
                in_axes=(0, 0, 0, 0, 0, 0),
            )(carries, q, dq, agent0, pr, prd)
            out = jax.vmap(agent_cycle, in_axes=(0, 0, 0, None, 0, 0, 0, 0))(
                carries, q, dq, ci, other, agent0, pr, prd)
            q_n = out.states[:, -1, jnp.asarray([0, 2])]
            dq_n = out.states[:, -1, jnp.asarray([1, 3])]
            return (out.carry, q_n, dq_n), rec

        carries0 = jax.vmap(lambda a: mpc_mod.init_carry(a, dtype))(agent0)
        keys = jax.random.split(key_s, n_domains)
        _, recs = jax.lax.scan(
            step, (carries0, agent0, jnp.zeros((na, 2), dtype)),
            (contacts, keys))
        return recs                     # each leaf (n_domains, na, ...)

    keys = jax.random.split(krun, n_scenarios)
    recs = jax.jit(jax.vmap(one_scenario))(
        pobs.astype(dtype), pobs_real_all.astype(dtype), keys)
    flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[3:]), recs)
    return NmpcInputs(*flat)


def assemble_nmpc(cfg: MpcConfig, inputs: NmpcInputs, dtype=jnp.float64):
    """ocp.assemble over captured inputs -> stacked padded OcpData."""
    return jax.jit(jax.vmap(
        lambda x0, ref, fh, ci: ocp.assemble(
            cfg, x0.astype(dtype), ref.astype(dtype), fh.astype(dtype),
            ci.astype(dtype), dtype=dtype)
    ))(inputs.x0, inputs.ref, inputs.foothold_xy, inputs.ci)


def capture_ll_instances(ll_cfg: LowLevelConfig, motion_cfg: MotionConfig,
                         qp_cfg: QpConfig, sim_cfg: wb.SimConfig,
                         mpc_cfg: MpcConfig, model: rbd.Model,
                         n_domains: int = 4, stand_ticks: int = 300,
                         ticks_per_domain: int = 172, reduced: bool = True,
                         seed: int = 0, dtype=jnp.float64):
    """Replay the single-lane whole-body loop (stand + trot with NMPC plans,
    `closedloop.run` semantics) and record the LL QP operands of EVERY tick.

    Returns (data, stand_count) where data is an LLQpData-shaped tuple of
    stacked arrays with leading axis stand_ticks + n_domains*ticks_per_domain
    (stand ticks first)."""
    from srbx import motion as motion_mod

    key = jax.random.PRNGKey(seed)
    pobs_real = campaign.sample_obstacles(key, 1, 4)[1][0].astype(dtype)
    starts = jnp.asarray([0.0, 0.5, 0.0, -0.5], dtype)
    p_start = starts[0:2]
    ref = refplan.generate(refplan.two_agent_config(), starts,
                           pobs_real, dtype=dtype)
    pr_agent, prd_agent = ref.pr[0:2], ref.prd[0:2]

    q0 = wb.default_crouch(model, dtype).at[0:2].add(p_start)
    sim = wb.SimState(q0, jnp.zeros((18,), dtype))
    ast = agent_mod.init(motion_cfg, model, q0, dtype)
    ast = ast._replace(planner=ast.planner._replace(
        stand_from=q0[0:3],
        dom_ticks=jnp.asarray(float(stand_ticks), dtype)))
    mcarry = mpc_mod.init_carry(p_start, dtype)

    def one_tick(sim, ast, gait, force_new_domain):
        force = wb.foot_force_measurement(sim_cfg, model, sim)
        data, ctx = agent_mod.tick_build(
            ll_cfg, motion_cfg, model, gait, ast, sim.q, sim.qd, force,
            force_new_domain=force_new_domain, allow_contact_trigger=False,
            reduced=reduced)
        from srbx.ops import qp
        with jax.default_matmul_precision("highest"):
            sol = qp.solve(data.P, data.c, data.A, data.b, data.G, data.h,
                           qp_cfg)
        ll_out, ast, _ = agent_mod.tick_finish(
            ll_cfg, ctx, sim.q, sim.qd, sol.x, sol.converged,
            reduced=reduced)
        sim = wb.step(sim_cfg, model, sim, ll_out.tau)
        return sim, ast, data

    def stand_tick(carry, _):
        sim, ast = carry
        sim, ast, data = one_tick(sim, ast, Gait.STAND, None)
        return (sim, ast), data

    (sim, ast), stand_data = jax.lax.scan(
        stand_tick, (sim, ast), None, length=stand_ticks)

    def domain_step(carry, dom_idx):
        sim, ast, mcarry = carry
        toe_xy = rbd.site_positions(model, sim.q)[a1.TOE_SITES][:, 0:2].T
        contact_ind = motion_mod.next_trot_domain(ast.con.des).astype(dtype)
        out = mpc_mod.run_nmpc(
            mpc_cfg, qp_cfg, mcarry, sim.q[0:2], sim.qd[0:2], toe_xy,
            contact_ind, pr_agent, prd_agent, p_start, pobs_real)
        ast2 = agent_mod.set_mpc_data(ast, out.alpha_com, out.states)

        def ll_tick(carry, k):
            sim, ast = carry
            sim, ast, data = one_tick(sim, ast, Gait.TROT, k == 0)
            ast = ast._replace(mpc_available=jnp.logical_or(
                ast.mpc_available, k >= 0))
            return (sim, ast), data

        (sim, ast3), data = jax.lax.scan(
            ll_tick, (sim, ast2), jnp.arange(ticks_per_domain))
        return (sim, ast3, out.carry), data

    (_, _, _), trot_data = jax.lax.scan(
        domain_step, (sim, ast, mcarry), jnp.arange(n_domains))
    trot_flat = jax.tree.map(
        lambda x: x.reshape((-1,) + x.shape[2:]), trot_data)
    data = jax.tree.map(
        lambda a, b: jnp.concatenate([a, b], axis=0), stand_data, trot_flat)
    return data, stand_ticks


def compact_rows(P, c, A, b, G, h, tol: float = 0.0):
    """Drop structurally inert padded rows for iSWIFT (see module doc).
    numpy in / numpy out, single instance."""
    A = np.asarray(A)
    b = np.asarray(b)
    G = np.asarray(G)
    h = np.asarray(h)
    keep_a = (np.abs(A).max(axis=1) > tol) | (np.abs(b) > tol)
    keep_g = np.abs(G).max(axis=1) > tol
    return (np.asarray(P), np.asarray(c), A[keep_a], b[keep_a],
            G[keep_g], h[keep_g])
