"""Produce the repo's visualization artifacts (docs/viz_*.png / .gif).

Runs real closed loops and renders them with srbx.viz — the offline
replacement for the reference's OgreVis window (`src/A1_Sim.cpp:825-857`)
and MATLAB plots (`matlab_scripts/PlotHLReference.m`):

1. whole-body WALK through the 18-DoF plant (stand-up + velocity-commanded
   gait, full LL-QP every tick) -> ghosted pose strip + GIF;
2. a 32-scenario template CBF-NMPC campaign -> top-view trajectory/obstacle
   plot.

CPU f64; ~2 min. Usage: python scripts/render_demo.py
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from srbx import refplan, viz
from srbx.config import (Gait, LowLevelConfig, MotionConfig, MpcConfig,
                         QpConfig)
from srbx.eval import campaign
from srbx.models import a1
from srbx.sim import closedloop as cl
from srbx.sim import wholebody as wb

DOCS = pathlib.Path(__file__).resolve().parent.parent / "docs"


def wholebody_walk_qhist(n_ticks=2400):
    """run_velocity_gait's loop, recording the full q trajectory."""
    model = a1.model()
    dtype = jnp.float64
    import dataclasses
    ll_cfg, sim_cfg = LowLevelConfig(), wb.SimConfig()
    mo = dataclasses.replace(MotionConfig(), fwd_speed=0.15)
    loop = cl.LoopConfig(stand_ticks=400)
    qp_cfg = QpConfig(abstol=2e-3, reltol=1e-4, reg_primal=1e-6,
                      reg_dual=1e-6, max_iters=12)
    ll_qp = cl._resolve_ll_qp_cfg(qp_cfg, True, None, dtype)
    a0 = jnp.zeros((1, 2), dtype)

    def go():
        sims, asts, _ = cl._init_lanes(mo, loop, model, a0, dtype)
        sims, asts, _ = cl._stand_phase(ll_cfg, mo, ll_qp, sim_cfg, loop,
                                        model, sims, asts, "xla", 256, True)

        def tick(carry, k):
            sims, asts = carry
            forces = jax.vmap(
                lambda s: wb.foot_force_measurement(sim_cfg, model, s))(sims)
            ll_outs, asts, _, d_b = cl._tick_batch(
                ll_cfg, mo, ll_qp, model, Gait.WALK, asts,
                sims.q, sims.qd, forces, "xla", 256,
                force_new_domain=(k == 0), allow_contact_trigger=True,
                reduced=True, return_d=True)
            sims = wb.step_batch(sim_cfg, model, sims, ll_outs.tau,
                                 backend="xla", tile=256, d0=d_b)
            return (sims, asts), sims.q[0]

        _, q_hist = jax.lax.scan(tick, (sims, asts), jnp.arange(n_ticks))
        return q_hist

    return np.asarray(jax.jit(go)()), model


def main():
    print("[1] whole-body WALK rollout (18-DoF plant, LL-QP every tick)")
    q_hist, model = wholebody_walk_qhist()
    print(f"    final COM x = {q_hist[-1, 0]:.3f} m over {len(q_hist)} ticks")
    viz.render_wholebody(model, q_hist, DOCS / "viz_wholebody_walk.png",
                         n_ghosts=6)
    viz.animate_wholebody(model, q_hist, DOCS / "viz_wholebody_walk.gif",
                          stride=40, fps=12)
    print(f"    wrote {DOCS / 'viz_wholebody_walk.png'} + .gif")

    print("[2] 32-scenario template CBF-NMPC campaign")
    cfg = MpcConfig(use_sqp=True, sqp_iters=2)
    camp = campaign.CampaignConfig(n_agents=2, n_domains=120)
    ref_cfg = refplan.two_agent_config()
    res = jax.jit(lambda k: campaign.run_campaign_batch(
        cfg, QpConfig(), camp, ref_cfg, jnp.asarray([0.0, 0.5, 0.0, -0.5]),
        k, 32, backend="xla"))(jax.random.key(1234))
    k_obs, _ = jax.random.split(jax.random.key(1234))
    _, pobs_real = campaign.sample_obstacles(
        k_obs, 32, camp.n_obstacles, camp.obstacle_uncertainty)
    viz.plot_team_campaign(
        np.asarray(res.traj), np.asarray(pobs_real),
        DOCS / "viz_campaign.png", success=np.asarray(res.success))
    print(f"    success {np.asarray(res.success).mean():.3f}; "
          f"wrote {DOCS / 'viz_campaign.png'}")


if __name__ == "__main__":
    main()
