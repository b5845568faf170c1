"""Generate the self-golden regression fixtures (docs/golden/golden.json).

The reference's checked-in logs can't serve as golden tests (their inputs —
obstacle draws, x0 — were never recorded; VERDICT r1 §weak-5), so the repo
freezes ITS OWN behavior at fixed seeds: future rounds detect drift in the
NMPC cycle, the template campaign, and the whole-body closed loop via
tolerance-checked comparisons (tests/test_golden.py).

Regenerate ONLY on an intentional behavior change:
    ./runtests.sh --slow tests/test_golden.py   # confirm what moved
    JAX_PLATFORMS=cpu python scripts/make_golden.py
and say why in the commit message.

Everything runs on CPU in f64 (except the NMPC-cycle fixture, which uses the
production f32 path of __graft_entry__.entry) so fixtures are
platform-independent to the stated tolerances.
"""
import json
import os
import sys

# Environment setup runs ONLY in script mode: tests import this module's
# _*_args fixture builders and must not have their session's backends
# cleared or configs flipped at import time.
if __name__ == "__main__":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")
    try:
        import jax.extend.backend as _jeb

        _jeb.clear_backends()
    except Exception:
        pass
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "golden", "golden.json")


def golden_nmpc_cycle():
    """First 4 lanes of the production batched NMPC cycle (f32, the
    __graft_entry__ shapes): states (4, 4, 4) + alpha (4, 4, 5)."""
    import __graft_entry__ as g

    fn, args = g.entry()
    states, alpha = jax.jit(fn)(*args)
    return {
        "states": np.asarray(states[:4], np.float64).tolist(),
        "alpha_com": np.asarray(alpha[:4], np.float64).tolist(),
    }


def golden_template_campaign():
    """Template (LIP) campaign, 32 scenarios x 8 domains, fixed key: success
    mask, min clearances, final positions."""
    from srbx import refplan
    from srbx.config import MpcConfig, QpConfig
    from srbx.eval import campaign

    cfg = MpcConfig(use_sqp=True, sqp_iters=2)
    qp_cfg = QpConfig()
    camp = campaign.CampaignConfig(n_agents=2, n_domains=8)
    ref_cfg = refplan.two_agent_config(loop_size=4_000)
    p_start = jnp.asarray([0.0, 0.5, 0.0, -0.5])
    res = jax.jit(lambda k: campaign.run_campaign_batch(
        cfg, qp_cfg, camp, ref_cfg, p_start, k, 32, backend="xla"))(
            jax.random.key(1234))
    return {
        "success": np.asarray(res.success).astype(int).tolist(),
        "min_clearance": np.asarray(res.min_clearance).round(9).tolist(),
        "final_xy": np.asarray(res.final_xy).round(9).tolist(),
        "qp_ok_frac": np.asarray(res.qp_ok_frac).round(9).tolist(),
    }


def golden_wholebody_trajectory():
    """4-domain whole-body closed loop (B=2 lanes, no obstacles): COM
    trajectory subsampled every 20 ticks + final generalized state."""
    from srbx import refplan
    from srbx.config import (LowLevelConfig, MotionConfig, MpcConfig,
                             QpConfig)
    from srbx.models import a1
    from srbx.sim import closedloop, wholebody as wb

    model = a1.model()
    traj = refplan.generate(
        refplan.two_agent_config(loop_size=20_000),
        jnp.asarray([0.0, 0.0, 0.0, -1.0]),
        jnp.full((2, 20), 100.0))
    B = 2
    loop = closedloop.LoopConfig(stand_ticks=300, n_domains=4,
                                 ticks_per_domain=172)
    pr = jnp.stack([traj.pr[0:2]] * B)
    prd = jnp.stack([traj.prd[0:2]] * B)
    a0 = jnp.asarray([[0.0, 0.0], [0.0, -1.0]])
    pobs = jnp.full((B, 2, 20), 100.0)
    res = jax.jit(lambda: closedloop.run_batch(
        MpcConfig(use_sqp=False), LowLevelConfig(), MotionConfig(),
        QpConfig(), wb.SimConfig(), loop, model, pr, prd, a0, pobs,
        backend="xla"))()
    com = np.asarray(res.com_hist)          # (B, 4, 172, 3)
    return {
        "com_subsampled": com[:, :, ::20, :].round(9).tolist(),
        "final_q": np.asarray(res.sim.q).round(9).tolist(),
        "qp_ok": np.asarray(res.qp_ok).round(9).tolist(),
    }


def _event_loop_args():
    """Shared setup for the event-loop fixture (also used by the test)."""
    from srbx import refplan
    from srbx.config import (LowLevelConfig, MotionConfig, MpcConfig,
                             QpConfig)
    from srbx.models import a1
    from srbx.sim import closedloop, wholebody as wb

    model = a1.model()
    traj = refplan.generate(
        refplan.two_agent_config(loop_size=20_000),
        jnp.asarray([0.0, 0.0, 0.0, -1.0]),
        jnp.full((2, 20), 100.0))
    B = 2
    loop = closedloop.LoopConfig(stand_ticks=300, n_domains=4,
                                 ticks_per_domain=172)
    kw = dict(
        pr_agent=jnp.stack([traj.pr[0:2]] * B),
        prd_agent=jnp.stack([traj.prd[0:2]] * B),
        agent_initial=jnp.asarray([[0.0, 0.0], [0.0, -1.0]]),
        pobs_real=jnp.full((B, 2, 20), 100.0),
        n_ticks=500, backend="xla", mpc_period_ticks=20,
    )
    return (MpcConfig(use_sqp=False), LowLevelConfig(), MotionConfig(),
            QpConfig(), wb.SimConfig(), loop, model), kw


def golden_event_loop():
    """Event-DRIVEN whole-body loop (per-lane contact/phase triggers, 20 ms
    HL poll): trigger tick pattern, domains/solves, subsampled COM."""
    from srbx.sim import closedloop

    cfgs, kw = _event_loop_args()
    res = jax.jit(lambda: closedloop.run_batch_event(*cfgs, **kw))()
    trig = np.asarray(res.trigger_hist)
    return {
        "trigger_ticks": [np.nonzero(t)[0].tolist() for t in trig],
        "domains": np.asarray(res.domains).tolist(),
        "mpc_solves": np.asarray(res.mpc_solves).tolist(),
        "com_subsampled": np.asarray(res.com_hist)[:, ::20, :]
        .round(9).tolist(),
        "final_q": np.asarray(res.sim.q).round(9).tolist(),
        "qp_ok": np.asarray(res.qp_ok).round(9).tolist(),
    }


def _est_loop_args():
    """Shared setup for the estimation-in-the-loop fixture."""
    from srbx import refplan
    from srbx.config import (LowLevelConfig, MotionConfig, MpcConfig,
                             QpConfig)
    from srbx.estimation import pipeline
    from srbx.models import a1
    from srbx.sim import closedloop, wholebody as wb

    model = a1.model()
    traj = refplan.generate(
        refplan.two_agent_config(loop_size=20_000),
        jnp.asarray([0.0, 0.0, 0.0, -1.0]),
        jnp.full((2, 20), 100.0))
    B = 2
    loop = closedloop.LoopConfig(stand_ticks=300, n_domains=3,
                                 ticks_per_domain=172)
    kw = dict(
        pr_agent=jnp.stack([traj.pr[0:2]] * B),
        prd_agent=jnp.stack([traj.prd[0:2]] * B),
        agent_initial=jnp.asarray([[0.0, 0.0], [0.0, -1.0]]),
        pobs_real=jnp.full((B, 2, 20), 100.0),
        backend="xla",
        est_cfg=pipeline.EstConfig(),
        est_key=jax.random.PRNGKey(2024),
    )
    return (MpcConfig(use_sqp=False), LowLevelConfig(), MotionConfig(),
            QpConfig(), wb.SimConfig(), loop, model), kw


def golden_est_loop():
    """run_batch with ESTIMATION IN THE LOOP at a fixed sensor key: frozen
    per-lane RMSE + trajectory (drift in sensors/kinEst/KF moves this)."""
    from srbx.sim import closedloop

    cfgs, kw = _est_loop_args()
    res = jax.jit(lambda: closedloop.run_batch(*cfgs, **kw))()
    return {
        "est_rmse": np.asarray(res.est_rmse).round(9).tolist(),
        "com_subsampled": np.asarray(res.com_hist)[:, :, ::20, :]
        .round(9).tolist(),
        "final_q": np.asarray(res.sim.q).round(9).tolist(),
        "qp_ok": np.asarray(res.qp_ok).round(9).tolist(),
    }


def _team_args():
    """Shared setup for the 4-agent team fixture (1 scenario x 4 agents)."""
    from srbx import refplan
    from srbx.config import (LowLevelConfig, MotionConfig, MpcConfig,
                             QpConfig)
    from srbx.models import a1
    from srbx.sim import closedloop, wholebody as wb

    model = a1.model()
    p_start = jnp.asarray([0.0, 1.5, 0.0, 0.5, 0.0, -0.5, 0.0, -1.5])
    pobs = jnp.stack([
        jnp.linspace(3.0, 8.0, 20), jnp.linspace(-2.0, 2.0, 20)])
    ref = refplan.generate(refplan.four_agent_config(loop_size=20_000),
                           p_start, pobs)
    loop = closedloop.LoopConfig(stand_ticks=300, n_domains=2,
                                 ticks_per_domain=172)
    kw = dict(
        pr=ref.pr.reshape(1, 4, 2, -1),
        prd=ref.prd.reshape(1, 4, 2, -1),
        agent_initials=p_start.reshape(1, 4, 2),
        pobs_real=pobs.reshape(1, 2, -1),
        backend="xla", ll_reduced=True,
    )
    return (MpcConfig(use_sqp=True, sqp_iters=1), LowLevelConfig(),
            MotionConfig(), QpConfig(), wb.SimConfig(), loop, model), kw


def golden_team():
    """4-agent whole-body team (neighbor CBF circles): per-domain margins,
    COM endpoints, LL-QP convergence."""
    from srbx.sim import closedloop

    cfgs, kw = _team_args()
    sims, com_ends, margins, llok = jax.jit(
        lambda: closedloop.run_team_batch(*cfgs, **kw))()
    return {
        "com_ends": np.asarray(com_ends).round(9).tolist(),
        "margins": np.asarray(margins).round(9).tolist(),
        "llok": np.asarray(llok).round(9).tolist(),
        "final_q": np.asarray(sims.q).round(9).tolist(),
    }


GENERATORS = {
    "nmpc_cycle": golden_nmpc_cycle,
    "template_campaign": golden_template_campaign,
    "wholebody_trajectory": golden_wholebody_trajectory,
    "event_loop": golden_event_loop,
    "est_loop": golden_est_loop,
    "team": golden_team,
}

if __name__ == "__main__":
    # optional section names: regenerate only those, merging into the
    # existing file (default: all)
    names = sys.argv[1:] or list(GENERATORS)
    golden = {}
    if os.path.exists(OUT) and sys.argv[1:]:
        with open(OUT) as f:
            golden = json.load(f)
    for name in names:
        print(f"generating {name} ...", flush=True)
        golden[name] = GENERATORS[name]()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(golden, f)
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")
