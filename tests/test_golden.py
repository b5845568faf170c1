"""Self-golden regression pack: behavior at fixed seeds is frozen in
docs/golden/golden.json (scripts/make_golden.py) so later rounds detect
silent drift in the NMPC cycle, the template campaign, and the whole-body
closed loop. Regenerate the fixtures ONLY for an intentional behavior change
(see make_golden.py header)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "docs", "golden",
                      "golden.json")


def _load(section):
    with open(GOLDEN) as f:
        return json.load(f)[section]


def test_golden_nmpc_cycle():
    """Production batched NMPC cycle (f32 path): first 4 lanes match the
    frozen solution. f32 tolerance: the fixture was generated on CPU; TPU
    or XLA-version drift beyond 1e-4 on O(1) states is a real change."""
    import __graft_entry__ as g

    gold = _load("nmpc_cycle")
    fn, args = g.entry()
    states, alpha = jax.jit(fn)(*args)
    np.testing.assert_allclose(
        np.asarray(states[:4], np.float64), np.asarray(gold["states"]),
        atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(alpha[:4], np.float64), np.asarray(gold["alpha_com"]),
        atol=1e-4)


def test_golden_template_campaign():
    """32-scenario template campaign at key 1234: success mask exact,
    clearances/positions to f64 re-run tolerance."""
    from srbx import refplan
    from srbx.config import MpcConfig, QpConfig
    from srbx.eval import campaign

    gold = _load("template_campaign")
    cfg = MpcConfig(use_sqp=True, sqp_iters=2)
    qp_cfg = QpConfig()
    camp = campaign.CampaignConfig(n_agents=2, n_domains=8)
    ref_cfg = refplan.two_agent_config(loop_size=4_000)
    p_start = jnp.asarray([0.0, 0.5, 0.0, -0.5])
    res = jax.jit(lambda k: campaign.run_campaign_batch(
        cfg, qp_cfg, camp, ref_cfg, p_start, k, 32, backend="xla"))(
            jax.random.key(1234))
    np.testing.assert_array_equal(
        np.asarray(res.success).astype(int), np.asarray(gold["success"]))
    np.testing.assert_allclose(
        np.asarray(res.min_clearance), np.asarray(gold["min_clearance"]),
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(res.final_xy), np.asarray(gold["final_xy"]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(res.qp_ok_frac), np.asarray(gold["qp_ok_frac"]),
        atol=1e-9)


@pytest.mark.slow
def test_golden_wholebody_trajectory():
    """4-domain whole-body closed loop: subsampled COM trajectory and final
    state match the frozen run. The 1 kHz loop integrates ~1000 LL-QP +
    physics ticks, so the drift tolerance is looser (1e-5 m) but still far
    below any behavioral change."""
    from srbx import refplan
    from srbx.config import (LowLevelConfig, MotionConfig, MpcConfig,
                             QpConfig)
    from srbx.models import a1
    from srbx.sim import closedloop, wholebody as wb

    gold = _load("wholebody_trajectory")
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
    com = np.asarray(res.com_hist)[:, :, ::20, :]
    np.testing.assert_allclose(com, np.asarray(gold["com_subsampled"]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.sim.q),
                               np.asarray(gold["final_q"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.qp_ok),
                               np.asarray(gold["qp_ok"]), atol=1e-9)


@pytest.mark.slow
def test_golden_event_loop():
    """Event-DRIVEN loop at fixed seeds: the per-lane trigger tick pattern
    is frozen EXACTLY (a changed trigger tick = changed event semantics);
    trajectory to integration tolerance."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from make_golden import _event_loop_args
    from srbx.sim import closedloop

    gold = _load("event_loop")
    cfgs, kw = _event_loop_args()
    res = jax.jit(lambda: closedloop.run_batch_event(*cfgs, **kw))()
    trig = np.asarray(res.trigger_hist)
    for lane, expect in enumerate(gold["trigger_ticks"]):
        np.testing.assert_array_equal(np.nonzero(trig[lane])[0],
                                      np.asarray(expect, int))
    np.testing.assert_array_equal(np.asarray(res.domains),
                                  np.asarray(gold["domains"]))
    np.testing.assert_array_equal(np.asarray(res.mpc_solves),
                                  np.asarray(gold["mpc_solves"]))
    np.testing.assert_allclose(np.asarray(res.com_hist)[:, ::20, :],
                               np.asarray(gold["com_subsampled"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.sim.q),
                               np.asarray(gold["final_q"]), atol=1e-5)


@pytest.mark.slow
def test_golden_est_loop():
    """Estimation-in-the-loop run_batch at a fixed sensor key: frozen RMSE
    (sensor/kinEst/KF drift detector) + trajectory."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from make_golden import _est_loop_args
    from srbx.sim import closedloop

    gold = _load("est_loop")
    cfgs, kw = _est_loop_args()
    res = jax.jit(lambda: closedloop.run_batch(*cfgs, **kw))()
    np.testing.assert_allclose(np.asarray(res.est_rmse),
                               np.asarray(gold["est_rmse"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.com_hist)[:, :, ::20, :],
                               np.asarray(gold["com_subsampled"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.sim.q),
                               np.asarray(gold["final_q"]), atol=1e-5)


@pytest.mark.slow
def test_golden_team():
    """4-agent team loop: frozen CBF margins, COM endpoints, convergence."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from make_golden import _team_args
    from srbx.sim import closedloop

    gold = _load("team")
    cfgs, kw = _team_args()
    sims, com_ends, margins, llok = jax.jit(
        lambda: closedloop.run_team_batch(*cfgs, **kw))()
    np.testing.assert_allclose(np.asarray(com_ends),
                               np.asarray(gold["com_ends"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(margins),
                               np.asarray(gold["margins"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(llok),
                               np.asarray(gold["llok"]), atol=1e-9)
    np.testing.assert_allclose(np.asarray(sims.q),
                               np.asarray(gold["final_q"]), atol=1e-5)
