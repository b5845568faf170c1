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

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


if __name__ == "__main__":
    golden = {
        "nmpc_cycle": golden_nmpc_cycle(),
        "template_campaign": golden_template_campaign(),
        "wholebody_trajectory": golden_wholebody_trajectory(),
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(golden, f)
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")
