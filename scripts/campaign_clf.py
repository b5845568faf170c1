"""CLF-constrained whole-body trot in closed loop (VERDICT r3 #8).

The reference ships `params/LL_w_CLF.txt` as a first-class operating mode
(`src/LowLevelCtrl.cpp:171-225`: a Lyapunov-decrease defect constraint
dV <= -c/eps V + delta with delta penalized at clf_pen); srbx implements it
in both LL QP forms (`lowlevel._clf_terms`, tests/test_clf.py) but through
round 3 it was unit-tested only. This script closes the loop: a whole-body
trot with use_clf=True, per-tick V / dV traces recorded, the decrease
condition checked tick-by-tick, and the COM trajectory compared against
the CLF-off loop. Writes docs/CLF_LOOP.json.

    JAX_PLATFORMS=cpu python scripts/campaign_clf.py [n_domains=6]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from srbx import agent as agent_mod
from srbx import mpc as mpc_mod
from srbx import motion as motion_mod
from srbx import refplan
from srbx.config import (Gait, LowLevelConfig, MotionConfig, MpcConfig,
                         QpConfig)
from srbx.eval import campaign
from srbx.models import a1, rbd
from srbx.sim import wholebody as wb

n_domains = int(sys.argv[1]) if len(sys.argv) > 1 else 6
STAND, TPD = 400, 172

M = a1.model()
MPC = MpcConfig(use_sqp=False)
QP = QpConfig()
MO = MotionConfig()
pobs = jnp.full((2, 20), 100.0)   # obstacle-free trot
ref = refplan.generate(refplan.two_agent_config(loop_size=8000),
                       jnp.asarray([0.0, 0.5, 0.0, -0.5]), pobs)
pr, prd = ref.pr[0:2], ref.prd[0:2]
A0 = jnp.asarray([0.0, 0.5])


def run(ll_cfg):
    q0 = wb.default_crouch(M).at[0:2].add(A0)
    sim = wb.SimState(q0, jnp.zeros((18,)))
    ast = agent_mod.init(MO, M, q0)
    ast = ast._replace(planner=ast.planner._replace(
        stand_from=q0[0:3], dom_ticks=jnp.asarray(float(STAND))))
    mcarry = mpc_mod.init_carry(A0)

    def tick(sim, ast, gait, fnd):
        force = wb.foot_force_measurement(wb.SimConfig(), M, sim)
        ll_out, ast, _ = agent_mod.tick(
            ll_cfg, MO, QP, M, gait, ast, sim.q, sim.qd, force,
            force_new_domain=fnd, allow_contact_trigger=False)
        sim = wb.step(wb.SimConfig(), M, sim, ll_out.tau)
        return sim, ast, (ll_out.v_lyap, ll_out.dv_lyap, ll_out.qp_converged)

    def stand_tick(carry, _):
        sim, ast = carry
        sim, ast, rec = tick(sim, ast, Gait.STAND, None)
        return (sim, ast), rec

    (sim, ast), rec_stand = jax.lax.scan(stand_tick, (sim, ast), None,
                                         length=STAND)

    def domain_step(carry, dom_idx):
        sim, ast, mcarry = carry
        toe_xy = rbd.site_positions(M, sim.q)[a1.TOE_SITES][:, 0:2].T
        ci = motion_mod.next_trot_domain(ast.con.des).astype(sim.q.dtype)
        out = mpc_mod.run_nmpc(MPC, QP, mcarry, sim.q[0:2], sim.qd[0:2],
                               toe_xy, ci, pr, prd, A0, pobs)
        ast2 = agent_mod.set_mpc_data(ast, out.alpha_com, out.states)

        def ll_tick(carry, k):
            sim, ast = carry
            sim, ast, rec = tick(sim, ast, Gait.TROT, k == 0)
            return (sim, ast), rec + (sim.q[0:3],)

        (sim, ast3), recs = jax.lax.scan(ll_tick, (sim, ast2),
                                         jnp.arange(TPD))
        return (sim, ast3, out.carry), recs

    (_, _, _), recs = jax.lax.scan(domain_step, (sim, ast, mcarry),
                                   jnp.arange(n_domains))
    v = np.asarray(recs[0]).ravel()
    dv = np.asarray(recs[1]).ravel()
    ok = np.asarray(recs[2]).ravel()
    com = np.asarray(recs[3]).reshape(-1, 3)
    return v, dv, ok, com


clf_cfg = LowLevelConfig(use_clf=True)    # params/LL_w_CLF.txt gains
v, dv, ok, com = run(clf_cfg)
_, _, ok0, com0 = run(LowLevelConfig())

# decrease condition dV <= -(c/eps) V + tol (the defect is penalized, not
# hard; count violations beyond a small defect allowance)
c_over_eps = 1.0 / clf_cfg.clf_eps
margin = dv + c_over_eps * v
viol = margin > 1e-6
out = {
    "n_domains": n_domains,
    "ticks": int(v.size),
    "ll_qp_converged_frac_clf": float(ok.mean()),
    "ll_qp_converged_frac_noclf": float(ok0.mean()),
    "V": {"mean": float(v.mean()), "p95": float(np.percentile(v, 95)),
          "max": float(v.max())},
    "dV_neg_frac": float((dv < 0).mean()),
    "decrease_condition_viol_frac": float(viol.mean()),
    "decrease_margin_p95": float(np.percentile(margin, 95)),
    "com_final_z": float(com[-1, 2]),
    "com_dist_vs_noclf_max": float(np.abs(com - com0).max()),
    "clf_eps": clf_cfg.clf_eps,
    "clf_pen": clf_cfg.clf_pen,
}
path = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "CLF_LOOP.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
print(f"wrote {path}")
