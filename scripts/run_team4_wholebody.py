"""4-agent whole-body team on one chip — the A1_Sim_4_agents workload
(`src/A1_Sim_4_agents.cpp`) at full fidelity: per-agent 18-DoF physics,
1 kHz LL QP, event-cadence NMPC with neighbor-state CBF circles, APF refs.

    python scripts/run_team4_wholebody.py [n_domains] [est]

With `est`, every robot runs on its own sensor + kinEst estimates — the
reference's deployable topology, where the broadcast neighbor 4-state is
the other robot's ESTIMATE (`qp_only_exp.cpp:256,484` + SET_DATA).
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from srbx import refplan
from srbx.config import LowLevelConfig, MotionConfig, MpcConfig, QpConfig
from srbx.estimation import pipeline
from srbx.models import a1
from srbx.sim import closedloop, wholebody as wb

n_domains = int(sys.argv[1]) if len(sys.argv) > 1 else 8
est_mode = "est" in sys.argv[1:]
dtype = jnp.float32
model = a1.model()

ref_cfg = refplan.four_agent_config(loop_size=20_000)
p_start = jnp.asarray([0.0, 1.5, 0.0, 0.5, 0.0, -0.5, 0.0, -1.5], dtype)
pobs = jnp.asarray(
    np.stack([np.random.default_rng(0).uniform(3.0, 8.0, 20),
              np.random.default_rng(1).uniform(-2.0, 2.0, 20)]), dtype)
ref = refplan.generate(ref_cfg, p_start, pobs, dtype=dtype)

loop = closedloop.LoopConfig(stand_ticks=800, n_domains=n_domains)
qp_cfg = QpConfig(abstol=2e-3, reltol=1e-4, reg_primal=1e-6, reg_dual=1e-6,
                  max_iters=12)
mpc_cfg = MpcConfig(use_sqp=True, sqp_iters=1, condensed=True,
                    elide_box_rows=True, elide_simplex=True)

# one scenario through the batched team loop at the production operating
# point: reduced LL QP (n 43->25) + Ruiz equilibration — the conditioning
# fix that takes the batch loops to 100% LL-QP convergence (ROUND1; the
# per-lane run_team path has no reduced build)
pr = ref.pr.reshape(1, 4, 2, -1)
prd = ref.prd.reshape(1, 4, 2, -1)
agent0 = p_start.reshape(1, 4, 2)
pobs_b = pobs.reshape(1, 2, -1)

est_cfg = pipeline.EstConfig() if est_mode else None
fn = jax.jit(lambda: closedloop.run_team_batch(
    mpc_cfg, LowLevelConfig(), MotionConfig(), qp_cfg, wb.SimConfig(),
    loop, model, pr, prd, agent0, pobs_b, dtype=dtype,
    backend="fused", tile=128, ll_reduced=True, est_cfg=est_cfg,
    est_key=jax.random.PRNGKey(11)))
t0 = time.perf_counter()
res = fn()
if est_mode:
    sims, com_ends, margins, llok, est_rmse = res
else:
    sims, com_ends, margins, llok = res
_ = np.asarray(com_ends[:1])
wall = time.perf_counter() - t0
# com_ends (D, 1, A, 3) -> (D, A, 3); margins (D, 1, A); llok (D, 1)
ce = np.asarray(com_ends)[:, 0]
mg = np.asarray(margins)[:, 0]
lk = np.asarray(llok)[:, 0]
final = ce[-1][:, 0:2]
import itertools
dmin = min(np.linalg.norm(final[i] - final[j]) for i, j in itertools.combinations(range(4), 2))
print(f"final agent xy:\n{np.round(final, 3)}")
print(f"min inter-agent distance {dmin:.2f} m; min CBF margin {mg.min():.2f}; LL-QP ok {lk.mean():.3f}")
assert np.isfinite(ce).all()
if est_mode:
    r = np.asarray(est_rmse)[0]                  # (A, 2)
    print("per-robot est RMSE: pos(mm) "
          f"{np.round(r[:, 0] * 1e3, 2).tolist()}  vel(m/s) "
          f"{np.round(r[:, 1], 3).tolist()}")
print(f"wall incl compile {wall:.1f}s", flush=True)
