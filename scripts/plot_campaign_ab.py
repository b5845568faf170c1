"""Visual A/B artifact: QP-only vs CBF-SQP trajectories around the same
randomized obstacle fields -> docs/campaign_ab.png."""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from srbx import refplan
from srbx.config import MpcConfig, QpConfig
from srbx.eval import campaign

n_scen = int(sys.argv[1]) if len(sys.argv) > 1 else 4
n_domains = int(sys.argv[2]) if len(sys.argv) > 2 else 60

qp_cfg = QpConfig(abstol=2e-3, reltol=1e-4, reg_primal=1e-6, reg_dual=1e-6,
                  max_iters=12)
camp = campaign.CampaignConfig(n_agents=2, n_domains=n_domains)
ref_cfg = refplan.two_agent_config(loop_size=40_000)
p_start = jnp.asarray([0.0, 0.5, 0.0, -0.5], jnp.float32)
key = jax.random.key(11)

runs = {}
for leg, use_sqp in (("QP-only", False), ("CBF-SQP", True)):
    cfg = MpcConfig(use_sqp=use_sqp, sqp_iters=2)
    runs[leg] = jax.jit(lambda k, c=cfg: campaign.run_campaign(
        c, qp_cfg, camp, ref_cfg, p_start, k, n_scen))(key)

k_obs, _ = jax.random.split(key)
pobs, pobs_real = campaign.sample_obstacles(k_obs, n_scen, camp.n_obstacles,
                                            camp.obstacle_uncertainty)

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

fig, axes = plt.subplots(1, n_scen, figsize=(4.2 * n_scen, 4.2),
                         sharey=True)
for s, ax in enumerate(np.atleast_1d(axes)):
    obs = np.asarray(pobs_real[s])
    for ox, oy in obs.T:
        ax.add_patch(plt.Circle((ox, oy), 0.5, color="0.8"))
        ax.plot(ox, oy, "x", color="0.4", ms=4)
    for leg, color in (("QP-only", "tab:red"), ("CBF-SQP", "tab:blue")):
        traj = np.asarray(runs[leg].traj[s])           # (D, A, 2)
        for a in range(traj.shape[1]):
            ax.plot(traj[:, a, 0], traj[:, a, 1], color=color, lw=1.6,
                    label=leg if a == 0 else None)
    ax.plot([10.0], [0.0], "k*", ms=12)
    ax.set_xlim(-0.5, 10.5); ax.set_ylim(-3.2, 3.2)
    ax.set_aspect("equal")
    ax.set_title(f"scenario {s}")
np.atleast_1d(axes)[0].legend(loc="lower left", fontsize=8)
fig.suptitle("Obstacle avoidance A/B: grey = 0.5 m failure radius; star = goal")
fig.tight_layout()
fig.savefig("docs/campaign_ab.png", dpi=110)
print("wrote docs/campaign_ab.png",
      {leg: float(np.asarray(r.min_clearance).min()) for leg, r in runs.items()})
