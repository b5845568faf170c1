"""Scenario-batched 4-agent whole-body teams on one chip: the
A1_Sim_4_agents workload (`src/A1_Sim_4_agents.cpp`) replicated across S
randomized-obstacle scenarios — (S x 4) full-fidelity robots (18-DoF
physics + 1 kHz LL QP + NMPC with neighbor CBF circles) as ONE program,
every solve batched through the fused kernel.

    python scripts/run_team_batch_scale.py [S] [n_domains] [mode]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from srbx import refplan
from srbx.config import LowLevelConfig, MotionConfig, MpcConfig, QpConfig
from srbx.models import a1
from srbx.sim import closedloop, wholebody as wb

S = int(sys.argv[1]) if len(sys.argv) > 1 else 64
n_domains = int(sys.argv[2]) if len(sys.argv) > 2 else 8
mode = sys.argv[3] if len(sys.argv) > 3 else "batch-r"
dtype = jnp.float32
model = a1.model()
na = 4

ref_cfg = refplan.four_agent_config(loop_size=20_000)
p_start = jnp.asarray([0.0, 1.5, 0.0, 0.5, 0.0, -0.5, 0.0, -1.5], dtype)

key = jax.random.key(7)
k1, k2 = jax.random.split(key)
xs = jax.random.uniform(k1, (S, 20), minval=3.0, maxval=8.0)
ys = jax.random.uniform(k2, (S, 20), minval=-2.0, maxval=2.0)
pobs = jnp.stack([xs, ys], axis=1).astype(dtype)            # (S, 2, 20)

loop = closedloop.LoopConfig(stand_ticks=800, n_domains=n_domains)
qp_cfg = QpConfig(abstol=2e-3, reltol=1e-4, reg_primal=1e-6, reg_dual=1e-6,
                  max_iters=12)
mpc_cfg = MpcConfig(use_sqp=True, sqp_iters=1, condensed=True,
                    elide_box_rows=True, elide_simplex=True)
agent0 = jnp.broadcast_to(p_start.reshape(na, 2), (S, na, 2))


def fn(pobs_b):
    refs = jax.vmap(lambda p: refplan.generate(ref_cfg, p_start, p,
                                               dtype=dtype))(pobs_b)
    pr = refs.pr.reshape(S, na, 2, -1)
    prd = refs.prd.reshape(S, na, 2, -1)
    return closedloop.run_team_batch(
        mpc_cfg, LowLevelConfig(), MotionConfig(), qp_cfg, wb.SimConfig(),
        loop, model, pr, prd, agent0, pobs_b, dtype=dtype,
        backend="fused", tile=256 if S * na >= 256 else 128,
        ll_reduced=mode.endswith("-r"))


fn = jax.jit(fn)
t0 = time.perf_counter()
sims, com_ends, margins, llok = fn(pobs)
ce = np.asarray(com_ends)                      # (D, S, na, 3)
wall = time.perf_counter() - t0
t0 = time.perf_counter()
sims, com_ends, margins, llok = fn(pobs)
ce = np.asarray(com_ends)
steady = time.perf_counter() - t0

mg = np.asarray(margins)
lk = np.asarray(llok)
final = ce[-1]                                  # (S, na, 3)
import itertools
dmin = min(
    np.linalg.norm(final[s, i, :2] - final[s, j, :2])
    for s in range(S) for i, j in itertools.combinations(range(na), 2)
)
ticks = loop.stand_ticks + n_domains * loop.ticks_per_domain
print(f"S={S} x {na} agents = {S*na} whole-body robots, {n_domains} domains, "
      f"wall {wall:.1f}s incl compile, steady {steady:.1f}s")
print(f"robot-ticks/s {S*na*ticks/steady:,.0f} (steady) = "
      f"{S*na*ticks/steady/1000:.1f} robots real-time-equivalent  "
      f"min inter-agent dist {dmin:.2f} m  min CBF margin {mg.min():.2f}  "
      f"LL-QP ok {lk.mean():.3f}  finite={np.isfinite(ce).all()}", flush=True)
