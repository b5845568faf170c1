"""Whole-body push-recovery campaign (VERDICT r3 #6): success vs push
magnitude through the full 18-DoF closed loop.

The batched analogue of the reference's external disturbance generator
(`src/A1_Sim.cpp:84-107`: constant trunk force pulse between two control
ticks, e.g. {0,-20,0} N; invocation commented at `:1199` — the reference
shipped the generator but never ran the campaign). Here: per-lane pulses
with sampled magnitude / azimuth / onset, applied to trotting robots, and
a success-vs-magnitude curve recorded to docs/CAMPAIGN_PUSH.json.

    python scripts/campaign_push.py [reps=16] [n_domains=10] [dur_ms=300]

Success = upright at the end (z in [0.18, 0.40], |roll|,|pitch| < 0.5 rad),
finite, and the LL QP still converging over the final domain.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from srbx import refplan
from srbx.config import LowLevelConfig, MotionConfig, MpcConfig, QpConfig
from srbx.models import a1
from srbx.sim import closedloop, wholebody as wb

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 16
n_domains = int(sys.argv[2]) if len(sys.argv) > 2 else 10
dur_ticks = int(sys.argv[3]) if len(sys.argv) > 3 else 300

dtype = jnp.float32
MAGS = [0.0, 10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0, 80.0, 90.0]
B = len(MAGS) * reps

model = a1.model()
loop = closedloop.LoopConfig(stand_ticks=800, n_domains=n_domains)
qp_cfg = QpConfig(abstol=2e-3, reltol=1e-4, reg_primal=1e-6, reg_dual=1e-6,
                  max_iters=12)
mpc_cfg = MpcConfig(use_sqp=False, condensed=True, elide_box_rows=True,
                    elide_simplex=True)
ref_cfg = refplan.two_agent_config(loop_size=8_000)
p_start = jnp.asarray([0.0, 0.0, 0.0, -1.0], dtype)

# obstacle-free straight trot (obstacles parked far away)
pobs = jnp.full((2, 20), 100.0, dtype)
ref = refplan.generate(ref_cfg, p_start, pobs, dtype=dtype)

key = jax.random.key(7)
k_az, k_start = jax.random.split(key)
mags = jnp.repeat(jnp.asarray(MAGS, dtype), reps)              # (B,)
az = jax.random.uniform(k_az, (B,), minval=0.0, maxval=2 * np.pi)
force = jnp.stack([mags * jnp.cos(az), mags * jnp.sin(az),
                   jnp.zeros((B,), dtype)], axis=1).astype(dtype)
tpd = loop.ticks_per_domain
start = jax.random.randint(k_start, (B,), 2 * tpd,
                           (n_domains - 3) * tpd).astype(jnp.int32)
dur = jnp.full((B,), dur_ticks, jnp.int32)

pr = jnp.broadcast_to(ref.pr[0:2], (B, 2, ref.pr.shape[1]))
prd = jnp.broadcast_to(ref.prd[0:2], (B, 2, ref.prd.shape[1]))
a0 = jnp.broadcast_to(p_start[0:2], (B, 2))
pobs_b = jnp.broadcast_to(pobs, (B, 2, 20))

backend = "fused" if jax.default_backend() != "cpu" else "xla"


@jax.jit
def run():
    return closedloop.run_batch(
        mpc_cfg, LowLevelConfig(), MotionConfig(), qp_cfg, wb.SimConfig(),
        loop, model, pr, prd, a0, pobs_b, dtype=dtype, backend=backend,
        tile=128, ll_reduced=True, push=(force, start, dur))


t0 = time.perf_counter()
res = run()
com = np.asarray(res.com_hist)          # (B, D, ticks, 3)
q = np.asarray(res.sim.q)
wall = time.perf_counter() - t0

z_ok = (q[:, 2] > 0.18) & (q[:, 2] < 0.40)
rp_ok = (np.abs(q[:, 3]) < 0.5) & (np.abs(q[:, 4]) < 0.5)
finite = np.isfinite(com.reshape(B, -1)).all(axis=1) & np.isfinite(q).all(axis=1)
# LL-QP convergence over the final domain (stats col 1 = per-domain mean)
llok_final = np.asarray(res.tau_hist)[:, -1, 1] > 0.995
success = z_ok & rp_ok & finite & llok_final

curve = {}
for i, m in enumerate(MAGS):
    sel = success[i * reps:(i + 1) * reps]
    curve[str(int(m))] = float(sel.mean())
out = {
    "reps_per_magnitude": reps,
    "n_domains": n_domains,
    "pulse_duration_ms": dur_ticks,
    "success_vs_push_N": curve,
    "wall_s": wall,
    "notes": "per-lane trunk force pulse, random azimuth in the horizontal "
             "plane, onset uniform in [2,n_domains-3] domains of trot; "
             "reference analogue src/A1_Sim.cpp:84-107",
}
path = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "CAMPAIGN_PUSH.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
print(f"wrote {path}")
