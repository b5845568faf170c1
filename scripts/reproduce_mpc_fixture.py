"""Reproduce the reference's checked-in NMPC solution fixture (VERDICT r3 #2).

`matlab_dbg/MPC_dist.txt` is a reference-PRODUCED 41-entry NMPC QP solution
vector (dumped by `logMPC_Data`, `src/MPC_dist.cpp:1139-1177`, for the
MATLAB cross-check `matlab_dbg/plot_mpc_dbg.m`/`mpc_1hor.m`):

    [ x_1..x_4 (4 states each) | u_1..u_4 (COP xy) | lambda (4 legs x 4
      knots, each knot's 4 sum to 1.000) | slack = 0 ]

The generating QP *instance* is not checked in — but it is recoverable
from the solution itself, and doing so validates srbx's formulation
against reference-produced numbers:

1. **Footprint**: u_k = Fp·lambda_k must hold exactly for the reference's
   COP convex-combination parametrization (`src/MPC_dist.cpp:255-257`).
   Solving the 8x8 linear system for Fp from the logged (u, lambda) knots
   leaves residual ~6e-16 and yields a textbook A1 stance rectangle
   (x: +-0.21/-0.145, y: +-0.13) — structure confirmed bit-exactly.
2. **Dynamics**: the logged states do NOT satisfy the LIP rollout at the
   snapshot's constants (h=0.29, Ts=0.043 — `src/MPC_dist.cpp:99-127`);
   fitting the per-axis 2x2 transition from the logged knots recovers
   Ad/Bd matching srbx's `lip.discrete` (same Taylor-3 + Bd=A^-1(Ad-I)B
   construction) at **h=0.22 m, Ts=0.05 s** to ~1e-7 — historical
   constants, same story as the APF field (docs/ROUND4.md §8): the
   fixture predates the snapshot's tuning.
3. **x0**: inverting the first dynamics block gives x0 ~ (1e-6, 8e-4,
   3e-7, -2e-3) — the first MPC cycle of a run starting at the origin
   (matching COM_dist.txt's ref window, which starts at 0).
4. **Optimality**: all inequality rows are slack (interior optimum,
   min slack 0.11); re-solving the srbx-assembled QP (COM_dist.txt ref,
   snapshot weights) with srbx.ops.qp reproduces the logged solution to
   max |dX| ~ 4e-3, |dU| ~ 3e-3. The residual gap is the fixture's
   unrecorded cost tuning: the KKT system at the logged point has an
   8-dimensional null space (cost ref / multipliers are jointly
   unidentifiable), so the generating weights cannot be pinned further;
   the identifiable KKT combinations are consistent with COM_dist.txt on
   the position knots.

Writes docs/MPC_FIXTURE_REPRO.json. Fast regression:
tests/test_mpc.py::test_mpc_dist_fixture_reconstruction.
"""

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from srbx import ocp
from srbx.config import LipConfig, MpcConfig
from srbx.models import lip
from srbx.ops import qp as qpmod

REF = pathlib.Path("/root/reference/matlab_dbg")

# recovered historical LIP constants (see module docstring, step 2)
H_FIXTURE = 0.22
TS_FIXTURE = 0.05


def reconstruct():
    sol = np.loadtxt(REF / "MPC_dist.txt")
    assert sol.shape == (41,)
    x_knots = sol[:16]
    u_knots = sol[16:24]
    lam = sol[24:40].reshape(4, 4)
    com = np.loadtxt(REF / "COM_dist.txt")          # (4 rows x,dx,y,dy; 4 knots)

    lipc = LipConfig(h=H_FIXTURE, ts=TS_FIXTURE)
    cfg = MpcConfig(lip=lipc)
    ad, bd = map(np.asarray, lip.discrete(lipc))

    x0 = np.linalg.solve(ad, x_knots[:4] - bd @ u_knots[:2])

    m = np.zeros((8, 8))
    for k in range(4):
        m[2 * k, 0:4] = lam[k]
        m[2 * k + 1, 4:8] = lam[k]
    fp_flat, _, rank, _ = np.linalg.lstsq(m, u_knots, rcond=None)
    fp = fp_flat.reshape(2, 4)
    fp_residual = float(np.abs(m @ fp_flat - u_knots).max())

    data = ocp.assemble(cfg, jnp.asarray(x0), jnp.asarray(com),
                        jnp.asarray(fp), jnp.ones(4))
    eq_res = np.asarray(data.A) @ sol - np.asarray(data.b)
    ineq_slack = np.asarray(data.h) - np.asarray(data.G) @ sol

    out = qpmod.solve(data.P, data.c, data.A, data.b, data.G, data.h,
                      qpmod.QpConfig(max_iters=60, abstol=1e-11, reltol=1e-11))
    x = np.asarray(out.x)
    return {
        "sol": sol, "x0": x0, "fp": fp, "fp_residual": fp_residual,
        "fp_rank": int(rank),
        "dyn_residual": float(np.abs(eq_res[:16]).max()),
        "cop_residual": float(np.abs(eq_res[16:24]).max()),
        "sumlam_residual": float(np.abs(eq_res[24:28]).max()),
        "min_ineq_slack": float(ineq_slack.min()),
        "resolve_dx": float(np.abs(x[:16] - x_knots).max()),
        "resolve_du": float(np.abs(x[16:24] - u_knots).max()),
        "resolve_dlam": float(np.abs(x[24:40] - sol[24:40]).max()),
        "resolve_slack": float(x[40]),
    }


def main():
    r = reconstruct()
    out = {
        "fixture": "matlab_dbg/MPC_dist.txt (41-entry 4-contact NMPC QP "
                   "solution, `src/MPC_dist.cpp:1139-1177`)",
        "recovered_lip": {"h": H_FIXTURE, "ts": TS_FIXTURE,
                          "note": "snapshot constants are h=0.29, ts=0.043; "
                                  "the fixture predates them"},
        "recovered_x0": r["x0"].tolist(),
        "recovered_footprint_xy": r["fp"].tolist(),
        "footprint_residual": r["fp_residual"],
        "equality_residuals": {
            "lip_dynamics": r["dyn_residual"],
            "cop_combination": r["cop_residual"],
            "sum_lambda": r["sumlam_residual"],
        },
        "min_inequality_slack": r["min_ineq_slack"],
        "resolve_gap": {
            "dX": r["resolve_dx"], "dU": r["resolve_du"],
            "dLambda": r["resolve_dlam"], "slack": r["resolve_slack"],
            "note": "gap = the fixture's unrecorded cost tuning; the KKT "
                    "system at the logged point has an 8-dim null space, so "
                    "the generating weights are not further identifiable",
        },
    }
    path = pathlib.Path(__file__).resolve().parent.parent / "docs" / \
        "MPC_FIXTURE_REPRO.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
