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
   min slack 0.076); re-solving the srbx-assembled QP (COM_dist.txt ref,
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

# the reconstruction itself lives in srbx.eval.mpc_fixture (importable,
# free of environment mutation — tests import it directly)
from srbx.eval.mpc_fixture import H_FIXTURE, TS_FIXTURE, reconstruct


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
