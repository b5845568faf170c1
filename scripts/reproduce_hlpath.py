"""Reproduce the reference's checked-in APF logs (VERDICT r3 #2).

`Sim_Outputs/HLPath.txt` / `HLVelocity.txt` are the only reference-PRODUCED
numeric outputs whose generating scenario is recoverable:

  * generator: the 4-agent `MPC_dist::generateReferenceTrajectory`
    (`src/MPC_dist.cpp:930-1104`) — the logs have 8 rows = 2 per agent x 4;
  * Pstart = (0,0), (0,-0.9), (-1,0), (-1,-0.9)
    (`src/A1_Sim_4_agents.cpp:862`, the only active 4-agent driver);
  * Pobs = the "EXP 03 and Sim 1 / Sim 2" 9-obstacle field
    (`src/A1_Sim_4_agents.cpp:869-870`), incl. the parked obstacle at
    (-100, 99.5);
  * goal (10,0) (`include/global_loco_opts.h:12-13`); constants
    alpha=150, eta=400, dmin=1, LJ (eps=60, sigma=1), ramp 1000,
    100k steps, downsample 40 (`src/MPC_dist.cpp:932-936`);
  * the literal hard-coded Ad/Bd (`src/MPC_dist.cpp:945-960`) — srbx's
    reference_matrices mode (`refplan.four_agent_config`).

Two quirks of the reference's logging reproduced exactly:
  * knots start at downsampled column 2 (rollout step 80);
  * the LAST TWO columns are junk: the reference downsamples its rollout
    buffer IN PLACE for i < loopSize/40 and then reads two columns past
    that prefix (`src/MPC_dist.cpp:1045-1061`), so columns 2498-2499 of
    the log are the RAW rollout states at steps 2500 and 2501 (visible in
    the file: position jumps from the converged (2.58, 1.06) to mid-flight
    (0.55, 0.49) with velocity 0.14).

Notably the logged run is a STUCK run: all four agents settle in an APF
local equilibrium behind the x=3 obstacle wall at ~(2.6, 1.1), never
reaching the goal — faithfully reproduced here.

Writes docs/HLPATH_REPRO.json. The fast regression version lives in
tests/test_refplan.py::test_hlpath_reference_reproduction.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import json

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from srbx import refplan

REF = pathlib.Path("/root/reference/Sim_Outputs")

P_START = jnp.asarray([0.0, 0.0, 0.0, -0.9, -1.0, 0.0, -1.0, -0.9])
POBS = jnp.asarray([
    [2.2, 1.0, 1.0, 1.0, 1.0, 3.0, 3.0, 3.0, -100.0],
    [0.9, 1.0, -0.75, 2.0, -1.75, 0.5, -0.25, -1.75, -0.5 + 100.0],
])


def main():
    gold_p = np.loadtxt(REF / "HLPath.txt")
    gold_v = np.loadtxt(REF / "HLVelocity.txt")
    assert gold_p.shape == (8, 2500)

    cfg = refplan.four_agent_config(reference_matrices=True)
    (ref, (pos_raw, vel_raw)) = refplan.generate(
        cfg, P_START, POBS, return_raw=True)
    pr = np.array(ref.pr)
    prd = np.array(ref.prd)

    # reference tail quirk: raw rollout states at steps 2500, 2501
    raw_p = np.asarray(pos_raw)[[2500, 2501]]     # (2, 4, 2)
    raw_v = np.asarray(vel_raw)[[2500, 2501]]
    pr[:, -2:] = raw_p.transpose(1, 2, 0).reshape(8, 2)
    prd[:, -2:] = raw_v.transpose(1, 2, 0).reshape(8, 2)

    # the log carries ~6 significant digits (Eigen default ostream
    # precision); compare absolutely against the printed values.
    err_p = np.abs(pr - gold_p)
    err_v = np.abs(prd - gold_v)
    rel_p = err_p / np.maximum(np.abs(gold_p), 1e-3)

    out = {
        "n_knots": 2500,
        "pos_max_abs_err": float(err_p.max()),
        "pos_max_rel_err": float(rel_p.max()),
        "vel_max_abs_err": float(err_v.max()),
        "tail_junk_knots_reproduced": bool(err_p[:, -2:].max() < 1e-4),
        "stuck_equilibrium_xy_agent0": [float(pr[0, 2497]),
                                        float(pr[1, 2497])],
        "scenario": {
            "p_start": np.asarray(P_START).tolist(),
            "pobs": np.asarray(POBS).tolist(),
            "goal": [10.0, 0.0],
        },
    }
    path = pathlib.Path(__file__).resolve().parent.parent / "docs" / \
        "HLPATH_REPRO.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
