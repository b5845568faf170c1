"""Reconstruct the reference's checked-in NMPC solution fixture.

`matlab_dbg/MPC_dist.txt` is a reference-PRODUCED 41-entry NMPC QP solution
vector (dumped by `logMPC_Data`, `src/MPC_dist.cpp:1139-1177`, for the
MATLAB cross-check `matlab_dbg/plot_mpc_dbg.m` / `mpc_1hor.m`). The
generating QP *instance* is not checked in, but it is recoverable from the
solution itself; doing so validates srbx's formulation against
reference-produced numbers (full narrative: docs/ROUND4.md §9 and
`scripts/reproduce_mpc_fixture.py`).

This module is import-side-effect free (no environment mutation): callers —
the script and tests/test_mpc.py::test_mpc_dist_fixture_reconstruction —
are responsible for configuring the platform/precision (the computation
wants f64; both the test conftest and the script pin CPU+x64).
"""

from __future__ import annotations

import pathlib

import jax.numpy as jnp
import numpy as np

from srbx import ocp
from srbx.config import LipConfig, MpcConfig
from srbx.models import lip
from srbx.ops import qp as qpmod

REF = pathlib.Path("/root/reference/matlab_dbg")

# Recovered historical LIP constants: the logged states do NOT satisfy the
# LIP rollout at the snapshot's constants (h=0.29, Ts=0.043,
# `src/MPC_dist.cpp:99-127`); fitting the per-axis 2x2 transition from the
# logged knots recovers Ad/Bd matching srbx's `lip.discrete` (Taylor-3 +
# Bd=A^-1(Ad-I)B) at these values to ~1e-7 — the fixture predates the
# snapshot's tuning (same story as the APF field, docs/ROUND4.md §8).
H_FIXTURE = 0.22
TS_FIXTURE = 0.05


def reconstruct(ref_dir: pathlib.Path = REF) -> dict:
    """Decode the fixture, rebuild its QP instance, and re-solve with srbx.

    Returns a dict of residuals/gaps; see
    tests/test_mpc.py::test_mpc_dist_fixture_reconstruction for the
    assertion envelope and docs/MPC_FIXTURE_REPRO.json for recorded values.
    """
    sol = np.loadtxt(ref_dir / "MPC_dist.txt")
    assert sol.shape == (41,)
    x_knots = sol[:16]
    u_knots = sol[16:24]
    lam = sol[24:40].reshape(4, 4)
    com = np.loadtxt(ref_dir / "COM_dist.txt")      # (4 rows x,dx,y,dy; 4 knots)

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
