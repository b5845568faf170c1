"""Offline analysis of campaign / closed-loop results.

The TPU-native counterpart of the reference's MATLAB workflow
(`matlab_dbg/plot_mpc_dbg.m`, `matlab_scripts/PlotHLReference.m`,
`failingDistances.txt` post-processing in `src/A1_Sim.cpp:1266`): summary
statistics, per-run safety audits, and optional matplotlib plots.
"""

from __future__ import annotations

import json

import numpy as np


def campaign_summary(result) -> dict:
    """Success-rate campaign metrics (CampaignResult, possibly batched)."""
    success = np.asarray(result.success)
    min_clear = np.asarray(result.min_clearance)
    fail_d = np.asarray(result.fail_distance)
    finite = np.isfinite(min_clear)
    return {
        "n_scenarios": int(success.shape[0]) if success.ndim > 1 else 1,
        "n_agents": int(success.shape[-1]),
        "success_rate": float(success.mean()),
        "mean_min_clearance": float(np.nanmean(
            np.where(finite, min_clear, np.nan)
        )) if finite.any() else float("nan"),
        "nonfinite_lanes": int((~finite).sum()),
        "failing_distances": fail_d[~success].tolist(),
        "qp_ok_frac": float(np.asarray(result.qp_ok_frac).mean()),
    }


def trajectory_match(traj_a, traj_b) -> dict:
    """Trajectory comparison metrics (the 1e-3 parity check of BASELINE)."""
    a = np.asarray(traj_a, np.float64)
    b = np.asarray(traj_b, np.float64)
    err = np.abs(a - b)
    return {
        "max_abs_err": float(err.max()),
        "rmse": float(np.sqrt((err**2).mean())),
        "within_1e_3": bool(err.max() < 1e-3),
    }


def solve_time_stats(times_s) -> dict:
    """p50/p95/p99 latency summary (replaces SNOPT ms logging,
    `src/MPC_dist.cpp:410-419`)."""
    t = np.sort(np.asarray(times_s, np.float64))
    if t.size == 0:
        return {}
    return {
        "p50_ms": float(1e3 * np.percentile(t, 50)),
        "p95_ms": float(1e3 * np.percentile(t, 95)),
        "p99_ms": float(1e3 * np.percentile(t, 99)),
        "mean_ms": float(1e3 * t.mean()),
        "n": int(t.size),
    }


def plot_closed_loop(result, path: str):
    """COM track + per-domain stats plot for a LoopResult (matplotlib is
    available in this image; import is local so headless/metric-only runs
    never pay for it)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    com = np.asarray(result.com_hist).reshape(-1, 3)
    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    axes[0].plot(com[:, 0], com[:, 1])
    axes[0].set_xlabel("x [m]")
    axes[0].set_ylabel("y [m]")
    axes[0].set_title("COM track")
    axes[0].axis("equal")
    axes[1].plot(com[:, 2])
    axes[1].set_xlabel("tick")
    axes[1].set_ylabel("z [m]")
    axes[1].set_title("COM height")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def dump_json(obj, path: str):
    with open(path, "w") as fh:
        json.dump(obj, fh, indent=2)
