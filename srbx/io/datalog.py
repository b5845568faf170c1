"""Structured per-tick logging off the hot path.

Replaces `DataLog` (`src/DataLog.cpp:17-104`): instead of a per-tick fstream
CSV write inside the 1 kHz loop (and hard-coded absolute paths — a
portability bug the reference carries), log records accumulate on-device as
a pytree of ring buffers inside the jitted loop; the host drains and writes
them after the scan (or periodically via jax.debug.callback for live runs).
"""

from __future__ import annotations

import csv
import dataclasses
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class LogSpec:
    """Field name -> per-record shape."""

    fields: Mapping[str, tuple]
    capacity: int


def make_buffer(spec: LogSpec, dtype=jnp.float32):
    """Device-side log state: (buffers pytree, write index)."""
    bufs = {
        name: jnp.zeros((spec.capacity,) + tuple(shape), dtype)
        for name, shape in spec.fields.items()
    }
    return bufs, jnp.zeros((), jnp.int32)


def record(log_state, values):
    """Append one record (inside jit/scan). Overwrites oldest at capacity."""
    bufs, idx = log_state
    cap = next(iter(bufs.values())).shape[0]
    slot = jnp.mod(idx, cap)
    new_bufs = {
        name: bufs[name].at[slot].set(jnp.asarray(values[name], bufs[name].dtype))
        for name in bufs
    }
    return new_bufs, idx + 1


def to_csv(log_state, path: str):
    """Host-side drain: write the (flattened) records as CSV, matching the
    row-per-tick layout the reference's MATLAB scripts consume."""
    bufs, idx = log_state
    n = int(np.minimum(int(idx), next(iter(bufs.values())).shape[0]))
    names = sorted(bufs)
    header = []
    cols = []
    for name in names:
        arr = np.asarray(bufs[name][:n]).reshape(n, -1)
        cols.append(arr)
        header.extend(
            [name] if arr.shape[1] == 1 else
            [f"{name}_{i}" for i in range(arr.shape[1])]
        )
    table = np.concatenate(cols, axis=1) if cols else np.zeros((0, 0))
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(header)
        w.writerows(table.tolist())
    return n


CONTROL_TICK_SPEC = LogSpec(
    # the reference's per-tick CSV row (`src/DataLog.cpp:17-78`): time,
    # outputs, torques, states, desired traj, CLF, forces, phase
    fields={
        "t": (),
        "y": (18,),
        "dy": (18,),
        "tau": (12,),
        "q": (18,),
        "dq": (18,),
        "hd": (18,),
        "dhd": (18,),
        "v_lyap": (),
        "dv_lyap": (),
        "grf": (12,),
        "phase": (),
    },
    capacity=60_000,
)


def to_reference_csv(log_state, path: str):
    """Write a CONTROL_TICK_SPEC buffer in the reference's EXACT 140-column
    `DataLog::writeData` row layout (`src/DataLog.cpp:17-78`): t, y(12),
    tau(12), q(18), dq(18), hd(12), dhd(12), ddhd(12), two blocks of
    literal integers 0..11 (placeholder columns the reference emits),
    dy(12), V, dV, force(4), phase — so the reference's offline MATLAB
    analysis consumes srbx logs unchanged. Output-vector fields wider than
    12 are truncated to their first 12 entries (the reference zero-pads to
    12); ddhd is not tracked by the spec and is written as zeros.
    """
    bufs, idx = log_state
    n = int(np.minimum(int(idx), next(iter(bufs.values())).shape[0]))

    def col(name, width=None):
        arr = np.asarray(bufs[name][:n]).reshape(n, -1)
        return arr[:, :width] if width else arr

    placeholders = np.tile(np.arange(12, dtype=float), (n, 1))
    zeros12 = np.zeros((n, 12))
    table = np.concatenate(
        [
            col("t").reshape(n, 1),
            col("y", 12),
            col("tau"),
            col("q"),
            col("dq"),
            col("hd", 12),
            col("dhd", 12),
            zeros12,                 # ddhd (not tracked; reference pads)
            placeholders,            # literal 0..11 (src/DataLog.cpp:61-64)
            placeholders,            # literal 0..11 (src/DataLog.cpp:65-68)
            col("dy", 12),
            col("v_lyap").reshape(n, 1),
            col("dv_lyap").reshape(n, 1),
            col("grf")[:, 2::3][:, :4],   # per-foot normal force
            col("phase").reshape(n, 1),
        ],
        axis=1,
    )
    # the reference row ends with a trailing comma (no header)
    with open(path, "w", newline="") as fh:
        for row in table:
            fh.write(",".join(f"{v:.10g}" for v in row) + ",\n")
    return table.shape
