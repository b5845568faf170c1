"""Benchmark: NMPC solves/sec/chip (the BASELINE.json north-star metric).

One "solve" = one full event-based CBF-NMPC cycle for one agent: reference
window + foothold/QP assembly + IPM solve + SQP CBF refinement + Bezier fit
— the workload the reference performs per agent per 20 ms HL thread period
(`driver_scripts/qp_only_exp.cpp:666-668`, `TEST.txt:14-17`).

vs_baseline: the reference's real-time budget is 1 solve / 20 ms / agent
= 50 solves/s per agent thread (its measured solve times are not published;
the 20 ms CPU-pinned period is the documented budget, BASELINE.md). So
vs_baseline = solves_per_sec_per_chip / 50.

Prints ONE JSON line.
"""

import json
import time

import jax


def main():
    import numpy as np

    import __graft_entry__ as g

    fn, args = g.entry()
    jfn = jax.jit(fn)

    # compile + warmup (hard host sync — block_until_ready does not reliably
    # block through the remote-TPU tunnel)
    out = jfn(*args)
    _ = np.asarray(out[0][:1])

    batch = args[2].shape[0]
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(*args)
        _ = np.asarray(out[0][:1])
    dt = time.perf_counter() - t0

    solves_per_sec = batch * reps / dt
    print(
        json.dumps(
            {
                "metric": "nmpc_solves_per_sec_per_chip",
                "value": round(solves_per_sec, 1),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_sec / 50.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
