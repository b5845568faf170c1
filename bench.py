"""Benchmark: NMPC solves/sec/chip (the BASELINE.json north-star metric).

One "solve" = one full event-based CBF-NMPC cycle for one agent: reference
window + foothold/QP assembly + IPM solve + SQP CBF refinement + Bezier fit
— the workload the reference performs per agent per 20 ms HL thread period
(`driver_scripts/qp_only_exp.cpp:666-668`, `TEST.txt:14-17`).

Operating point (measured on TPU v5e): fused single-kernel Pallas IPM,
condensed QP with per-knot simplex elimination (n 41->17->13, me 28->4->0),
statically-redundant rows elided (mi 92->28: big-M boxes + implied
lambda<=1; all equivalences test-enforced), f32, B=131072 lanes.
Progression: 73k (B=4k) -> 130k (B=64k, condensed) -> 165k (+ box elision)
-> 176k (+ lambda-upper elision) -> 355k (+ simplex elimination) -> 361k (+ trace-time noeq kernel
specialization: me=0 skips the whole Schur-complement stage every
iteration) -> 367k solves/s (+ lane tile 256 -> 512) -> ~376k
(B 65536 -> 131072; in-jit tiling keeps the proto O(1) in batch and the
measured HBM peak at this batch is 9.6 GB of the 16 GB chip —
srbx/eval/limits.py mode C).

vs_baseline: the reference's real-time budget is 1 solve / 20 ms / agent
= 50 solves/s per agent thread (its measured solve times are not published;
the 20 ms CPU-pinned period is the documented budget, BASELINE.md). So
vs_baseline = solves_per_sec_per_chip / 50.

Prints ONE JSON line.
"""

import json
import sys
import time

import jax


def main():
    import jax.numpy as jnp
    import numpy as np

    # Lane-tile sweep at the production shape (f32, B=65536): raw QP
    # 1.42M/1.41M/1.50M/1.56M qp/s at tile 128/256/512/1024, but at cycle
    # level tile=512 wins (366,961 vs 361k at 256 and 1024) — larger tiles
    # amortize Mosaic per-op overhead until they start hurting the
    # assembly/fit stages' fusion.
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    tile = int(argv[0]) if argv else 512

    from srbx import mpc, mpc_batch, refplan
    from srbx.config import MpcConfig, QpConfig
    from srbx.ocp import default_footholds

    on_tpu = jax.devices()[0].platform not in ("cpu", "gpu")
    batch = 131072 if on_tpu else 512
    backend = "fused" if on_tpu else "xla"
    dtype = jnp.float32

    cfg = MpcConfig(use_sqp=True, sqp_iters=2, elide_box_rows=True,
                    elide_simplex=True)
    # --strict: iSWIFT-equivalent stopping (RELTOL/ABSTOL 1e-6, MAXIT 25 —
    # `optimization/iSWIFT/include/GlobalOptions.h:23-26`) with KKT
    # iterative refinement, so the headline is tolerance-comparable to the
    # solver it replaces (VERDICT r3 #7). The default headline keeps the
    # campaign-validated relaxed-f32 operating point.
    strict = "--strict" in sys.argv[1:]
    if strict:
        qp_cfg = QpConfig(abstol=1e-6, reltol=1e-6, reg_primal=1e-6,
                          reg_dual=1e-6, max_iters=25)
    else:
        # kkt_refine_iters=0: at 2e-3 stopping the O(delta) direction bias
        # is far below tolerance; refinement would only cost throughput.
        qp_cfg = QpConfig(abstol=2e-3, reltol=1e-4, reg_primal=1e-6,
                          reg_dual=1e-6, max_iters=12, kkt_refine_iters=0)

    ref_cfg = refplan.two_agent_config(loop_size=4_000)
    p_start = jnp.asarray([0.0, 0.5, 0.0, -0.5], dtype)
    pobs = jnp.asarray(
        np.stack(
            [
                np.random.default_rng(0).uniform(2.0, 8.0, 20),
                np.random.default_rng(1).uniform(-2.0, 2.0, 20),
            ]
        ),
        dtype,
    )
    ref = refplan.generate(ref_cfg, p_start, pobs, dtype=dtype)

    agent0 = p_start[:2]
    q = jnp.tile(agent0, (batch, 1)) + jnp.linspace(
        0, 0.01, batch, dtype=dtype
    )[:, None]
    dq = jnp.zeros((batch, 2), dtype)
    dom = jnp.zeros((batch,), jnp.int32)
    alpha = jnp.stack(
        [q[:, 0], jnp.zeros(batch, dtype), q[:, 1], jnp.zeros(batch, dtype)],
        axis=1,
    )
    ci = jnp.tile(jnp.asarray([0.0, 1.0, 1.0, 0.0], dtype), (batch, 1))
    pr2, prd2 = ref.pr[0:2], ref.prd[0:2]
    toes0 = default_footholds(agent0)

    # The big per-lane operands are TILED INSIDE the jit from small closure
    # constants. Materializing them host-side and embedding them as
    # constants serializes them into the HLO proto shipped to the remote
    # compiler, whose request-body limit (~256 MiB) they exceed at
    # B >= 163840 (measured HTTP 413 at 281 MB — scripts/
    # probe_program_limits.py, docs/ROUND3.md); passing them as jit
    # arguments instead re-ships ~117 MB through the tunnel every call
    # (measured 368k -> 17k solves/s). In-jit tiling keeps the proto O(1)
    # in batch while the materialized operands live worker-side.
    def fn(dom, alpha, q, dq, ci):
        # jnp.tile (not broadcast_to): XLA constant-folds these into the
        # same materialized worker-side HBM constants the round-1/2
        # executable carried, so per-lane reads stay real HBM traffic
        pr = jnp.tile(pr2, (batch, 1, 1))
        prd = jnp.tile(prd2, (batch, 1, 1))
        a0s = jnp.tile(agent0, (batch, 1))
        pobs_b = jnp.tile(pobs, (batch, 1, 1))
        toes = jnp.tile(toes0, (batch, 1, 1))
        out = mpc_batch.run_nmpc_batch(
            cfg, qp_cfg, mpc.MpcCarry(dom, alpha), q, dq, toes, ci,
            pr, prd, a0s, pobs_b, backend=backend, tile=tile, condensed=True,
        )
        return out.states, out.alpha_com, out.qp_converged

    jfn = jax.jit(fn)
    args = (dom, alpha, q, dq, ci)

    # compile + warmup (hard host sync — block_until_ready does not reliably
    # block through the remote-TPU tunnel)
    out = jfn(*args)
    _ = np.asarray(out[0][:1])

    # Pipelined throughput: enqueue all reps, hard-sync once at the end.
    # Dispatch is in-order on one device stream, so syncing the last call
    # bounds all of them. The previous per-rep hard sync paid the axon
    # tunnel's ~28 ms host round-trip per rep (measured: a max_iters=0
    # kernel "costs" 28 ms synced vs 2.6 ms on-device) — that latency is
    # the test harness's, not the chip's, and a deployed campaign loop
    # dispatches exactly like this: many cycles in flight, one sync at
    # the end. The synced number is kept alongside for continuity.
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(*args)
    _ = np.asarray(out[0][:1])
    dt = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(*args)
        _ = np.asarray(out[0][:1])
    dt_synced = time.perf_counter() - t0

    solves_per_sec = batch * reps / dt
    solves_per_sec_synced = batch * reps / dt_synced
    rec = {
        "metric": ("nmpc_solves_per_sec_per_chip_strict" if strict
                   else "nmpc_solves_per_sec_per_chip"),
        "value": round(solves_per_sec, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_sec / 50.0, 2),
        "synced_per_rep": round(solves_per_sec_synced, 1),
    }
    if strict:
        rec["converged_frac"] = round(
            float(np.mean(np.asarray(out[2], np.float64))), 4)
        rec["qp_tol"] = "abstol=reltol=1e-6, maxit 25 (iSWIFT-equivalent)"
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
