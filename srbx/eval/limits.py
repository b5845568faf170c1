"""Program-size limits of the remote-TPU environment, measured, with a
static preflight that predicts the avoidable failures before any device
work.

Rounds 1-2 carried "the worker crashes above N lanes" as folklore
(max_chunk=512, B<=131072, 256-scenario whole-body chunks). Round 3
bisected the failures (scripts/probe_program_limits.py; numbers in
docs/ROUND3.md). There are FOUR failure modes — three statically
predictable resources (A)-(C) plus one runtime fault mode (D):

(A) remote_compile request body — the serialized HLO proto is POSTed to the
    worker's compile endpoint, which rejects bodies over ~256 MiB with
    HTTP 413. Programs that EMBED large tiled constants scale their proto
    with batch: bench.py pre-round-3 hit 225 MB at B=131072 (passed) and
    281 MB at B=163840 (rejected). Passing the big per-lane operands as jit
    ARGUMENTS keeps the proto O(1) in batch — that change alone moved
    bench.py's compile ceiling past 262144 lanes.

(B) worker compile-helper memory — Mosaic/XLA compilation of very large
    kernels (the full-shape, non-condensed fused SQP kernel at >=512
    whole-body lanes) can be OOM-killed ON THE WORKER (HTTP 500 "subprocess
    exit signal SIGKILL"). This one is load-dependent, not a deterministic
    function of program size: the same B=512 program that SIGKILLed under a
    concurrent compile load compiled clean at B=1024 alone. Not statically
    predictable from the client; the mitigation is the condensed
    formulation (~25x cheaper compile), which never triggered it.

(C) device HBM — XLA's static assignment (arguments + outputs + temps +
    program) must fit the v5e's 16 GB. bench.py at B=131072 peaks at
    9.6 GB measured and runs; extrapolation crosses capacity near
    B ≈ 2.2e5. This is the only true scale ceiling, and `preflight`
    reads it exactly from the compiled executable, no folklore needed.

(D) runtime kernel faults — the per-agent vmapped (non-fused) campaign
    program at S=1024 kills the worker from a verified-healthy state on
    every attempt while S=512 runs, with BOTH programs statically tiny
    (1.25 GB / 626 MB peak, 0.3 MB proto). Not predictable from the
    client; the measured boundary is encoded where it matters
    (run_campaign_chunked max_chunk=512 for that path). The production
    fused/condensed path is immune (4096x120 in one program).

Template-campaign scaling (for run_campaign_chunked): measured peak is
~1.22 MB/scenario on BOTH solver paths (626 MB at S=512, 1252 MB at
S=1024, 5008 MB at S=4096 fused) — HBM alone allows >10k scenarios per
program.
"""

from __future__ import annotations

from typing import NamedTuple

# Measured environment constants (TPU v5e behind the axon tunnel).
PROTO_LIMIT_MB = 250.0      # HTTP 413 observed at 281 MB, passed at 225 MB
HBM_LIMIT_MB = 15000.0      # capacity guard under the 16 GB v5e HBM


class Preflight(NamedTuple):
    ok: bool
    reasons: tuple          # human-readable failures predicted
    hlo_proto_mb: float     # remote_compile request payload (mode A)
    argument_mb: float
    output_mb: float
    temp_mb: float
    peak_mb: float          # XLA static assignment peak (mode C)
    code_mb: float


def preflight(jitted_fn, *args, compile: bool = True) -> Preflight:
    """Statically check a jitted program against the measured limits.

    Lowers (and, with compile=True, AOT-compiles) the program WITHOUT
    executing it — compilation allocates no device memory, so checking a
    too-big program is safe. Returns the predicted verdict plus the raw
    numbers; callers decide whether to raise.
    """
    lowered = jitted_fn.lower(*args)
    proto = lowered.compiler_ir("hlo").as_serialized_hlo_module_proto()
    proto_mb = len(proto) / 2**20
    reasons = []
    if proto_mb > PROTO_LIMIT_MB:
        reasons.append(
            f"HLO proto {proto_mb:.0f} MB exceeds the ~256 MiB "
            f"remote_compile body limit (mode A; pass large operands as "
            f"jit arguments, not closure constants)")
    arg = out = temp = peak = code = float("nan")
    if compile and not reasons:
        ma = lowered.compile().memory_analysis()
        arg = ma.argument_size_in_bytes / 2**20
        out = ma.output_size_in_bytes / 2**20
        temp = ma.temp_size_in_bytes / 2**20
        peak = ma.peak_memory_in_bytes / 2**20
        code = ma.generated_code_size_in_bytes / 2**20
        total = max(peak, arg + out + temp)
        if total > HBM_LIMIT_MB:
            reasons.append(
                f"static HBM assignment {total / 1024:.1f} GB exceeds the "
                f"{HBM_LIMIT_MB / 1024:.1f} GB capacity guard (mode C)")
    return Preflight(not reasons, tuple(reasons), round(proto_mb, 1),
                     arg, out, temp, peak, code)
