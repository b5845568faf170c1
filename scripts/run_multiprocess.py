"""Multi-process distributed harness: N CPU processes under jax.distributed.

Launches N worker processes (each with its own CPU devices via
`--xla_force_host_platform_device_count`), joins them into one
`jax.distributed` cluster, builds the GLOBAL device mesh, and runs

  1. the sharded team NMPC step (`srbx.parallel.team.team_cycle_fn`) with
     the ring-ppermute neighbor exchange crossing process boundaries, and
  2. the scenario-DP sharded campaign
     (`srbx.eval.campaign.run_campaign_batch_sharded`),

each checked shard-by-shard against the locally-computed unsharded
reference. This is the true multi-controller code path of SURVEY.md §2.3's
"distributed communication backend" row — the TPU-native replacement for the
reference's multi-PC UDP (`include/multi_pc_comm.h:7-22`) — exercised on one
machine with N processes.

Usage:
    python scripts/run_multiprocess.py [n_processes] [devices_per_process]
    python scripts/run_multiprocess.py --worker I N PORT   (internal)
"""
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(process_id: int, num_processes: int, port: int) -> None:
    sys.path.insert(0, REPO)
    # pin the CPU platform even if a sitecustomize registered a TPU plugin
    # and flipped jax_platforms (same guard as tests/conftest.py)
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        import jax.extend.backend as _jeb

        _jeb.clear_backends()
    except Exception:
        pass
    from srbx.parallel import multiproc

    multiproc.initialize(f"localhost:{port}", num_processes, process_id)

    # f64 so sharded == unsharded holds to ~1e-9 (the checks compare
    # iterative-solver outputs; see multiproc.team_step_check)
    jax.config.update("jax_enable_x64", True)
    assert jax.process_count() == num_processes
    stats_team = multiproc.team_step_check()
    stats_camp = multiproc.campaign_dp_check()
    print("WORKER_OK " + json.dumps(
        {"team": stats_team, "campaign": stats_camp}), flush=True)
    jax.distributed.shutdown()


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def launch(n_processes: int = 2, devices_per_process: int = 2,
           timeout_s: float = 600.0) -> list[dict]:
    """Spawn the workers; returns each worker's stats dict. Raises on any
    worker failure."""
    port = free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # preserve inherited XLA flags; only pin the device count (ADVICE r2)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(
        f"--xla_force_host_platform_device_count={devices_per_process}")
    env["XLA_FLAGS"] = " ".join(flags)
    env["PYTHONPATH"] = REPO
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             str(i), str(n_processes), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(n_processes)
    ]
    deadline = time.monotonic() + timeout_s
    outs = []
    try:
        for p in procs:
            remaining = max(1.0, deadline - time.monotonic())
            out, _ = p.communicate(timeout=remaining)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            if p.poll() is None:
                p.kill()
        raise RuntimeError(
            "multiprocess workers timed out; partial output:\n"
            + "\n".join(outs))
    stats = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        ok_lines = [ln for ln in out.splitlines()
                    if ln.startswith("WORKER_OK ")]
        if p.returncode != 0 or not ok_lines:
            raise RuntimeError(
                f"worker {i} failed (rc={p.returncode}):\n{out}")
        stats.append(json.loads(ok_lines[-1][len("WORKER_OK "):]))
    return stats


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
        sys.exit(0)
    n_proc = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    dev_per = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    timeout_s = float(sys.argv[3]) if len(sys.argv) > 3 else 600.0
    t0 = time.perf_counter()
    stats = launch(n_proc, dev_per, timeout_s=timeout_s)
    wall = time.perf_counter() - t0
    print(f"multiprocess ok: {n_proc} processes x {dev_per} devices "
          f"({wall:.1f}s)")
    for s in stats:
        print(f"  proc {s['team']['process_index']}: mesh="
              f"{s['team']['mesh']} team max_err {s['team']['max_err']:.2e}"
              f"  campaign max_err {s['campaign']['max_err']:.2e}")
