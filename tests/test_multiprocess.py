"""jax.distributed multi-process runtime tests.

The true cross-host code path (SURVEY.md §2.3 "distributed communication
backend"; the reference's multi-PC UDP, `include/multi_pc_comm.h:7-22`):
N CPU processes join one jax.distributed cluster, build the global mesh, and
run the sharded team step + scenario-DP campaign as ONE SPMD program with
the ring-ppermute neighbor exchange crossing process boundaries.
"""

import pytest

from srbx.parallel import multiproc


def test_multiproc_checks_single_process_virtual_mesh():
    """The check functions themselves, on the in-process 8-device virtual
    mesh (process_count == 1): sharded == unsharded to f64 precision."""
    stats = multiproc.team_step_check()
    assert stats["n_processes"] == 1
    assert stats["n_devices_global"] == 8
    assert stats["max_err"] < 1e-7
    stats = multiproc.campaign_dp_check()
    assert stats["max_err"] < 1e-7


@pytest.mark.slow
def test_multiprocess_two_processes():
    """Launch 2 real processes x 2 CPU devices under jax.distributed; every
    worker must report shard-exact agreement with the unsharded reference."""
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "scripts",
                        "run_multiprocess.py")
    spec = importlib.util.spec_from_file_location("run_multiprocess", path)
    rmp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rmp)

    stats = rmp.launch(2, 2, timeout_s=300.0)
    assert len(stats) == 2
    for s in stats:
        assert s["team"]["n_processes"] == 2
        assert s["team"]["n_devices_global"] == 4
        assert s["team"]["max_err"] < 1e-7
        assert s["campaign"]["max_err"] < 1e-7
