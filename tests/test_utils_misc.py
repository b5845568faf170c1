"""Coverage for the utility modules: pathplan, filters, params_io,
analysis helpers, profiling timers, Pallas linalg (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from srbx import pathplan
from srbx.eval import analysis
from srbx.utils import filters, params_io, profiling


def test_pathplan_expand_srb_reference():
    """`PathPlanner::computePath` equivalent (`src/PathPlanner.cpp:20-66`):
    heading from velocity, yaw rate by central difference, flat attitude."""
    t = 50
    dt = 0.172
    # constant-rate left turn: heading = 0.1 * k
    k = np.arange(t)
    yaw_true = 0.1 * k
    vel = 0.3 * np.stack([np.cos(yaw_true), np.sin(yaw_true)])
    pos = np.cumsum(vel, axis=1) * dt
    pr = jnp.asarray(pos)            # (2, T) single agent
    prd = jnp.asarray(vel)
    ref = pathplan.expand_srb_reference(pr, prd, dt=dt)
    assert ref.shape == (1, t, 12)
    dyaw = np.asarray(ref[0, :, 8]) - yaw_true
    np.testing.assert_allclose(np.arctan2(np.sin(dyaw), np.cos(dyaw)), 0.0,
                               atol=1e-6)
    # interior yaw rate = 0.1 / dt
    np.testing.assert_allclose(
        np.asarray(ref[0, 1:-1, 11]), 0.1 / dt, rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(ref[0, :, 2]), 0.28)
    np.testing.assert_allclose(np.asarray(ref[0, :, 6:8]), 0.0)


def test_butterworth_attenuates_high_frequency():
    f = filters.butter2(cutoff_hz=10.0, fs_hz=1000.0)
    s = filters.biquad_init()
    t = np.arange(2000) / 1000.0
    x = np.sin(2 * np.pi * 2.0 * t) + np.sin(2 * np.pi * 200.0 * t)
    ys = []
    for xi in x:
        s, y = filters.biquad_apply(f, s, jnp.asarray(xi))
        ys.append(float(y))
    ys = np.asarray(ys[1000:])
    # spectral check (phase lag makes time-domain comparison unfair):
    # the 2 Hz line passes ~unit gain, the 200 Hz line is crushed
    spec = np.abs(np.fft.rfft(ys))
    freqs = np.fft.rfftfreq(ys.size, d=1e-3)
    a_lo = spec[np.argmin(np.abs(freqs - 2.0))]
    a_hi = spec[np.argmin(np.abs(freqs - 200.0))]
    assert a_lo > 0.8 * ys.size / 2 * 0.9      # ~unit gain at 2 Hz
    assert a_hi < 0.02 * a_lo                  # >34 dB attenuation at 200 Hz


def test_moving_average_matches_numpy():
    s = filters.moving_average_init(4, ())
    xs = np.arange(10.0)
    outs = []
    for x in xs:
        s, y = filters.moving_average_apply(s, jnp.asarray(x))
        outs.append(float(y))
    # steady state: mean of the last 4 samples
    np.testing.assert_allclose(outs[5], np.mean(xs[2:6]))
    np.testing.assert_allclose(outs[-1], np.mean(xs[-4:]))


def test_params_io_reads_reference_format(tmp_path):
    """Positional param files in the reference's documented ordering
    (`src/Parameters.cpp:95-166`), routed by filename substring."""
    ll = tmp_path / "LL_test.txt"
    ll.write_text("0.6 350 30 1 2.0 0.2 1e6 1e8 50 0.7  # trailing comment\n")
    mo = tmp_path / "Walking_test.txt"
    mo.write_text("0.26 0.10 0.2 0.0 0.0\n")
    cfg = params_io.load([str(ll), str(mo)])
    assert cfg.lowlevel.mu == 0.6 and cfg.lowlevel.kp == 350
    assert cfg.lowlevel.use_clf is True and cfg.lowlevel.clf_eps == 0.7
    assert cfg.motion.stand_height == 0.26
    assert cfg.motion.swing_height == 0.10
    assert cfg.motion.fwd_speed == 0.2


def test_analysis_trajectory_match_and_stats():
    a = np.zeros((5, 2))
    b = a + 5e-4
    m = analysis.trajectory_match(a, b)
    assert m["within_1e_3"] and abs(m["max_abs_err"] - 5e-4) < 1e-12
    st = analysis.solve_time_stats([0.001, 0.002, 0.003])
    assert st["n"] == 3 and abs(st["p50_ms"] - 2.0) < 1e-9


def test_stage_timer_accumulates():
    t = profiling.StageTimer()
    with t.stage("a"):
        _ = jnp.ones(3) + 1
    out = t.time_fn("b", lambda: jnp.zeros(2))
    assert out.shape == (2,)
    s = t.summary()
    assert s["a"]["count"] == 1 and s["b"]["count"] == 1
    assert s["a"]["total_s"] >= 0


def test_pallas_linalg_interpret_matches_numpy():
    """Lanes-last Pallas cholesky/cho_solve in interpret mode vs numpy."""
    from srbx.ops import pallas_linalg as plin

    rng = np.random.default_rng(2)
    k, b = 9, 128
    m = rng.normal(size=(b, k, k)).astype(np.float32)
    spd = np.einsum("bij,bkj->bik", m, m) + 3 * np.eye(k, dtype=np.float32)
    rhs = rng.normal(size=(b, k, 2)).astype(np.float32)

    ll = jnp.moveaxis(jnp.asarray(spd), 0, -1)       # (k, k, B)
    rt = jnp.moveaxis(jnp.asarray(rhs), 0, -1)       # (k, r, B)
    lfac = plin.cholesky(ll, tile=128, interpret=True)
    x = np.moveaxis(np.asarray(
        plin.cho_solve(lfac, rt, tile=128, interpret=True)), -1, 0)

    expect = np.linalg.solve(spd, rhs)
    np.testing.assert_allclose(x, expect, rtol=2e-3, atol=2e-4)


def test_debug_mark_and_print_size(capfd):
    import jax
    import jax.numpy as jnp

    from srbx.utils import debug

    @jax.jit
    def f(x):
        debug.mark(jnp.sum(x))
        return x * 2

    out = f(jnp.ones(3))
    jax.block_until_ready(out)
    debug.print_size("ones", jnp.ones((2, 3)))
    captured = capfd.readouterr()
    assert "[mark]" in captured.out or "[mark]" in captured.err
    assert "[size] ones: shape=(2, 3)" in captured.out
