"""Convex SRB-MPC (srbx.mpc_srb) — the legacy FastMPC reduced-model MPC.

Validates the declared-but-undefined `FastMPC::runMPC` family
(`include/fast_mpc.hpp:98-103` in the reference) as realized TPU-natively:
discretization against the exact matrix exponential, condensation against an
iterative rollout, constraint satisfaction, and closed-loop behavior on the
nonlinear SRB simulator.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srbx import mpc_srb
from srbx.config import QpConfig
from srbx.models import srb

CFG = mpc_srb.SrbMpcConfig()
QP = QpConfig()


def _standing_setup(dtype=jnp.float64):
    state = srb.init_state(p=(0.0, 0.0, 0.26), dtype=dtype)
    foot = jnp.asarray(
        [
            [0.18, -0.13, 0.0],
            [0.18, 0.13, 0.0],
            [-0.18, -0.13, 0.0],
            [-0.18, 0.13, 0.0],
        ],
        dtype,
    )
    x0 = mpc_srb.pack_state(state)
    sched = jnp.ones((CFG.horizon, 4), jnp.int32)
    ref = mpc_srb.hold_reference(
        CFG,
        jnp.asarray([0.0, 0.0, 0.28], dtype),
        jnp.asarray(0.0, dtype),
        jnp.zeros(3, dtype),
        dtype,
    )
    return state, foot, x0, sched, ref


def test_discretization_matches_expm():
    """Taylor-3 (Ad, Bd, Dd) vs the exact exponential of the augmented
    system [[A, B, d], [0, 0, 0]] — reference recipe `src/MPC_dist.cpp:117-127`."""
    _, foot, x0, _, _ = _standing_setup()
    ad, bd, dd = mpc_srb.get_linear_dynamics(CFG, x0, foot)

    # Rebuild the continuous matrices from tiny finite steps of the discrete
    # map is circular; instead form the augmented exact discretization.
    a_cont = (ad - jnp.eye(12)) / CFG.dt  # first-order seed, replaced below
    # Recover A, B, d exactly from the module internals by re-deriving at
    # dt -> a tiny value (Taylor-3 error O(dt^4) ~ 1e-16 at dt=1e-3).
    tiny = mpc_srb.SrbMpcConfig(dt=1e-3)
    ad_t, bd_t, dd_t = mpc_srb.get_linear_dynamics(tiny, x0, foot)
    a_cont = (ad_t - jnp.eye(12)) / tiny.dt
    # refine: Ad_t = I + A h + A^2 h^2/2 + ... -> A = (Ad_t - I)/h - A^2 h/2 ...
    for _ in range(3):
        a_cont = (ad_t - jnp.eye(12)) / tiny.dt - (
            tiny.dt / 2 * a_cont @ a_cont
            + tiny.dt**2 / 6 * a_cont @ a_cont @ a_cont
        )
    b_cont = jnp.linalg.solve(
        tiny.dt * jnp.eye(12)
        + tiny.dt**2 / 2 * a_cont
        + tiny.dt**3 / 6 * a_cont @ a_cont,
        bd_t,
    )
    d_cont = jnp.linalg.solve(
        tiny.dt * jnp.eye(12)
        + tiny.dt**2 / 2 * a_cont
        + tiny.dt**3 / 6 * a_cont @ a_cont,
        dd_t,
    )

    aug = jnp.zeros((25, 25))
    aug = aug.at[0:12, 0:12].set(a_cont)
    aug = aug.at[0:12, 12:24].set(b_cont)
    aug = aug.at[0:12, 24].set(d_cont)
    exact = jax.scipy.linalg.expm(aug * CFG.dt)
    np.testing.assert_allclose(ad, exact[0:12, 0:12], atol=1e-8)
    np.testing.assert_allclose(bd, exact[0:12, 12:24], atol=1e-8)
    np.testing.assert_allclose(dd, exact[0:12, 24], atol=1e-8)


def test_condensation_matches_rollout():
    _, foot, x0, _, _ = _standing_setup()
    ad, bd, dd = mpc_srb.get_linear_dynamics(CFG, x0, foot)
    xfree, su = mpc_srb._condense(CFG, ad, bd, dd, x0)

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(CFG.n_dec,)))
    xs = xfree + su @ u

    x = x0
    for k in range(CFG.horizon):
        x = ad @ x + bd @ u[12 * k : 12 * k + 12] + dd
        np.testing.assert_allclose(xs[12 * k : 12 * k + 12], x, atol=1e-10)


def test_standing_solve_balances_gravity():
    state, foot, x0, sched, ref = _standing_setup()
    out = mpc_srb.run_mpc(CFG, QP, x0, foot, sched, ref)
    assert bool(out.sol.converged)
    f = np.asarray(out.forces)
    # total vertical force over the first knot ~ weight + height-error push
    assert f[0, :, 2].sum() > CFG.srb.mass * CFG.srb.g * 0.9
    # friction pyramid satisfied at every knot
    assert (np.abs(f[..., 0]) <= CFG.mu / np.sqrt(2) * f[..., 2] + 1e-6).all()
    assert (np.abs(f[..., 1]) <= CFG.mu / np.sqrt(2) * f[..., 2] + 1e-6).all()
    assert (f[..., 2] >= -1e-8).all() and (f[..., 2] <= CFG.fz_max + 1e-6).all()
    # predicted terminal height approaches the reference
    assert abs(float(out.states[-1, 2]) - 0.28) < 0.02


def test_swing_forces_exactly_zero_under_trot_schedule():
    _, foot, x0, _, ref = _standing_setup()
    sched = mpc_srb.trot_schedule(CFG, jnp.asarray(0, jnp.int32))
    out = mpc_srb.run_mpc(CFG, QP, x0, foot, sched, ref)
    f = np.asarray(out.forces)
    swing = np.asarray(1 - sched, bool)
    assert np.abs(f[swing]).max() == 0.0
    stance = np.asarray(sched, bool)
    assert np.abs(f[stance][..., 2]).max() > 10.0


def test_closed_loop_standing_recovers_perturbation():
    """MPC + nonlinear SRB simulator: start 4 cm low with lateral velocity
    and a roll offset; the loop must settle to the 0.28 m set-point."""
    dtype = jnp.float64
    _, foot, _, sched, ref = _standing_setup(dtype)
    state = srb.SrbState(
        jnp.asarray([0.02, -0.01, 0.24], dtype),
        jnp.asarray([0.15, -0.1, 0.0], dtype),
        np.asarray(
            jax.scipy.linalg.expm(np.asarray(0.08 * np.array(
                [[0, 0, 0], [0, 0, -1], [0, 1, 0.0]]))),
        ).astype(np.float64),
        jnp.zeros(3, dtype),
    )
    state = srb.SrbState(state.p, state.v, jnp.asarray(state.r, dtype), state.w)

    @jax.jit
    def step(state):
        x0 = mpc_srb.pack_state(state)
        out = mpc_srb.run_mpc(CFG, QP, x0, foot, sched, ref)
        # apply the first-knot forces through 3 substeps of the nonlinear sim
        def sub(s, _):
            return srb.step(CFG.srb, s, foot, out.forces[0], CFG.dt / 3), None
        state, _ = jax.lax.scan(sub, state, None, length=3)
        return state

    for _ in range(50):
        state = step(state)

    assert abs(float(state.p[2]) - 0.28) < 5e-3
    assert float(jnp.linalg.norm(state.v)) < 0.05
    rpy = mpc_srb.pack_state(state)[6:9]
    assert float(jnp.abs(rpy[0:2]).max()) < 0.02


def test_batched_solve_matches_single():
    _, foot, x0, sched, ref = _standing_setup()
    batch = 4
    x0_b = jnp.tile(x0, (batch, 1)).at[:, 2].add(
        jnp.linspace(0.0, 0.02, batch)
    )
    out_b = mpc_srb.run_mpc_batch(
        CFG, QP,
        x0_b,
        jnp.tile(foot, (batch, 1, 1)),
        jnp.tile(sched, (batch, 1, 1)),
        jnp.tile(ref, (batch, 1, 1)),
    )
    out_0 = mpc_srb.run_mpc(CFG, QP, x0_b[2], foot, sched, ref)
    np.testing.assert_allclose(
        out_b.forces[2], out_0.forces, rtol=1e-8, atol=1e-7
    )


@pytest.mark.slow
def test_trot_template_tracks_velocity():
    """Rolling-horizon SRB-MPC trot on the nonlinear template: tracks a
    forward velocity command with level attitude and held height."""
    cfg = CFG
    qp = QpConfig(abstol=1e-4, reltol=1e-4, reg_primal=1e-6, reg_dual=1e-6,
                  max_iters=15)
    st = srb.init_state(p=(0.0, 0.0, 0.28))
    v_des = jnp.asarray([0.3, 0.0, 0.0])
    fin, hist = mpc_srb.trot_template_rollout(cfg, qp, st, v_des,
                                              n_half_cycles=12)
    h = np.asarray(hist)
    assert h[-1, 0] > 0.4                       # forward progress
    vx_tail = h[30:, 3]
    assert 0.25 < vx_tail.mean() < 0.45         # velocity tracking
    assert np.abs(h[:, 2] - 0.28).max() < 0.02  # height held
    assert np.abs(h[-1, 6:8]).max() < 0.05      # level attitude
