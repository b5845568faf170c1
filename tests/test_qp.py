import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize

from srbx.config import QpConfig
from srbx.ops import qp


CFG = QpConfig()


def _random_qp(rng, n, me, mi):
    """Random strictly-convex, strictly-feasible QP."""
    m = rng.normal(size=(n, n))
    P = m @ m.T + n * np.eye(n)
    c = rng.normal(size=n)
    A = rng.normal(size=(me, n))
    x_feas = rng.normal(size=n) * 0.3
    b = A @ x_feas
    G = rng.normal(size=(mi, n))
    h = G @ x_feas + rng.uniform(0.1, 1.0, size=mi)  # strictly feasible
    return map(jnp.asarray, (P, c, A, b, G, h))


def _kkt_check(P, c, A, b, G, h, sol, tol=1e-5):
    P, c, A, b, G, h = map(np.asarray, (P, c, A, b, G, h))
    x, y, z, s = map(np.asarray, (sol.x, sol.y, sol.z, sol.s))
    assert np.abs(P @ x + c + A.T @ y + G.T @ z).max() < tol * max(1, np.abs(c).max())
    if A.shape[0]:
        assert np.abs(A @ x - b).max() < tol * max(1, np.abs(b).max())
    assert (G @ x - h).max() < tol * max(1, np.abs(h).max())
    assert z.min() > -1e-9 and s.min() > -1e-9
    assert np.abs(z * s).max() < 1e-4


def test_equality_only_closed_form():
    rng = np.random.default_rng(0)
    n, me = 8, 3
    P, c, A, b, G, h = _random_qp(rng, n, me, 1)
    G = jnp.zeros((1, n))
    h = jnp.ones((1,))
    sol = qp.solve(P, c, A, b, G, h, CFG)
    # closed-form KKT solve
    kkt = np.block([[np.asarray(P), np.asarray(A).T], [np.asarray(A), np.zeros((me, me))]])
    rhs = np.concatenate([-np.asarray(c), np.asarray(b)])
    x_star = np.linalg.solve(kkt, rhs)[:n]
    np.testing.assert_allclose(np.asarray(sol.x), x_star, atol=1e-6)
    assert bool(sol.converged)


def test_box_projection():
    """min ||x - p||^2 s.t. -1 <= x <= 1 has solution clip(p, -1, 1)."""
    n = 6
    p = jnp.asarray([2.0, -3.0, 0.5, 0.0, 1.5, -0.2])
    P = 2.0 * jnp.eye(n)
    c = -2.0 * p
    A = jnp.zeros((0, n))
    b = jnp.zeros((0,))
    G = jnp.concatenate([jnp.eye(n), -jnp.eye(n)])
    h = jnp.ones(2 * n)
    sol = qp.solve(P, c, A, b, G, h, CFG)
    np.testing.assert_allclose(np.asarray(sol.x), np.clip(np.asarray(p), -1, 1), atol=1e-5)


@pytest.mark.parametrize("seed", [1, 2, 3, 4])
def test_random_qp_kkt(seed):
    rng = np.random.default_rng(seed)
    P, c, A, b, G, h = _random_qp(rng, 12, 4, 20)
    sol = qp.solve(P, c, A, b, G, h, CFG)
    assert bool(sol.converged), f"res={float(sol.res)}, gap={float(sol.gap)}"
    _kkt_check(P, c, A, b, G, h, sol)


def test_matches_scipy_slsqp():
    rng = np.random.default_rng(7)
    P, c, A, b, G, h = _random_qp(rng, 8, 2, 10)
    sol = qp.solve(P, c, A, b, G, h, CFG)
    Pn, cn, An, bn, Gn, hn = map(np.asarray, (P, c, A, b, G, h))
    res = scipy.optimize.minimize(
        lambda x: 0.5 * x @ Pn @ x + cn @ x,
        np.zeros(8),
        jac=lambda x: Pn @ x + cn,
        constraints=[
            {"type": "eq", "fun": lambda x: An @ x - bn, "jac": lambda x: An},
            {"type": "ineq", "fun": lambda x: hn - Gn @ x, "jac": lambda x: -Gn},
        ],
        method="SLSQP",
        options={"ftol": 1e-12, "maxiter": 200},
    )
    np.testing.assert_allclose(np.asarray(sol.x), res.x, atol=1e-5)


def test_padded_rows_are_inert():
    """Zero-G/h=1 inequality rows and zero-A/b=0 equality rows must not
    change the solution (the static-shape padding convention)."""
    rng = np.random.default_rng(5)
    P, c, A, b, G, h = _random_qp(rng, 10, 3, 12)
    sol = qp.solve(P, c, A, b, G, h, CFG)

    A_pad = jnp.concatenate([A, jnp.zeros((2, 10))])
    b_pad = jnp.concatenate([b, jnp.zeros(2)])
    G_pad = jnp.concatenate([G, jnp.zeros((6, 10))])
    h_pad = jnp.concatenate([h, jnp.ones(6)])
    sol_pad = qp.solve(P, c, A_pad, b_pad, G_pad, h_pad, CFG)
    assert bool(sol_pad.converged)
    np.testing.assert_allclose(np.asarray(sol_pad.x), np.asarray(sol.x), atol=1e-5)


def test_batched_matches_single():
    rng = np.random.default_rng(6)
    batch = 8
    probs = [_random_qp(rng, 9, 3, 14) for _ in range(batch)]
    stacked = [jnp.stack(t) for t in zip(*probs)]
    bsol = qp.solve_batch(*stacked, CFG)
    assert bool(jnp.all(bsol.converged))
    for i in range(batch):
        one = qp.solve(*[s[i] for s in stacked], CFG)
        np.testing.assert_allclose(np.asarray(bsol.x[i]), np.asarray(one.x), atol=1e-5)


def test_nmpc_sized_problem():
    """Realistic padded NMPC shape: n=41, me=28, mi=92 (MpcConfig paddings)."""
    rng = np.random.default_rng(11)
    P, c, A, b, G, h = _random_qp(rng, 41, 28, 92)
    sol = qp.solve(P, c, A, b, G, h, CFG)
    assert bool(sol.converged)
    _kkt_check(P, c, A, b, G, h, sol)
    assert int(sol.iters) <= CFG.max_iters


def test_warm_start_converges():
    rng = np.random.default_rng(12)
    P, c, A, b, G, h = _random_qp(rng, 10, 4, 16)
    cold = qp.solve(P, c, A, b, G, h, CFG)
    warm = qp.solve(P, c, A, b, G, h, CFG, x0=cold.x)
    assert bool(warm.converged)
    np.testing.assert_allclose(np.asarray(warm.x), np.asarray(cold.x), atol=1e-5)


def test_float32_convergence():
    """f32 (TPU dtype) should still reach ~1e-4 feasibility on scaled data."""
    rng = np.random.default_rng(13)
    P, c, A, b, G, h = [t.astype(jnp.float32) for t in _random_qp(rng, 12, 4, 20)]
    cfg = QpConfig(abstol=1e-4, reltol=1e-4, reg_primal=1e-6, reg_dual=1e-6)
    sol = qp.solve(P, c, A, b, G, h, cfg)
    x = np.asarray(sol.x)
    assert np.all(np.isfinite(x))
    assert (np.asarray(G) @ x - np.asarray(h)).max() < 1e-3


def test_ruiz_equilibrated_matches_plain():
    """Equilibrated solve returns the same primal/dual point (f64)."""
    rng = np.random.default_rng(7)
    P, c, A, b, G, h = _random_qp(rng, 12, 3, 20)
    plain = qp.solve(P, c, A, b, G, h, CFG)
    eq = qp.solve(P, c, A, b, G, h, QpConfig(ruiz_iters=3))
    assert bool(eq.converged)
    # both runs stop at their own convergence certificate; agreement to the
    # tolerance scale proves the unscaling is right (a wrong unscaling would
    # be off by the O(1e4) scaling factors)
    np.testing.assert_allclose(eq.x, plain.x, rtol=1e-4, atol=1e-6)
    _kkt_check(P, c, A, b, G, h, eq)


def test_ruiz_badly_scaled_f32():
    """A QP whose variable scales span ~1e8: without equilibration the f32
    IPM cannot certify convergence; 3 Ruiz sweeps fix the conditioning."""
    rng = np.random.default_rng(3)
    n, me, mi = 12, 3, 20
    P, c, A, b, G, h = map(np.asarray, _random_qp(rng, n, me, mi))
    scale = np.logspace(-4, 4, n)
    P = scale[:, None] * P * scale[None, :]
    c = scale * c
    A = A * scale[None, :]
    G = G * scale[None, :]

    f32 = lambda v: jnp.asarray(v, jnp.float32)
    args = tuple(map(f32, (P, c, A, b, G, h)))
    cfg = QpConfig(abstol=1e-4, reltol=1e-4, reg_primal=1e-6, reg_dual=1e-6,
                   ruiz_iters=3)
    eq = qp.solve(*args, cfg)
    assert bool(eq.converged)

    ref = qp.solve(*map(jnp.asarray, (P, c, A, b, G, h)), CFG)
    np.testing.assert_allclose(
        np.asarray(eq.x), np.asarray(ref.x),
        rtol=1e-3, atol=1e-3 * np.abs(np.asarray(ref.x)).max(),
    )


def test_ruiz_padded_rows_stay_inert():
    """Equilibration must not blow up the (g=0, h=1) padding convention."""
    rng = np.random.default_rng(11)
    P, c, A, b, G, h = (np.array(v) for v in _random_qp(rng, 8, 2, 10))
    G[5:] = 0.0
    h[5:] = 1.0
    A[1] = 0.0
    b[1] = 0.0
    sol = qp.solve(*map(jnp.asarray, (P, c, A, b, G, h)),
                   QpConfig(ruiz_iters=3))
    assert bool(sol.converged)
    _kkt_check(P, c, A, b, G, h, sol)
