import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srbx.config import MpcConfig, QpConfig
from srbx.ocp import assemble, default_footholds
from srbx.ops import batch_linalg as bl
from srbx.ops import qp, qp_batch


def test_lanes_cholesky_and_solves():
    rng = np.random.default_rng(0)
    B, n, k = 9, 24, 6
    ms = np.stack([(lambda a: a @ a.T + n * np.eye(n))(rng.normal(size=(n, n)))
                   for _ in range(B)], axis=-1)
    m = jnp.asarray(ms)
    l = bl.cholesky_lanes(m)
    rec = jnp.einsum("ikb,jkb->ijb", l, l)
    assert float(jnp.abs(rec - m).max()) < 1e-10
    rhs = jnp.asarray(rng.normal(size=(n, k, B)))
    x = bl.cho_solve_lanes(l, rhs)
    res = jnp.einsum("ijb,jkb->ikb", m, x) - rhs
    assert float(jnp.abs(res).max()) < 1e-9


def _random_batch(rng, B, n, me, mi):
    probs = []
    for _ in range(B):
        m = rng.normal(size=(n, n))
        P = m @ m.T + n * np.eye(n)
        c = rng.normal(size=n)
        A = rng.normal(size=(me, n))
        xf = rng.normal(size=n) * 0.3
        b = A @ xf
        G = rng.normal(size=(mi, n))
        h = G @ xf + rng.uniform(0.1, 1.0, mi)
        probs.append((P, c, A, b, G, h))
    return [jnp.asarray(np.stack(t)) for t in zip(*probs)]


def test_batch_native_matches_vmap_path():
    rng = np.random.default_rng(1)
    batch = _random_batch(rng, 6, 14, 5, 22)
    bs = qp_batch.solve(*batch, QpConfig())
    vs = qp.solve_batch(*batch, QpConfig())
    assert bool(bs.converged.all())
    np.testing.assert_allclose(np.asarray(bs.x), np.asarray(vs.x), atol=1e-9)


def test_batch_native_on_nmpc_problem():
    cfg = MpcConfig()
    x0 = jnp.asarray([0.02, 0.1, -0.01, 0.0])
    t = np.arange(4)
    ref = jnp.asarray(np.stack([0.05 + 0.02 * t, 0.4 * np.ones(4),
                                -0.01 * np.ones(4), np.zeros(4)]))
    foot = default_footholds(jnp.asarray([0.0, 0.0]))
    d = assemble(cfg, x0, ref, foot, jnp.ones(4))
    B = 16
    batch = [jnp.broadcast_to(x, (B,) + x.shape) for x in d]
    sol = qp_batch.solve(*batch, QpConfig())
    assert bool(sol.converged.all())
    single = qp.solve(*d, QpConfig())
    np.testing.assert_allclose(np.asarray(sol.x[3]), np.asarray(single.x), atol=1e-8)


def test_batch_native_nan_lane_freezes_not_poisons():
    rng = np.random.default_rng(2)
    batch = _random_batch(rng, 4, 10, 3, 12)
    # lane 2: contradictory constraints
    G = batch[4]
    h = batch[5]
    G = G.at[2, 0].set(G[2, 1])
    h = h.at[2, 0].set(-h[2, 1] - 10.0)
    batch[4], batch[5] = G, h
    sol = qp_batch.solve(*batch, QpConfig())
    assert bool(jnp.isfinite(sol.x).all())
    assert bool(sol.converged[0]) and bool(sol.converged[3])


def test_batch_ruiz_matches_plain():
    """cfg.ruiz_iters preprocessing returns the same solution through the
    batch path (any backend) as the unscaled solve."""
    rng = np.random.default_rng(5)
    P, c, A, b, G, h = _random_batch(rng, 6, 10, 3, 16)
    plain = qp_batch.solve(P, c, A, b, G, h, QpConfig())
    eq = qp_batch.solve(P, c, A, b, G, h, QpConfig(ruiz_iters=3))
    assert bool(eq.converged.all())
    np.testing.assert_allclose(eq.x, plain.x, rtol=1e-4, atol=1e-6)
    # dual variables must unscale back to the original problem's multipliers
    rx = (
        jnp.einsum("bnm,bm->bn", P, eq.x) + c
        + jnp.einsum("bmn,bm->bn", A, eq.y)
        + jnp.einsum("bmn,bm->bn", G, eq.z)
    )
    assert float(jnp.abs(rx).max()) < 1e-5
