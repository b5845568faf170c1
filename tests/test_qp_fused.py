"""Fused single-kernel Pallas IPM vs the step-fused batch path.

Runs the fused kernel in Pallas interpret mode on CPU (f64, conftest) and
enforces equality with srbx.ops.qp_batch (itself equality-tested against the
vmapped srbx.ops.qp reference path).
"""

import jax.numpy as jnp
import numpy as np

from srbx.config import MpcConfig, QpConfig
from srbx.ocp import assemble, default_footholds
from srbx.ops import qp_batch, qp_fused


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


def test_fused_matches_batch_path():
    rng = np.random.default_rng(3)
    batch = _random_batch(rng, 6, 14, 5, 22)
    fs = qp_fused.solve(*batch, QpConfig(), tile=8, interpret=True)
    bs = qp_batch.solve(*batch, QpConfig())
    assert bool(fs.converged.all())
    np.testing.assert_allclose(np.asarray(fs.x), np.asarray(bs.x), atol=1e-9)
    np.testing.assert_allclose(np.asarray(fs.y), np.asarray(bs.y), atol=1e-8)
    np.testing.assert_allclose(np.asarray(fs.z), np.asarray(bs.z), atol=1e-8)


def test_fused_warm_start():
    rng = np.random.default_rng(4)
    batch = _random_batch(rng, 4, 10, 3, 12)
    cold = qp_batch.solve(*batch, QpConfig())
    # identical warm-start trajectory: fused vs step-fused path
    warm_b = qp_batch.solve(*batch, QpConfig(), x0=cold.x)
    warm_f = qp_fused.solve(*batch, QpConfig(), tile=4, interpret=True,
                            x0=cold.x)
    assert bool(warm_f.converged.all())
    np.testing.assert_allclose(np.asarray(warm_f.x), np.asarray(warm_b.x),
                               atol=1e-9)
    # and the warm solve lands on the same optimum to solver tolerance
    np.testing.assert_allclose(np.asarray(warm_f.x), np.asarray(cold.x),
                               atol=1e-4)


def test_fused_noeq_specialization():
    """me=0 (the simplex-eliminated production shape) runs the specialized
    no-Schur kernel; results must match the step-fused path with genuinely
    empty equality blocks."""
    rng = np.random.default_rng(7)
    B, n, mi = 6, 13, 28
    P, c, _, _, G, h = _random_batch(rng, B, n, 1, mi)
    A0 = jnp.zeros((B, 0, n))
    b0 = jnp.zeros((B, 0))
    fs = qp_fused.solve(P, c, A0, b0, G, h, QpConfig(), tile=8, interpret=True)
    bs = qp_batch.solve(P, c, A0, b0, G, h, QpConfig())
    assert bool(fs.converged.all())
    np.testing.assert_allclose(np.asarray(fs.x), np.asarray(bs.x), atol=1e-9)
    np.testing.assert_allclose(np.asarray(fs.z), np.asarray(bs.z), atol=1e-8)
    # warm start through the specialized kernel too
    ws = qp_fused.solve(P, c, A0, b0, G, h, QpConfig(), tile=8, interpret=True,
                        x0=fs.x)
    assert bool(ws.converged.all())
    np.testing.assert_allclose(np.asarray(ws.x), np.asarray(fs.x), atol=1e-4)


def test_fused_on_nmpc_problem():
    """The real padded NMPC QP shape (n=41, me=28, mi=92) incl. inert rows."""
    cfg = MpcConfig()
    x0 = jnp.asarray([0.02, 0.1, -0.01, 0.0])
    t = np.arange(4)
    ref = jnp.asarray(np.stack([0.05 + 0.02 * t, 0.4 * np.ones(4),
                                -0.01 * np.ones(4), np.zeros(4)]))
    foot = default_footholds(jnp.asarray([0.0, 0.0]))
    d = assemble(cfg, x0, ref, foot, jnp.ones(4))
    B = 3
    batch = [jnp.broadcast_to(x, (B,) + x.shape) for x in d]
    fs = qp_fused.solve(*batch, QpConfig(), tile=4, interpret=True)
    bs = qp_batch.solve(*batch, QpConfig())
    assert bool(fs.converged.all())
    np.testing.assert_allclose(np.asarray(fs.x), np.asarray(bs.x), atol=1e-8)
