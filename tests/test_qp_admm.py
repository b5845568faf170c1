"""OSQP-style ADMM backend vs the IPM reference path.

ADMM converges linearly, so agreement with the IPM optimum is asserted at
moderate tolerance (the solver's own abstol/reltol), not IPM tolerance.
"""

import jax.numpy as jnp
import numpy as np

from srbx.config import AdmmConfig, MpcConfig, QpConfig
from srbx.ocp import assemble, condense, default_footholds, expansion
from srbx.ops import qp_admm, qp_batch

from test_qp_fused import _random_batch


def test_admm_matches_ipm_random():
    rng = np.random.default_rng(11)
    batch = _random_batch(rng, 6, 14, 5, 22)
    ad = qp_admm.solve(*batch, AdmmConfig())
    ip = qp_batch.solve(*batch, QpConfig())
    assert bool(ad.converged.all())
    np.testing.assert_allclose(np.asarray(ad.x), np.asarray(ip.x), atol=2e-3)
    # duals at looser tolerance (primal converges first in ADMM)
    np.testing.assert_allclose(np.asarray(ad.y), np.asarray(ip.y), atol=2e-2)
    np.testing.assert_allclose(np.asarray(ad.z), np.asarray(ip.z), atol=2e-2)


def test_admm_tight_tolerance():
    """Driving the tolerance down tracks the IPM optimum more closely."""
    rng = np.random.default_rng(12)
    batch = _random_batch(rng, 4, 10, 3, 12)
    cfg = AdmmConfig(abstol=1e-7, reltol=1e-7, max_iters=4000)
    ad = qp_admm.solve(*batch, cfg)
    ip = qp_batch.solve(*batch, QpConfig())
    assert bool(ad.converged.all())
    np.testing.assert_allclose(np.asarray(ad.x), np.asarray(ip.x), atol=1e-5)


def test_admm_noeq_production_shape():
    """The simplex-eliminated condensed NMPC shape (n=13, me=0, mi=28)."""
    rng = np.random.default_rng(13)
    B, n, mi = 6, 13, 28
    P, c, _, _, G, h = _random_batch(rng, B, n, 1, mi)
    A0 = jnp.zeros((B, 0, n))
    b0 = jnp.zeros((B, 0))
    ad = qp_admm.solve(P, c, A0, b0, G, h, AdmmConfig())
    ip = qp_batch.solve(P, c, A0, b0, G, h, QpConfig())
    assert bool(ad.converged.all())
    np.testing.assert_allclose(np.asarray(ad.x), np.asarray(ip.x), atol=2e-3)


def test_admm_warm_start():
    """Full primal-dual warm start at the optimum converges immediately
    (first residual check) and stays at the optimum."""
    rng = np.random.default_rng(14)
    batch = _random_batch(rng, 4, 10, 3, 12)
    cold = qp_admm.solve(*batch, AdmmConfig(abstol=1e-6, reltol=1e-6,
                                            max_iters=4000))
    assert bool(cold.converged.all())
    warm = qp_admm.solve(*batch, AdmmConfig(), x0=cold.x, y0=cold.y,
                         z0=cold.z)
    assert bool(warm.converged.all())
    assert int(warm.iters) <= int(cold.iters)
    np.testing.assert_allclose(np.asarray(warm.x), np.asarray(cold.x),
                               atol=2e-3)


def test_admm_on_real_nmpc_qp():
    """The actual condensed NMPC QP data (elide_simplex production path)."""
    cfg = MpcConfig(elide_box_rows=True, elide_simplex=True)
    dtype = jnp.float64
    x0 = jnp.asarray([0.0, 0.05, 0.4, 0.0], dtype)
    t = np.arange(4)
    ref = jnp.asarray(
        np.stack([0.05 + 0.02 * t, 0.4 * np.ones(4), -0.01 * np.ones(4),
                  np.zeros(4)]), dtype)
    foot = default_footholds(jnp.asarray([0.0, 0.4], dtype))
    ci = jnp.ones(4, dtype)
    data = assemble(cfg, x0, ref, foot, ci, dtype=dtype)
    e_mat, e0 = expansion(cfg, x0, foot, ci, dtype=dtype)
    cnd = condense(cfg, data, e_mat, e0)
    batch = [jnp.stack([z]) for z in
             (cnd.P, cnd.c, cnd.A, cnd.b, cnd.G, cnd.h)]
    ad = qp_admm.solve(*batch, AdmmConfig(abstol=1e-6, reltol=1e-6,
                                          max_iters=4000))
    ip = qp_batch.solve(*batch, QpConfig())
    assert bool(ad.converged.all())
    assert bool(ip.converged.all())
    # The condensed P is PSD-singular (within a knot, lambdas mapping to
    # the same COP are cost-free), so raw x is non-unique across solvers.
    # Compare the physics: objective, feasibility, and the expanded LIP
    # state trajectory (which the tracking cost does make unique).
    Pm, cm, Gm, hm = (np.asarray(cnd.P), np.asarray(cnd.c),
                      np.asarray(cnd.G), np.asarray(cnd.h))

    def obj(x):
        return 0.5 * x @ Pm @ x + cm @ x

    xa, xi = np.asarray(ad.x[0]), np.asarray(ip.x[0])
    assert (Gm @ xa - hm).max() < 1e-4
    np.testing.assert_allclose(obj(xa), obj(xi),
                               rtol=1e-4, atol=1e-4)
    em, e0n = np.asarray(e_mat), np.asarray(e0)
    full_a, full_i = e0n + em @ xa, e0n + em @ xi
    nN = cfg.n_state * cfg.horizon
    np.testing.assert_allclose(full_a[:nN], full_i[:nN], atol=1e-3)
