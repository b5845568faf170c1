import jax.numpy as jnp
import numpy as np
import pytest

from srbx.ops import bezier as bz


def _ref_bezier(alpha, s):
    """Direct de Casteljau evaluation for cross-checking."""
    pts = list(alpha)
    while len(pts) > 1:
        pts = [(1 - s) * p + s * q for p, q in zip(pts[:-1], pts[1:])]
    return pts[0]


@pytest.mark.parametrize("degree", [3, 4, 7])
def test_bezier_matches_de_casteljau(degree):
    rng = np.random.default_rng(0)
    alpha = rng.normal(size=degree + 1)
    for s in [0.0, 0.2, 0.5, 0.77, 1.0, 1.05]:
        got = float(bz.bezier(jnp.asarray(alpha), s))
        want = _ref_bezier(alpha, s)
        assert abs(got - want) < 1e-12


def test_bezier_endpoint_interpolation():
    alpha = jnp.asarray([1.0, 5.0, -2.0, 0.5, 3.0])
    assert float(bz.bezier(alpha, 0.0)) == pytest.approx(1.0)
    assert float(bz.bezier(alpha, 1.0)) == pytest.approx(3.0)


def test_bezier_derivatives_finite_difference():
    rng = np.random.default_rng(1)
    alpha = jnp.asarray(rng.normal(size=8))
    s, eps = 0.4, 1e-6
    d_num = (float(bz.bezier(alpha, s + eps)) - float(bz.bezier(alpha, s - eps))) / (2 * eps)
    assert float(bz.bezier_d(alpha, s)) == pytest.approx(d_num, abs=1e-6)
    dd_num = (
        float(bz.bezier(alpha, s + eps))
        - 2 * float(bz.bezier(alpha, s))
        + float(bz.bezier(alpha, s - eps))
    ) / eps**2
    assert float(bz.bezier_dd(alpha, s)) == pytest.approx(dd_num, rel=1e-3)


def test_fit_domain_bezier_interpolates_knots():
    rng = np.random.default_rng(2)
    knots = jnp.asarray(rng.normal(size=(4, 5)))
    alpha = bz.fit_domain_bezier(knots)
    for i, s in enumerate(np.linspace(0, 1, 5)):
        vals = bz.bezier(alpha, s)
        np.testing.assert_allclose(np.asarray(vals), np.asarray(knots[:, i]), atol=1e-10)


def test_fit_domain_bezier_batched():
    rng = np.random.default_rng(3)
    knots = jnp.asarray(rng.normal(size=(7, 4, 5)))
    alpha = bz.fit_domain_bezier(knots)
    assert alpha.shape == (7, 4, 5)
    np.testing.assert_allclose(
        np.asarray(bz.bezier(alpha, 1.0)), np.asarray(knots[..., -1]), atol=1e-10
    )


def test_varying_bezier_static_control_points_reduces_to_plain():
    alpha = jnp.asarray([0.1, 0.2, 0.3, 0.9])
    zeros = jnp.zeros_like(alpha)
    pos, vel, acc = bz.varying_bezier(alpha, zeros, zeros, 0.3, dt=0.172)
    assert float(pos) == pytest.approx(float(bz.bezier(alpha, 0.3)))
    assert float(vel) == pytest.approx(float(bz.bezier_d(alpha, 0.3)) / 0.172)
    assert float(acc) == pytest.approx(float(bz.bezier_dd(alpha, 0.3)) / 0.172**2)


def test_cubic_hermite_endpoints():
    p = bz.cubic(0.0, 0.0, 2.0, 1.0, 5.0, 0.3, -0.1)
    assert float(p) == pytest.approx(1.0)
    p = bz.cubic(2.0, 0.0, 2.0, 1.0, 5.0, 0.3, -0.1)
    assert float(p) == pytest.approx(5.0)
    v0 = bz.cubic_dot(0.0, 0.0, 2.0, 1.0, 5.0, 0.3, -0.1)
    assert float(v0) == pytest.approx(0.3)
    vf = bz.cubic_dot(2.0, 0.0, 2.0, 1.0, 5.0, 0.3, -0.1)
    assert float(vf) == pytest.approx(-0.1)
