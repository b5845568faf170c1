import jax.numpy as jnp
import numpy as np

from srbx.config import LipConfig
from srbx.models import lip


def _reference_taylor3(g=9.81, h=0.29, ts=0.043):
    """Literal transcription of the discretization formula the reference
    documents (`src/MPC_dist.cpp:117-127`), in plain numpy."""
    a = np.zeros((4, 4))
    a[0, 1] = 1.0
    a[1, 0] = g / h
    a[2, 3] = 1.0
    a[3, 2] = g / h
    b = np.zeros((4, 2))
    b[1, 0] = -g / h
    b[3, 1] = -g / h
    ad = (
        np.eye(4)
        + a * ts
        + 0.5 * a @ a * ts**2
        + a @ a @ a * ts**3 / 6.0
    )
    bd = np.linalg.inv(a) @ (ad - np.eye(4)) @ b
    return ad, bd


def test_discrete_matches_reference_formula():
    cfg = LipConfig()
    ad, bd = lip.discrete(cfg)
    ad_ref, bd_ref = _reference_taylor3()
    np.testing.assert_allclose(ad, ad_ref, atol=1e-14)
    np.testing.assert_allclose(bd, bd_ref, atol=1e-14)


def test_discrete_close_to_exact():
    cfg = LipConfig()
    ad3, _ = lip.discrete(cfg)
    ad_exact, _ = lip.discrete_exact(cfg)
    # Taylor-3 at w*T ~ 0.25 should agree with the exact ZOH to ~(wT)^4/24.
    assert np.abs(ad3 - ad_exact).max() < 5e-4


def test_step_and_rollout_consistency():
    cfg = LipConfig()
    x0 = jnp.asarray([0.1, 0.05, -0.2, 0.0])
    us = jnp.asarray(np.random.default_rng(0).normal(size=(4, 2)) * 0.05)
    xs = lip.rollout(cfg, x0, us)
    x = x0
    for k in range(4):
        x = lip.step(cfg, x, us[k])
        np.testing.assert_allclose(np.asarray(xs[k]), np.asarray(x), atol=1e-12)


def test_equilibrium_cop_under_com_holds():
    """COP directly under a static COM is an equilibrium of the LIP."""
    cfg = LipConfig()
    x = jnp.asarray([1.0, 0.0, -2.0, 0.0])
    u = jnp.asarray([1.0, -2.0])
    x_next = lip.step(cfg, x, u)
    np.testing.assert_allclose(np.asarray(x_next), np.asarray(x), atol=1e-12)


def test_batched_step():
    cfg = LipConfig()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(16, 4)))
    u = jnp.asarray(rng.normal(size=(16, 2)))
    out = lip.step(cfg, x, u)
    assert out.shape == (16, 4)
    one = lip.step(cfg, x[3], u[3])
    np.testing.assert_allclose(np.asarray(out[3]), np.asarray(one), atol=1e-12)
