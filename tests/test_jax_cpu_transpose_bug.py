"""Regression guard for a jax 0.9.0 XLA-CPU wrong-code bug found this round.

On the CPU backend with x64 enabled, TRANSPOSING A CLOSURE-CAPTURED
CONSTANT inside a jitted function constant-folds to a RESHAPE: the (2, 9)
f64 constant's data is reinterpreted row-major as (9, 2) instead of being
permuted. Measured: jit output matches numpy evaluated with
`const.reshape(9, 2)` to 1e-15 while the correct `const.T` differs by 4e-3;
unjitted vmap, jit with the array passed as an ARGUMENT, f32, and the TPU
backend are all correct.

This bit scripts/recover_hlpath_scenario.py's final evaluation (reported
44 mm rms for a field whose true rms is 0.23 mm) — docs/ROUND5.md. srbx
production paths are unaffected (audited: every transposed operand on the
jitted CPU paths is traced, not a folded constant; the TPU compute path is
clean by direct test), but tests run on CPU+x64, so this file pins both
the hazard and the mitigation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

CONST = np.random.default_rng(0).normal(size=(2, 9))


def _force_sum(p, c):
    d = jnp.linalg.norm(p[:, None, :] - c[None, :, :], axis=-1)
    fr = jnp.where(d < 1.0, 1.0 / jnp.maximum(d, 1e-9), 0.0)
    return jnp.sum(fr[..., None] * (p[:, None, :] - c[None, :, :]), axis=1)


@pytest.fixture(scope="module")
def points():
    return jnp.asarray(np.random.default_rng(1).normal(size=(64, 4, 2)))


def test_mitigation_pattern_argument_passing_is_exact(points):
    """The pattern srbx uses everywhere: the array reaches the jitted
    function as an ARGUMENT (or is transposed before tracing). Must match
    the unjitted execution bitwise-closely."""
    cdev = jnp.asarray(CONST)

    eager = jax.vmap(lambda p: _force_sum(p, cdev.T))(points)
    as_arg = jax.jit(
        lambda P, C: jax.vmap(lambda p: _force_sum(p, C))(P)
    )(points, cdev.T)
    pre_t = jax.jit(jax.vmap(lambda p, c=jnp.asarray(CONST.copy()).T:
                             _force_sum(p, c)))
    np.testing.assert_allclose(np.asarray(as_arg), np.asarray(eager),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(pre_t(points)), np.asarray(eager),
                               atol=1e-12)


@pytest.mark.xfail(
    strict=False,
    reason="jax 0.9.0 XLA-CPU x64: transpose of a closure constant inside "
    "jit folds to a reshape (data not permuted); passes once upstream "
    "fixes constant folding",
)
def test_upstream_transpose_constant_folding():
    """Runs in a subprocess: the trigger is environment-order sensitive
    (this test session's jax.config.update('jax_platforms', ...) path masks
    it), but a plain `JAX_PLATFORMS=cpu` process reproduces it
    deterministically."""
    import os
    import subprocess
    import sys

    code = """
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
const = np.random.default_rng(0).normal(size=(2, 9))
cdev = jnp.asarray(const)
P = jnp.asarray(np.random.default_rng(1).normal(size=(64, 4, 2)))
def f(p):
    c = cdev.T
    d = jnp.linalg.norm(p[:, None, :] - c[None, :, :], axis=-1)
    fr = jnp.where(d < 1.0, 1.0 / jnp.maximum(d, 1e-9), 0.0)
    return jnp.sum(fr[..., None] * (p[:, None, :] - c[None, :, :]), axis=1)
a = jax.vmap(f)(P); b = jax.jit(jax.vmap(f))(P)
print(float(jnp.abs(a - b).max()))
"""
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=240)
    assert out.returncode == 0, out.stderr
    diff = float(out.stdout.strip().splitlines()[-1])
    assert diff < 1e-10, (
        f"jit(vmap) transposed-constant divergence: {diff} "
        f"(upstream XLA-CPU constant-folding bug still present)")
