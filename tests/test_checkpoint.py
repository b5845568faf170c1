"""Checkpoint save/restore of loop carries (reference analogue:
`sharedData` backup/restore, `src/A1_Sim_Series.cpp:527-537`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srbx import mpc
from srbx.io import checkpoint


def _carry(B=4, dtype=jnp.float64):
    return mpc.MpcCarry(
        jnp.arange(B, dtype=jnp.int32),
        jnp.linspace(0.0, 1.0, 4 * B, dtype=dtype).reshape(B, 4),
    )


def test_roundtrip(tmp_path):
    c = _carry()
    p = tmp_path / "carry.npz"
    checkpoint.save(p, c)
    r = checkpoint.restore(p, jax.tree_util.tree_map(jnp.zeros_like, c))
    assert isinstance(r, mpc.MpcCarry)
    np.testing.assert_array_equal(np.asarray(r.gait_domain),
                                  np.asarray(c.gait_domain))
    np.testing.assert_allclose(np.asarray(r.alpha_buffer),
                               np.asarray(c.alpha_buffer))


def test_shape_guard(tmp_path):
    c = _carry(B=4)
    p = tmp_path / "carry.npz"
    checkpoint.save(p, c)
    with pytest.raises(ValueError):
        checkpoint.restore(p, _carry(B=8))


def test_dtype_follows_template(tmp_path):
    c = _carry(dtype=jnp.float64)
    p = tmp_path / "carry.npz"
    checkpoint.save(p, c)
    r = checkpoint.restore(p, _carry(dtype=jnp.float32))
    assert np.asarray(r.alpha_buffer).dtype == np.float32
