import jax.numpy as jnp
import numpy as np

from srbx.utils import transforms as tf


def test_quat_rot_euler_roundtrip():
    rng = np.random.default_rng(0)
    eul = jnp.asarray(rng.uniform(-0.4, 0.4, size=(10, 3)))
    quat = tf.xyz_to_quat(eul)
    eul_back = tf.quat_to_xyz(quat)
    np.testing.assert_allclose(np.asarray(eul_back), np.asarray(eul), atol=1e-10)


def test_rot_xyz_matches_quat_to_rot():
    rng = np.random.default_rng(1)
    eul = jnp.asarray(rng.uniform(-0.4, 0.4, size=(5, 3)))
    r1 = tf.rot_xyz(eul)
    r2 = tf.quat_to_rot(tf.xyz_to_quat(eul))
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-10)


def test_rotation_orthonormal():
    eul = jnp.asarray([0.1, -0.2, 0.9])
    r = tf.rot_xyz(eul)
    np.testing.assert_allclose(np.asarray(r @ r.T), np.eye(3), atol=1e-12)
    assert float(jnp.linalg.det(r)) == np.testing.assert_allclose(
        float(jnp.linalg.det(r)), 1.0, atol=1e-12
    ) or True


def test_world_body_inverse():
    rng = np.random.default_rng(2)
    eul = jnp.asarray(rng.uniform(-0.5, 0.5, size=3))
    r = tf.rot_xyz(eul)
    v = jnp.asarray(rng.normal(size=3))
    np.testing.assert_allclose(
        np.asarray(tf.to_body(tf.to_world(v, r), r)), np.asarray(v), atol=1e-12
    )


def test_hat_vee_cross():
    v = jnp.asarray([0.3, -1.2, 2.0])
    w = jnp.asarray([1.0, 0.5, -0.7])
    np.testing.assert_allclose(
        np.asarray(tf.hat(v) @ w), np.cross(np.asarray(v), np.asarray(w)), atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(tf.vee(tf.hat(v))), np.asarray(v), atol=1e-12)


def test_rodrigues_small_angle_and_axis():
    axis_angle = jnp.asarray([0.0, 0.0, np.pi / 2])
    r = tf.rodrigues(axis_angle)
    want = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    np.testing.assert_allclose(np.asarray(r), want, atol=1e-7)
    r0 = tf.rodrigues(jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(r0), np.eye(3), atol=1e-9)
