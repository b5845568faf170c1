"""Motion planner branches (srbx.motion) vs `src/MotionPlanner.cpp`."""

import jax.numpy as jnp
import numpy as np

from srbx import motion
from srbx.config import MotionConfig

M = MotionConfig()


def _state():
    com0 = jnp.asarray([0.0, 0.0, 0.12])
    toes = jnp.asarray(
        [[0.18, -0.13, 0.0], [0.18, 0.13, 0.0],
         [-0.18, -0.13, 0.0], [-0.18, 0.13, 0.0]]
    )
    return motion.init(M, com0, toes), toes


def test_stand_bezier_endpoints():
    st, _ = _state()
    c0 = motion.stand_com(M, st, jnp.asarray(0.0))
    c1 = motion.stand_com(M, st, jnp.asarray(1.0))
    np.testing.assert_allclose(np.asarray(c0[0:3]), [0.0, 0.0, 0.12], atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(c1[0:3]), [0.0, 0.0, M.stand_height], atol=1e-12
    )
    assert abs(float(c0[5])) < 1e-9 and abs(float(c1[5])) < 1e-9


def test_trot_alternates_diagonals():
    st, toes = _state()
    mpc_states = jnp.zeros((4, 4)).at[:, 1].set(0.4)
    st1 = motion.plan_trot(M, st, jnp.asarray(True),
                           jnp.asarray([1, 0, 0, 1]), toes,
                           jnp.zeros(2), mpc_states)
    np.testing.assert_array_equal(np.asarray(st1.des_domain), [0, 1, 1, 0])
    assert float(st1.dom_ticks) == M.trot_dom_ticks
    assert float(st1.step_len[0]) > 0.0       # forward Raibert step
    # no domain change -> pass-through
    st2 = motion.plan_trot(M, st1, jnp.asarray(False),
                           st1.des_domain, toes, jnp.zeros(2), mpc_states)
    np.testing.assert_array_equal(
        np.asarray(st2.des_domain), np.asarray(st1.des_domain)
    )


def test_walk_cycles_single_swing_legs():
    st, toes = _state()
    rot = jnp.eye(3)
    seen = []
    for _ in range(4):
        st = motion.plan_walk(M, st, jnp.asarray(True), toes,
                              jnp.zeros(3), rot, fwd_speed=0.2)
        d = np.asarray(st.des_domain)
        assert d.sum() == 3                   # exactly one swing leg
        seen.append(int(np.argmin(d)))
    assert sorted(seen) == [0, 1, 2, 3]       # every leg swings once


def test_inplace_walk_matches_reference_cycle():
    """`src/MotionPlanner.cpp:164-177`: swing order FR, FL, RL, RR."""
    st, toes = _state()
    order = []
    for _ in range(4):
        st = motion.plan_inplace_walk(M, st, jnp.asarray(True), toes)
        assert float(st.dom_ticks) == 300.0
        order.append(int(np.argmin(np.asarray(st.des_domain))))
    assert order == [1, 3, 2, 0]              # row cycle starts at n=1


def test_tap_holds_fl_raised():
    st, toes = _state()
    st = motion.plan_tap(M, st, jnp.asarray(True), toes)
    np.testing.assert_array_equal(np.asarray(st.des_domain), [1, 0, 1, 1])
    assert float(st.dom_ticks) == 1500.0
    np.testing.assert_allclose(np.asarray(st.step_len), 0.0)


def test_pace_lateral_pairs():
    st, toes = _state()
    st = motion.plan_pace(M, st, jnp.asarray(True), jnp.asarray([1, 0, 1, 0]),
                          toes, jnp.zeros(3), jnp.eye(3))
    np.testing.assert_array_equal(np.asarray(st.des_domain), [0, 1, 0, 1])


def test_pose_sinusoid_starts_at_lock():
    lock = jnp.zeros(12).at[2].set(0.28)
    com = motion.pose_com(M, 2, jnp.asarray(3.0), jnp.asarray(3.0), lock)
    np.testing.assert_allclose(np.asarray(com), np.asarray(lock), atol=1e-12)
