import jax.numpy as jnp
import numpy as np

from srbx.estimation import kalman, kinest
from srbx.models import a1, rbd
from srbx.utils import transforms as tf

M = a1.model()


def test_kf_static_convergence():
    """Standing still with perfect kinematic measurements: the estimate must
    converge to the true base height."""
    st = kalman.init(com0=(0.0, 0.0, 0.2))
    true_com = jnp.asarray([0.3, -0.1, 0.31])
    # feet on the ground at known offsets
    feet = jnp.asarray(
        [[0.48, -0.23, 0.0], [0.48, 0.03, 0.0], [0.12, -0.23, 0.0], [0.12, 0.03, 0.0]]
    )
    rel = true_com[None, :] - feet      # C maps x -> com - foot
    rel = -(feet - true_com[None, :])
    imu = jnp.asarray([0.0, 0.0, 9.81])  # static accelerometer reading
    rot = jnp.eye(3)
    for _ in range(300):
        st = kalman.update(st, jnp.ones(4), imu, rot, rel)
    # absolute xy is unobservable (leg odometry anchors to the initial feet);
    # height IS observable through the foot-height rows, and the relative
    # com-foot geometry must converge exactly.
    np.testing.assert_allclose(float(st.x[2]), float(true_com[2]), atol=5e-3)
    np.testing.assert_allclose(np.asarray(st.x[3:6]), 0.0, atol=1e-2)
    est_rel = np.asarray(st.x[0:3])[None, :] - np.asarray(st.x[6:18]).reshape(4, 3)
    np.testing.assert_allclose(est_rel, np.asarray(rel), atol=5e-3)


def test_kf_constant_velocity_tracking():
    st = kalman.init(com0=(0.0, 0.0, 0.3))
    vel = np.array([0.2, 0.0, 0.0])
    feet0 = np.asarray(
        [[0.18, -0.13, 0.0], [0.18, 0.13, 0.0], [-0.18, -0.13, 0.0], [-0.18, 0.13, 0.0]]
    )
    imu = jnp.asarray([0.0, 0.0, 9.81])
    rot = jnp.eye(3)
    com = np.array([0.0, 0.0, 0.3])
    for k in range(400):
        com = com + vel * 1e-3
        rel = jnp.asarray(com[None, :] - feet0)
        st = kalman.update(st, jnp.ones(4), imu, rot, rel)
    np.testing.assert_allclose(np.asarray(st.x[3:6]), vel, atol=0.03)


def test_kinest_tracks_base_motion():
    """Move the base while feet stay planted: odometry must recover the
    base displacement from the negated relative toe motion."""
    q_joints = jnp.zeros(12)
    for i in range(4):
        q_joints = q_joints.at[3 * i + 1].set(0.6)
        q_joints = q_joints.at[3 * i + 2].set(-1.2)
    st = kinest.init(M, q_joints)
    eul = jnp.zeros(3)

    # simulate: joints change such that the toe (in base frame) moves back
    # by dx each step -> base moved forward by dx
    deltas = []
    q_now = q_joints
    for k in range(20):
        # small thigh pitch change moves toes backward in base frame
        q_now = q_now + jnp.tile(jnp.asarray([0.0, 0.002, 0.0]), 4)
        st, com, vel = kinest.update(
            M, st, q_now, jnp.zeros(18), eul,
            jnp.full(4, 100.0), jnp.ones(4),
        )
        deltas.append(float(com[0]))
    assert deltas[-1] > 0.001, f"odometry did not advance: {deltas[-1]}"
    # height = -mean toe z in base frame
    q = jnp.zeros(18).at[6:].set(q_now)
    toe_z = float(rbd.site_positions(M, q)[a1.TOE_SITES][:, 2].mean())
    np.testing.assert_allclose(float(com[2]), -toe_z, atol=1e-9)


def test_srb_force_distribution_supports_weight():
    from srbx.config import QpConfig, SrbConfig
    from srbx.models import srb

    cfg = SrbConfig()
    com = jnp.asarray([0.0, 0.0, 0.28])
    feet = jnp.asarray(
        [[0.18, -0.13, 0.0], [0.18, 0.13, 0.0], [-0.18, -0.13, 0.0], [-0.18, 0.13, 0.0]]
    )
    f = srb.distribute_forces(
        cfg, QpConfig(), com, feet, jnp.ones(4), jnp.zeros(6), jnp.zeros(3)
    )
    fz = np.asarray(f).reshape(4, 3)[:, 2]
    np.testing.assert_allclose(fz.sum(), cfg.mass * cfg.g, rtol=1e-3)
    assert fz.min() > 0
    # two-leg (diagonal) support also balances
    ci = jnp.asarray([1.0, 0.0, 0.0, 1.0])
    f2 = srb.distribute_forces(
        cfg, QpConfig(), com, feet, ci, jnp.zeros(6), jnp.zeros(3)
    )
    fz2 = np.asarray(f2).reshape(4, 3)[:, 2]
    np.testing.assert_allclose(fz2.sum(), cfg.mass * cfg.g, rtol=1e-2)
    np.testing.assert_allclose(fz2[[1, 2]], 0.0, atol=1e-8)


def test_srb_rollout_hover():
    """Constant supporting forces hold the SRB in hover (template sim)."""
    from srbx.config import SrbConfig
    from srbx.models import srb

    cfg = SrbConfig()
    st = srb.init_state()
    feet = jnp.asarray(
        [[0.18, -0.13, 0.0], [0.18, 0.13, 0.0], [-0.18, -0.13, 0.0], [-0.18, 0.13, 0.0]]
    )
    forces = jnp.zeros((4, 3)).at[:, 2].set(cfg.mass * cfg.g / 4.0)
    for _ in range(100):
        st = srb.step(cfg, st, feet, forces, 1e-3)
    np.testing.assert_allclose(np.asarray(st.p), [0.0, 0.0, 0.28], atol=1e-6)
    np.testing.assert_allclose(np.asarray(st.r), np.eye(3), atol=1e-6)


def test_impact_detection_triggers():
    """Legacy FastMPC impact detector (`src/fast_MPC.cpp:588-619`)."""
    from srbx.estimation import contact

    jv = jnp.ones(18) * 0.5
    calm = jv * 1.0001
    jumped = jv + 0.1

    # velocity jump near phase 1 fires
    assert bool(contact.impact_detection(0.98, 2, jumped, jv, False))
    # calm velocities near phase 1 do not
    assert not bool(contact.impact_detection(0.98, 2, calm, jv, False))
    # phase overrun fires regardless of velocity
    assert bool(contact.impact_detection(1.06, 2, calm, jv, False))
    # early impact: all four feet down mid-swing
    assert bool(contact.impact_detection(0.5, 4, calm, jv, False))
    # nothing fires during STAND
    assert not bool(contact.impact_detection(1.2, 4, jumped, jv, True))


def test_prob_contact_filter_converges_and_rejects_spikes():
    """Probabilistic contact estimator (the reference's planned prob-Kalman,
    stubbed at `src/ContactEst.cpp:69-75`): converges on sustained evidence,
    stays low on a single-tick force spike mid-swing."""
    from srbx.estimation import contact

    p = jnp.full((4,), 0.5)
    # sustained stance evidence late in phase -> high probability
    for _ in range(30):
        p = contact.prob_contact_update(
            p, jnp.full((4,), 60.0), jnp.full((4,), 0.001), 0.9)
    assert float(p.min()) > 0.95

    # sustained swing evidence early in phase -> low probability
    p = jnp.full((4,), 0.5)
    for _ in range(30):
        p = contact.prob_contact_update(
            p, jnp.zeros((4,)), jnp.full((4,), 0.08), 0.3)
    assert float(p.max()) < 0.05

    # one spurious force spike mid-swing barely moves it
    p_before = p
    p = contact.prob_contact_update(
        p, jnp.full((4,), 60.0), jnp.full((4,), 0.08), 0.3)
    assert float(p.max()) < 0.5
    # but sustained touchdown evidence (force + height) flips it fast
    for _ in range(10):
        p = contact.prob_contact_update(
            p, jnp.full((4,), 60.0), jnp.full((4,), 0.001), 0.95)
    assert float(p.min()) > 0.9
