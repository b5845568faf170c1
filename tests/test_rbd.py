import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srbx.models import a1, rbd


MODEL = a1.model()


def _rand_state(seed=0, scale=0.3):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(
        np.concatenate(
            [
                rng.normal(size=3) * 0.1,
                rng.normal(size=3) * 0.2,
                rng.normal(size=12) * scale,
            ]
        )
    )
    qd = jnp.asarray(rng.normal(size=18) * 0.5)
    return q, qd


def test_total_mass_matches_srb():
    assert MODEL.total_mass() == pytest.approx(12.453, abs=1e-9)


def test_fk_neutral_pose():
    """Straight legs at q=0: toes at hip xy, z=-0.4; hips at (±0.183, ±0.132)."""
    q = jnp.zeros(18)
    sites = np.asarray(rbd.site_positions(MODEL, q))
    toes, hips = sites[0:4], sites[4:8]
    np.testing.assert_allclose(
        hips,
        [
            [0.183, -0.13205, 0.0],
            [0.183, 0.13205, 0.0],
            [-0.183, -0.13205, 0.0],
            [-0.183, 0.13205, 0.0],
        ],
        atol=1e-12,
    )
    np.testing.assert_allclose(toes[:, 2], -0.4, atol=1e-12)
    np.testing.assert_allclose(toes[:, :2], hips[:, :2], atol=1e-12)


def test_fk_translation_equivariance():
    q, _ = _rand_state(1)
    shift = jnp.asarray([0.5, -0.2, 0.1])
    s1 = rbd.site_positions(MODEL, q)
    s2 = rbd.site_positions(MODEL, q.at[0:3].add(shift))
    np.testing.assert_allclose(np.asarray(s2 - s1), np.tile(shift, (8, 1)), atol=1e-10)


def test_mass_matrix_symmetric_pd_and_translation_block():
    q, _ = _rand_state(2)
    d = np.asarray(rbd.mass_matrix(MODEL, q))
    np.testing.assert_allclose(d, d.T, atol=1e-10)
    assert np.linalg.eigvalsh(d).min() > 0
    np.testing.assert_allclose(d[:3, :3], 12.453 * np.eye(3), atol=1e-10)


def test_gravity_vector_base_force():
    q, _ = _rand_state(3)
    g = np.asarray(rbd.gravity_vector(MODEL, q))
    np.testing.assert_allclose(g[2], 12.453 * 9.81, rtol=1e-10)
    np.testing.assert_allclose(g[0:2], 0.0, atol=1e-10)


def test_jacobian_consistency_with_fk():
    q, qd = _rand_state(4)
    j = rbd.site_jacobians(MODEL, q)
    eps = 1e-7
    v_ad = np.asarray(jnp.einsum("sin,n->si", j, qd))
    v_fd = np.asarray(
        (rbd.site_positions(MODEL, q + eps * qd) - rbd.site_positions(MODEL, q - eps * qd))
        / (2 * eps)
    )
    np.testing.assert_allclose(v_ad, v_fd, atol=1e-6)


def test_jdot_qd_finite_difference():
    q, qd = _rand_state(5)
    jd = np.asarray(rbd.site_jdot_qd(MODEL, q, qd))
    eps = 1e-6
    jp = rbd.site_jacobians(MODEL, q + eps * qd)
    jm = rbd.site_jacobians(MODEL, q - eps * qd)
    jd_fd = np.asarray(jnp.einsum("sin,n->si", (jp - jm) / (2 * eps), qd))
    np.testing.assert_allclose(jd, jd_fd, atol=1e-5)


@pytest.mark.xdist_group("heavy")
def test_energy_conservation_free_fall():
    """Unforced dynamics must conserve total energy (validates D, H, C)."""
    q, qd = _rand_state(6, scale=0.2)
    dt = 1e-4
    tau = jnp.zeros(18)

    def step(carry, _):
        q, qd = carry
        qdd = rbd.forward_dynamics(MODEL, q, qd, tau)
        # semi-implicit Euler keeps energy drift second-order
        qd2 = qd + dt * qdd
        q2 = q + dt * qd2
        return (q2, qd2), None

    e0 = float(rbd.kinetic_energy(MODEL, q, qd) + rbd.potential_energy(MODEL, q))
    (q2, qd2), _ = jax.lax.scan(step, (q, qd), None, length=200)
    e1 = float(rbd.kinetic_energy(MODEL, q2, qd2) + rbd.potential_energy(MODEL, q2))
    assert abs(e1 - e0) / max(abs(e0), 1.0) < 2e-3


def test_coriolis_skew_symmetry_power():
    """Power balance: d/dt KE = q̇ᵀ(τ − G) for C from the Lagrangian identity.
    Equivalently q̇ᵀ C q̇ = ½ q̇ᵀ Ḋ q̇."""
    q, qd = _rand_state(7)
    c_qd = rbd.bias_forces(MODEL, q, qd) - rbd.gravity_vector(MODEL, q)
    _, d_dot = jax.jvp(lambda qq: rbd.mass_matrix(MODEL, qq), (q,), (qd,))
    lhs = float(qd @ c_qd)
    rhs = float(0.5 * qd @ d_dot @ qd)
    np.testing.assert_allclose(lhs, rhs, rtol=1e-8)


def test_newton_law_for_system_com():
    """m a_com = Σ f_ext + m g ẑ⁻ must hold for any configuration/forces —
    a strong identity check of D, H, and the site Jacobians together."""
    q, _ = _rand_state(9)
    qd = jnp.zeros(18)
    rng = np.random.default_rng(10)
    f = jnp.asarray(rng.normal(size=(8, 3)) * 30.0)
    qdd = rbd.forward_dynamics(MODEL, q, qd, jnp.zeros(18), f_ext_sites=f)

    masses = np.asarray(rbd._body_masses(MODEL))
    m_tot = masses.sum()

    def com(qq):
        return (masses[:, None] * rbd.com_positions(MODEL, qq)).sum(0) / m_tot

    j_com = jax.jacfwd(com)(q)
    a_com = np.asarray(j_com @ qdd)  # qd = 0 so no J̇q̇ term
    expect = (np.asarray(f).sum(0) + np.asarray([0.0, 0.0, -m_tot * 9.81])) / m_tot
    np.testing.assert_allclose(a_com, expect, rtol=1e-8, atol=1e-8)


def test_jit_and_batch():
    q, qd = _rand_state(8)
    f = jax.jit(lambda q: rbd.mass_matrix(MODEL, q))
    d1 = f(q)
    qs = jnp.stack([q, q * 0.5, q * 0.1])
    db = jax.vmap(lambda qq: rbd.mass_matrix(MODEL, qq))(qs)
    assert db.shape == (3, 18, 18)
    np.testing.assert_allclose(np.asarray(db[0]), np.asarray(d1), atol=1e-12)


def test_energy_direct_bias_matches_crba_form():
    """bias_forces (Lagrangian energy-direct form) == the CRBA-differentiated
    identity C q̇ = Ḋq̇ − ½∂q(q̇ᵀDq̇), and KE == ½ q̇ᵀDq̇."""
    model = a1.model()
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(size=18) * 0.3)
    qd = jnp.asarray(rng.normal(size=18))

    ke = rbd.kinetic_energy(model, q, qd)
    d = rbd.mass_matrix(model, q)
    np.testing.assert_allclose(float(ke), float(0.5 * qd @ d @ qd),
                               rtol=1e-12)

    h = rbd.bias_forces(model, q, qd)
    _, d_dot = jax.jvp(lambda qq: rbd.mass_matrix(model, qq), (q,), (qd,))
    quad = jax.grad(lambda qq: 0.5 * qd @ rbd.mass_matrix(model, qq) @ qd)(q)
    h_ref = d_dot @ qd - quad + rbd.gravity_vector(model, q)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref), atol=1e-9)


def test_site_velocity_and_force_mapping_match_jacobians():
    model = a1.model()
    rng = np.random.default_rng(6)
    q = jnp.asarray(rng.normal(size=18) * 0.3)
    qd = jnp.asarray(rng.normal(size=18))
    js = rbd.site_jacobians(model, q)
    np.testing.assert_allclose(
        np.asarray(rbd.site_velocities(model, q, qd)),
        np.asarray(jnp.einsum("sin,n->si", js, qd)), atol=1e-12)
    f = jnp.asarray(rng.normal(size=(js.shape[0], 3)))
    np.testing.assert_allclose(
        np.asarray(rbd.apply_site_forces(model, q, f)),
        np.asarray(jnp.einsum("sin,si->n", js, f)), atol=1e-12)
