"""Generic rigid-body algorithms for floating-base kinematic trees, in JAX.

Replaces the reference's ~185k lines of Wolfram-generated C dynamics
(`dynamics/A1_New_wFoot/A1_Dynamics.h:10-44`: D_mat, G_vec, C_vec, B_mat,
FK_*_toe/hip, J_*, dJ_*) with ~300 lines built on automatic differentiation:

  * forward kinematics is the only hand-written recursion;
  * positional Jacobians  J = dp/dq          (jacfwd of FK),
  * J̇q̇ terms             = (d/dt J) q̇       (jvp of the Jacobian),
  * mass matrix           D = Σ JᵀMJ        (CRBA over link Jacobians),
  * gravity               G = dPE/dq        (grad of potential energy),
  * Coriolis bias         C q̇ = Ḋq̇ − ½ ∂q(q̇ᵀDq̇)   (Lagrangian identity)
  all follow exactly from FK by AD — no codegen, no approximation.

Coordinate convention (differs from the reference, see note): configuration
q = [base pos (3), base XYZ-Euler (3), joint angles]; velocity v = q̇ — the
*derivative of q*, i.e. Euler-angle rates, NOT world angular velocity. The
reference mixes conventions (q Euler, dq world ω, `src/RobotModel.cpp:30`);
using strict generalized coordinates keeps every Lagrangian AD identity
valid. `euler_rate_matrix` converts ω_world = E(eul) @ eul̇ at the boundary.

The model is static Python data (numpy); every function specializes at trace
time — the per-link loops unroll into one fused XLA graph.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from srbx.utils import transforms as tf


@dataclasses.dataclass(frozen=True)
class Link:
    """One moving link: revolute joint connecting to its parent."""

    name: str
    parent: int              # index into links; -1 = base
    joint_origin: tuple      # xyz of joint in parent frame
    joint_axis: tuple        # rotation axis in local frame
    mass: float
    com: tuple               # com offset in link frame
    inertia: tuple           # (ixx, ixy, ixz, iyy, iyz, izz) about com
    point_masses: tuple = () # ((mass, (x, y, z)), ...) rigidly attached


@dataclasses.dataclass(frozen=True)
class Model:
    """Floating-base tree. Base link index is -1 by convention."""

    base_mass: float
    base_com: tuple
    base_inertia: tuple
    links: tuple             # tuple[Link]
    sites: tuple             # ((name, link_index, offset_xyz), ...) FK sites
    g: float = 9.81

    @property
    def nq(self) -> int:
        return 6 + len(self.links)

    def total_mass(self) -> float:
        m = self.base_mass
        for l in self.links:
            m += l.mass + sum(pm[0] for pm in l.point_masses)
        return m


def _inertia_tensor(i6):
    ixx, ixy, ixz, iyy, iyz, izz = i6
    return np.array([[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]])


def _axis_rotation(axis, angle):
    """Rotation about a (static) unit axis by a traced angle.

    Written as R = I + sin(θ)K + (1-cos(θ))K² with K = hat(axis) constant —
    smooth in θ everywhere (the axis-angle form differentiates a vector norm,
    which NaNs under AD at θ = 0)."""
    k = tf.hat(jnp.asarray(axis, angle.dtype))
    eye = jnp.eye(3, dtype=angle.dtype)
    return eye + jnp.sin(angle) * k + (1.0 - jnp.cos(angle)) * (k @ k)


def euler_rate_matrix(eul):
    """E with ω_world = E(eul) @ eul̇ for the XYZ convention R = Rx Ry Rz."""
    r, p = eul[..., 0], eul[..., 1]
    sr, cr = jnp.sin(r), jnp.cos(r)
    sp, cp = jnp.sin(p), jnp.cos(p)
    one = jnp.ones_like(r)
    zero = jnp.zeros_like(r)
    return jnp.stack(
        [
            jnp.stack([one, zero, sp], axis=-1),
            jnp.stack([zero, cr, -sr * cp], axis=-1),
            jnp.stack([zero, sr, cr * cp], axis=-1),
        ],
        axis=-2,
    )


def link_frames(model: Model, q):
    """World rotation and joint-origin position of every link (and the base).

    Returns (rots, pos): rots[0]/pos[0] is the base; rots[1+i]/pos[1+i] is
    link i's frame at its joint origin.
    """
    base_r = tf.rot_xyz(q[3:6])
    base_p = q[0:3]
    rots = [base_r]
    pos = [base_p]
    for i, link in enumerate(model.links):
        pr = rots[1 + link.parent] if link.parent >= 0 else base_r
        pp = pos[1 + link.parent] if link.parent >= 0 else base_p
        joint_p = pp + pr @ jnp.asarray(link.joint_origin, q.dtype)
        joint_r = pr @ _axis_rotation(link.joint_axis, q[6 + i])
        rots.append(joint_r)
        pos.append(joint_p)
    return rots, pos


def site_positions(model: Model, q):
    """(n_sites, 3) world positions of the model's named sites."""
    rots, pos = link_frames(model, q)
    out = []
    for _, li, off in model.sites:
        out.append(pos[1 + li] + rots[1 + li] @ jnp.asarray(off, q.dtype))
    return jnp.stack(out)


def com_positions(model: Model, q):
    """(n_bodies, 3) world COM of the base, links, and point masses."""
    rots, pos = link_frames(model, q)
    out = [pos[0] + rots[0] @ jnp.asarray(model.base_com, q.dtype)]
    for i, link in enumerate(model.links):
        out.append(pos[1 + i] + rots[1 + i] @ jnp.asarray(link.com, q.dtype))
        for pm_mass, pm_off in link.point_masses:
            out.append(pos[1 + i] + rots[1 + i] @ jnp.asarray(pm_off, q.dtype))
    return jnp.stack(out)


def _body_masses(model: Model) -> np.ndarray:
    out = [model.base_mass]
    for link in model.links:
        out.append(link.mass)
        out.extend(pm[0] for pm in link.point_masses)
    return np.asarray(out)


def link_ang_velocities(model: Model, q, qd):
    """(1 + n_links, 3) world angular velocity of base + each link."""
    rots, _ = link_frames(model, q)
    w_base = euler_rate_matrix(q[3:6]) @ qd[3:6]
    ws = [w_base]
    for i, link in enumerate(model.links):
        pw = ws[1 + link.parent] if link.parent >= 0 else w_base
        pr = rots[1 + link.parent] if link.parent >= 0 else rots[0]
        axis_w = pr @ jnp.asarray(link.joint_axis, q.dtype)
        ws.append(pw + axis_w * qd[6 + i])
    return jnp.stack(ws)


def _rot_list(model: Model, q):
    rots, _ = link_frames(model, q)
    return rots


def mass_matrix(model: Model, q):
    """D(q) via CRBA over AD link Jacobians: D = Σ m JvᵀJv + JwᵀIJw."""
    nq = model.nq
    masses = jnp.asarray(_body_masses(model), q.dtype)

    jv = jax.jacfwd(lambda qq: com_positions(model, qq))(q)     # (nb, 3, nq)
    d = jnp.einsum("b,bin,bim->nm", masses, jv, jv)

    # angular part: base + links only (point masses carry no inertia tensor)
    jw = jax.jacfwd(
        lambda qdd: link_ang_velocities(model, q, qdd)
    )(jnp.zeros((nq,), q.dtype))                                # (1+nl, 3, nq)
    rots = _rot_list(model, q)
    inertias = [_inertia_tensor(model.base_inertia)] + [
        _inertia_tensor(l.inertia) for l in model.links
    ]
    for k, (r, i_body) in enumerate(zip(rots, inertias)):
        i_world = r @ jnp.asarray(i_body, q.dtype) @ r.T
        d = d + jw[k].T @ i_world @ jw[k]
    return d


def potential_energy(model: Model, q):
    masses = jnp.asarray(_body_masses(model), q.dtype)
    return model.g * jnp.sum(masses * com_positions(model, q)[:, 2])


def gravity_vector(model: Model, q):
    """G(q) = dPE/dq — replaces the generated `G_vec`."""
    return jax.grad(lambda qq: potential_energy(model, qq))(q)


def kinetic_energy(model: Model, q, qd):
    return 0.5 * qd @ mass_matrix(model, q) @ qd


def bias_forces(model: Model, q, qd, include_coriolis: bool = True):
    """H(q, q̇) = C(q,q̇)q̇ + G(q).

    The reference's RobotModel neglects Coriolis (`src/RobotModel.cpp:54-61`
    uses G only); pass include_coriolis=False for that parity mode.
    """
    g = gravity_vector(model, q)
    if not include_coriolis:
        return g
    # C q̇ = Ḋ q̇ − ½ ∂q (q̇ᵀ D q̇)
    _, d_dot = jax.jvp(lambda qq: mass_matrix(model, qq), (q,), (qd,))
    quad_grad = jax.grad(lambda qq: 0.5 * qd @ mass_matrix(model, qq) @ qd)(q)
    return d_dot @ qd - quad_grad + g


def site_jacobians(model: Model, q):
    """(n_sites, 3, nq) positional Jacobians of all sites."""
    return jax.jacfwd(lambda qq: site_positions(model, qq))(q)


def site_jdot_qd(model: Model, q, qd):
    """(n_sites, 3) J̇q̇ for each site — replaces the generated `dJ_*`
    (which return J̇q̇ vectors, see `src/RobotModel.cpp:87-109`)."""
    _, jdot = jax.jvp(lambda qq: site_jacobians(model, qq), (q,), (qd,))
    return jnp.einsum("sin,n->si", jdot, qd)


def forward_dynamics(model: Model, q, qd, tau, f_ext_sites=None):
    """q̈ = D⁻¹(Bτ + Σ Jᵀ f_ext − H). tau: (nq,) generalized forces;
    f_ext_sites: optional (n_sites, 3) world forces applied at sites."""
    d = mass_matrix(model, q)
    h = bias_forces(model, q, qd)
    rhs = tau - h
    if f_ext_sites is not None:
        js = site_jacobians(model, q)
        rhs = rhs + jnp.einsum("sin,si->n", js, f_ext_sites)
    return jnp.linalg.solve(d, rhs)
