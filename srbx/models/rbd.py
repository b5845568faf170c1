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


def _com_from_frames(model: Model, rots, pos):
    dtype = pos[0].dtype
    out = [pos[0] + rots[0] @ jnp.asarray(model.base_com, dtype)]
    for i, link in enumerate(model.links):
        out.append(pos[1 + i] + rots[1 + i] @ jnp.asarray(link.com, dtype))
        for pm_mass, pm_off in link.point_masses:
            out.append(pos[1 + i] + rots[1 + i] @ jnp.asarray(pm_off, dtype))
    return jnp.stack(out)


def com_positions(model: Model, q):
    """(n_bodies, 3) world COM of the base, links, and point masses."""
    rots, pos = link_frames(model, q)
    return _com_from_frames(model, rots, pos)


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


def _link_ancestors(model: Model) -> np.ndarray:
    """(n_links, n_links) bool: anc[i, j] ⇔ joint j moves link i
    (ancestor-or-self along the tree). Static data."""
    nl = len(model.links)
    anc = np.zeros((nl, nl), bool)
    for i in range(nl):
        j = i
        while j >= 0:
            anc[i, j] = True
            j = model.links[j].parent
    return anc


def _body_link_map(model: Model) -> np.ndarray:
    """Link index carrying each mass body of com_positions' ordering
    (base = -1, then each link followed by its point masses). Static."""
    out = [-1]
    for i, link in enumerate(model.links):
        out.append(i)
        out.extend(i for _ in link.point_masses)
    return np.asarray(out)


def _joint_axes_world(model: Model, rots, dtype):
    """(n_links, 3) world joint axes (a joint's axis lives in the
    parent-side frame and is invariant under its own rotation)."""
    axes = []
    for i, link in enumerate(model.links):
        pr = rots[1 + link.parent] if link.parent >= 0 else rots[0]
        axes.append(pr @ jnp.asarray(link.joint_axis, dtype))
    return jnp.stack(axes)


def _point_jacobians(model: Model, q, rots, pos, points, link_idx):
    """Analytic positional Jacobians of world `points` (np, 3) rigidly
    attached to links (`link_idx` static, -1 = base). Returns (np, 3, nq).

    Column structure: base translation → I₃; base Euler rates → E_k × r
    about the base origin (ω_world = E eul̇); revolute joint j (if an
    ancestor) → a_j × (point − p_j). One FK pass + cross products — no AD.
    """
    dtype = q.dtype
    npts = len(link_idx)
    nl = len(model.links)
    anc = _link_ancestors(model)
    mask = np.zeros((npts, nl), bool)
    for b, li in enumerate(np.asarray(link_idx)):
        if li >= 0:
            mask[b] = anc[li]
    mask = jnp.asarray(mask, dtype)

    axes = _joint_axes_world(model, rots, dtype)          # (nl, 3)
    jpos = jnp.stack(pos[1:])                             # (nl, 3)
    r_j = points[:, None, :] - jpos[None, :, :]           # (np, nl, 3)
    jv_joint = jnp.cross(
        jnp.broadcast_to(axes[None], r_j.shape), r_j
    ) * mask[:, :, None]                                  # (np, nl, 3)

    e_cols = euler_rate_matrix(q[3:6]).T                  # (3, 3) rows=cols of E
    r_b = points - pos[0][None, :]                        # (np, 3)
    jv_eul = jnp.cross(
        jnp.broadcast_to(e_cols[None], (npts, 3, 3)),
        r_b[:, None, :],
    )                                                     # (np, 3, 3)

    jv_trans = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (npts, 3, 3))
    # columns assembled as (np, ncol, 3) then → (np, 3, nq)
    jv = jnp.concatenate([jv_trans, jv_eul, jv_joint], axis=1)
    return jnp.swapaxes(jv, 1, 2)


def _link_ang_jacobians(model: Model, q, rots):
    """(1 + n_links, 3, nq) angular-velocity Jacobians (world frame):
    zero translation block, Euler block E for every body, joint axes under
    the ancestor mask (base row: Euler only)."""
    dtype = q.dtype
    nl = len(model.links)
    nb = 1 + nl
    anc = np.concatenate([np.zeros((1, nl), bool), _link_ancestors(model)])
    axes = _joint_axes_world(model, rots, dtype)          # (nl, 3)
    jw_joint = (
        jnp.broadcast_to(axes[None], (nb, nl, 3))
        * jnp.asarray(anc, dtype)[:, :, None]
    )
    e_cols = euler_rate_matrix(q[3:6]).T
    jw_eul = jnp.broadcast_to(e_cols[None], (nb, 3, 3))
    jw_trans = jnp.zeros((nb, 3, 3), dtype)
    jw = jnp.concatenate([jw_trans, jw_eul, jw_joint], axis=1)
    return jnp.swapaxes(jw, 1, 2)


def mass_matrix(model: Model, q):
    """D(q) = Σ m JvᵀJv + JwᵀIJw over ANALYTIC body Jacobians (one FK pass
    + cross-product columns; replaces jacfwd of the FK, which cost nq
    forward passes — measured ~2x the whole physics substep)."""
    masses = jnp.asarray(_body_masses(model), q.dtype)
    rots, pos = link_frames(model, q)
    cs = _com_from_frames(model, rots, pos)
    jv = _point_jacobians(model, q, rots, pos, cs, _body_link_map(model))
    d = jnp.einsum("b,bin,bim->nm", masses, jv, jv)

    # angular part: base + links only (point masses carry no inertia tensor)
    jw = _link_ang_jacobians(model, q, rots)
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
    """½ q̇ᵀDq̇ computed DIRECTLY from body velocities (one jvp of the COM
    positions + the angular-velocity recursion) — never forms D. This makes
    the Lagrangian AD identities below cheap: every derivative of this
    function is a derivative of an FK-scale computation, not of the CRBA."""
    masses = jnp.asarray(_body_masses(model), q.dtype)
    _, com_v = jax.jvp(lambda qq: com_positions(model, qq), (q,), (qd,))
    ke = 0.5 * jnp.sum(masses * jnp.sum(com_v * com_v, axis=-1))
    ws = link_ang_velocities(model, q, qd)
    rots = _rot_list(model, q)
    inertias = [_inertia_tensor(model.base_inertia)] + [
        _inertia_tensor(l.inertia) for l in model.links
    ]
    for k, (r, i_body) in enumerate(zip(rots, inertias)):
        wl = r.T @ ws[k]                       # body-frame angular velocity
        ke = ke + 0.5 * wl @ jnp.asarray(i_body, q.dtype) @ wl
    return ke


def bias_forces(model: Model, q, qd, include_coriolis: bool = True):
    """H(q, q̇) = C(q,q̇)q̇ + G(q).

    Lagrangian form: with momentum p(q,q̇) = ∂T/∂q̇ (= Dq̇),
        C q̇ = ṗ|_{q̈=0} − ∂T/∂q = jvp_q(p; q̇) − ∂T/∂q,
    all over the direct kinetic energy — O(FK)-scale AD passes instead of
    differentiating through the CRBA mass matrix (measured ~2x whole-tick
    physics cost before this form).

    The reference's RobotModel neglects Coriolis (`src/RobotModel.cpp:54-61`
    uses G only); pass include_coriolis=False for that parity mode.
    """
    g = gravity_vector(model, q)
    if not include_coriolis:
        return g

    def momentum(qq):
        return jax.grad(lambda v: kinetic_energy(model, qq, v))(qd)

    _, p_dot = jax.jvp(momentum, (q,), (qd,))
    dt_dq = jax.grad(lambda qq: kinetic_energy(model, qq, qd))(q)
    return p_dot - dt_dq + g


def site_jacobians(model: Model, q):
    """(n_sites, 3, nq) positional Jacobians of all sites — analytic
    (one FK pass; replaces the generated `J_*`)."""
    rots, pos = link_frames(model, q)
    pts = jnp.stack([
        pos[1 + li] + rots[1 + li] @ jnp.asarray(off, q.dtype)
        for _, li, off in model.sites
    ])
    link_idx = np.asarray([li for _, li, _ in model.sites])
    return _point_jacobians(model, q, rots, pos, pts, link_idx)


def site_jdot_qd(model: Model, q, qd):
    """(n_sites, 3) J̇q̇ for each site — replaces the generated `dJ_*`
    (which return J̇q̇ vectors, see `src/RobotModel.cpp:87-109`)."""
    _, jdot = jax.jvp(lambda qq: site_jacobians(model, qq), (q,), (qd,))
    return jnp.einsum("sin,n->si", jdot, qd)


def site_velocities(model: Model, q, qd):
    """(n_sites, 3) world velocities of all sites — one jvp of the FK
    (cheaper than forming the full Jacobians when only J q̇ is needed)."""
    return jax.jvp(lambda qq: site_positions(model, qq), (q,), (qd,))[1]


def apply_site_forces(model: Model, q, f_sites):
    """Σ Jᵀ f mapped through ONE vjp of the FK (a reverse pass costs one
    evaluation; building the full (n_sites, 3, nq) Jacobians costs nq)."""
    _, pull = jax.vjp(lambda qq: site_positions(model, qq), q)
    return pull(f_sites)[0]


def forward_dynamics(model: Model, q, qd, tau, f_ext_sites=None, d=None):
    """q̈ = D⁻¹(Bτ + Σ Jᵀ f_ext − H). tau: (nq,) generalized forces;
    f_ext_sites: optional (n_sites, 3) world forces applied at sites.
    d: optional precomputed mass matrix D(q) (CRBA sharing: the controller
    evaluates the same CRBA at the same q in ground-truth mode)."""
    if d is None:
        d = mass_matrix(model, q)
    h = bias_forces(model, q, qd)
    rhs = tau - h
    if f_ext_sites is not None:
        rhs = rhs + apply_site_forces(model, q, f_ext_sites)
    # D is SPD: Cholesky beats the LU-with-pivoting of jnp.linalg.solve
    return jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(d, lower=True), rhs
    )


def forward_dynamics_batch(model: Model, q, qd, tau, f_ext_sites=None,
                           backend: str = "xla", tile: int = 256, d=None):
    """Batched forward dynamics: all operands carry a leading lane axis.

    Same math as vmap(forward_dynamics), but the D q̈ = rhs solve runs
    through srbx.ops.spd — on TPU the lanes-last Pallas kernel, which is the
    measured hot spot of the whole-body tick (XLA's batched tiny Cholesky
    costs ~2x the mass-matrix construction, scripts/bench_rbd_stages.py).

    d: optional precomputed mass matrices (B, nq, nq) — the caller may share
    one CRBA evaluation between the controller build and the first physics
    substep when both see the same q (ground-truth mode)."""
    from srbx.ops import spd

    if d is None:
        d = jax.vmap(lambda qq: mass_matrix(model, qq))(q)
    h = jax.vmap(lambda qq, qdd: bias_forces(model, qq, qdd))(q, qd)
    rhs = tau - h
    if f_ext_sites is not None:
        rhs = rhs + jax.vmap(
            lambda qq, f: apply_site_forces(model, qq, f))(q, f_ext_sites)
    return spd.solve(d, rhs, backend=backend, tile=tile)
