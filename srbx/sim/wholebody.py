"""Batched whole-body physics: the TPU-native replacement for RaiSim.

The reference integrates contact dynamics at 1 kHz through RaiSim
(`src/A1_Sim.cpp:825-857,1214`). Here the plant is the same 18-DoF model the
controller uses (srbx.models.rbd), with a compliant ground contact at the
toe sites:

  * normal: spring-damper  fz = kn·pen − dn·vz   (clamped ≥ 0, active only
    while penetrating) — the standard soft-contact model;
  * tangential: viscous opposition clamped to the Coulomb cone μ·fz
    (regularized friction).

Integration is semi-implicit Euler with `substeps` internal steps per 1 ms
control tick. Everything vmaps over scenario batches and jits into the
closed-loop scan.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from srbx.models import a1, rbd


@dataclasses.dataclass(frozen=True)
class SimConfig:
    dt: float = 1e-3            # control tick (reference simfreq 0.001)
    # Internal integration substeps per tick. The contact spring-damper's
    # fastest time constants (kn=4e4, dn=400 on ~1 kg toe masses) are stable
    # well above 0.5 ms semi-implicit steps; measured closed-loop COM
    # deviation of substeps=2 vs 4 is 7e-4 m over 4 trot domains with 100%
    # LL-QP convergence (substeps=1 drifts 2.6e-2 — too coarse). Physics is
    # >half the tick cost, so 2 is the accuracy/throughput operating point.
    substeps: int = 2
    kn: float = 4e4             # ground normal stiffness
    dn: float = 400.0           # ground normal damping
    kt: float = 600.0           # tangential viscous coefficient
    mu: float = 0.6             # ground friction
    # Stick-slip tangential model (used only when SimState.con is set):
    # anchor-spring stiffness / damping. kt_stick at kn/2 keeps the stick
    # mode's frequency below the normal spring's (stable at the same
    # substep); dt_stick near-critically damps the ~1 kg toe-effective mass.
    kt_stick: float = 2e4
    dt_stick: float = 150.0


class ContactState(NamedTuple):
    """Stick-slip tangential contact state (opt-in; see SimState.con).

    anchor: (4, 2) world xy stick position per toe — the tangential spring
    attachment point. slip: (4,) cumulative slip distance per toe (m) —
    the stance-foot slip metric."""

    anchor: jax.Array
    slip: jax.Array


class SimState(NamedTuple):
    q: jax.Array     # (18,)
    qd: jax.Array    # (18,)
    # Optional stick-slip contact state (init_contact_state). None keeps the
    # round-1..3 viscous-only tangential model: F_t = -kt v clamped to the
    # cone, which lets a statically loaded stance foot CREEP at v = F/kt
    # (~3 cm/s at 20 N — fine for trot's short stance phases, wrong for
    # POSE/STAND under sustained lateral load). With con set, the tangential
    # force is an anchor-point spring (stick) that drags only when the cone
    # saturates (slip) — the spring-damper analogue of RaiSim's hard
    # stick-slip contact (`src/A1_Sim.cpp:1214` world.integrate()).
    con: Optional[ContactState] = None


def init_contact_state(model: rbd.Model, q) -> ContactState:
    """Anchors at the current toe xy, zero accumulated slip."""
    toe_xy = rbd.site_positions(model, q)[a1.TOE_SITES][:, 0:2]
    return ContactState(anchor=toe_xy, slip=jnp.zeros((4,), q.dtype))


def contact_forces(cfg: SimConfig, model: rbd.Model, q, qd, con=None):
    """(4, 3) world ground-reaction forces at the toe sites.

    con=None: viscous tangential model (returns grf only).
    con=ContactState: anchor-point stick-slip model — returns
    (grf, new ContactState). Sticking feet pull toward their anchor with a
    spring-damper; when the required force leaves the friction cone the
    anchor is dragged along the force direction so the spring holds exactly
    the cone-saturated force (kinetic slip), and the drag distance
    accumulates into the slip metric. Breaking contact re-anchors at the
    current toe position."""
    toe_pos = rbd.site_positions(model, q)[a1.TOE_SITES]
    toe_vel = rbd.site_velocities(model, q, qd)[a1.TOE_SITES]

    pen = -toe_pos[:, 2]
    active = pen > 0.0
    fz = jnp.where(active, cfg.kn * pen - cfg.dn * toe_vel[:, 2], 0.0)
    fz = jnp.maximum(fz, 0.0)
    limit = cfg.mu * fz[:, None]

    if con is None:
        ft_raw = -cfg.kt * toe_vel[:, 0:2] * active[:, None]
        ft_norm = jnp.linalg.norm(ft_raw, axis=1, keepdims=True)
        scale = jnp.where(ft_norm > limit,
                          limit / jnp.maximum(ft_norm, 1e-9), 1.0)
        ft = ft_raw * scale
        return jnp.concatenate([ft, fz[:, None]], axis=1)

    p_xy = toe_pos[:, 0:2]
    ft_raw = (-cfg.kt_stick * (p_xy - con.anchor)
              - cfg.dt_stick * toe_vel[:, 0:2]) * active[:, None]
    ft_norm = jnp.linalg.norm(ft_raw, axis=1, keepdims=True)
    slipping = ft_norm > limit
    scale = jnp.where(slipping, limit / jnp.maximum(ft_norm, 1e-9), 1.0)
    ft = ft_raw * scale
    # kinetic slip: drag the anchor so the spring carries the clamped force
    anchor_slip = p_xy + ft / cfg.kt_stick
    anchor_new = jnp.where(active[:, None],
                           jnp.where(slipping, anchor_slip, con.anchor),
                           p_xy)
    drag = jnp.linalg.norm(anchor_new - con.anchor, axis=1)
    slip_new = con.slip + jnp.where(active & slipping[:, 0], drag, 0.0)
    grf = jnp.concatenate([ft, fz[:, None]], axis=1)
    return grf, ContactState(anchor=anchor_new, slip=slip_new)


def step(cfg: SimConfig, model: rbd.Model, state: SimState, tau_joints,
         base_force=None, d0=None):
    """One 1 ms tick under joint torques tau_joints (12,).

    base_force: optional (3,) world force on the trunk — the fault-injection
    analogue of the reference's external disturbance generator
    (`src/A1_Sim.cpp:84-107`).
    d0: optional precomputed D(q) for the FIRST substep (CRBA sharing with
    a ground-truth controller that evaluated D at the same q — the host
    1 kHz path's analogue of step_batch's d0).
    """
    dt = cfg.dt / cfg.substeps
    tau_full = jnp.zeros((model.nq,), state.q.dtype).at[6:].set(tau_joints)
    if base_force is not None:
        tau_full = tau_full.at[0:3].add(base_force)

    def sub(carry, k):
        q, qd, con = carry
        if con is None:
            grf = contact_forces(cfg, model, q, qd)
        else:
            grf, con = contact_forces(cfg, model, q, qd, con)
        f_sites = jnp.zeros((len(model.sites), 3), q.dtype).at[0:4].set(grf)
        d_k = d0 if (d0 is not None and k == 0) else None
        qdd = rbd.forward_dynamics(model, q, qd, tau_full,
                                   f_ext_sites=f_sites, d=d_k)
        qd2 = qd + dt * qdd
        q2 = q + dt * qd2
        return (q2, qd2, con), None

    # static unroll so the d0 reuse specializes substep 0
    carry = (state.q, state.qd, state.con)
    for k in range(cfg.substeps):
        carry, _ = sub(carry, k)
    return SimState(*carry)


def step_batch(cfg: SimConfig, model: rbd.Model, states: SimState,
               tau_joints, backend: str = "xla", tile: int = 256,
               base_force=None, d0=None):
    """Batched tick: same math as vmap(step) over a leading lane axis, but
    the mass-matrix solve of every substep runs through the lanes-last SPD
    kernel (srbx.ops.spd) — the measured hot spot of the 1 kHz loop.

    d0: optional precomputed D(q) for the FIRST substep's q (the controller
    build evaluates the same CRBA at the same q in ground-truth mode —
    sharing it removes one of the tick's three mass-matrix evaluations).
    backend="xla" IS vmap(step), bit for bit, unconditionally — d0 is
    ignored on that path (step re-derives D itself), so passing it cannot
    silently change the reassociation. The golden whole-body fixtures
    integrate ~1000 contact-rich ticks, where even eps-level reassociation
    amplifies."""
    if backend == "xla":
        if base_force is None:
            return jax.vmap(lambda s, t: step(cfg, model, s, t))(
                states, tau_joints)
        return jax.vmap(lambda s, t, bf: step(cfg, model, s, t, bf))(
            states, tau_joints, base_force)
    dt = cfg.dt / cfg.substeps
    bsz = states.q.shape[0]
    dtype = states.q.dtype
    tau_full = jnp.zeros((bsz, model.nq), dtype).at[:, 6:].set(tau_joints)
    if base_force is not None:
        tau_full = tau_full.at[:, 0:3].add(base_force)
    n_sites = len(model.sites)

    def sub(carry, k):
        q, qd, con = carry
        if con is None:
            grf = jax.vmap(
                lambda qq, qdd: contact_forces(cfg, model, qq, qdd))(q, qd)
        else:
            grf, con = jax.vmap(
                lambda qq, qdd, cc: contact_forces(cfg, model, qq, qdd, cc)
            )(q, qd, con)
        f_sites = jnp.zeros((bsz, n_sites, 3), dtype).at[:, 0:4].set(grf)
        d_k = None
        if d0 is not None:
            # static unroll: substep 0 reuses the caller's CRBA evaluation
            d_k = d0 if k == 0 else None
        qdd = rbd.forward_dynamics_batch(
            model, q, qd, tau_full, f_ext_sites=f_sites,
            backend=backend, tile=tile, d=d_k)
        qd2 = qd + dt * qdd
        q2 = q + dt * qd2
        return (q2, qd2, con), None

    # unrolled python loop (substeps is tiny/static) so the d0 reuse can
    # specialize the first substep
    carry = (states.q, states.qd, states.con)
    for k in range(cfg.substeps):
        carry, _ = sub(carry, k)
    return SimState(*carry)


def foot_force_measurement(cfg: SimConfig, model: rbd.Model, state: SimState):
    """(4,) scalar 'foot force sensor' readings (normal force), the analogue
    of the RaiSim contact impulses the reference thresholds at 8000
    (`src/A1_Sim.cpp:156-161`). Scale: Newtons; use a ~30 N threshold."""
    return contact_forces(cfg, model, state.q, state.qd)[:, 2]


def default_crouch(model: rbd.Model, dtype=jnp.float64):
    """Initial crouched configuration (legs folded, toes on the ground)
    similar to the sim's settled start posture."""
    q = jnp.zeros((18,), dtype)
    for i in range(4):
        q = q.at[6 + 3 * i + 1].set(1.1)    # thigh
        q = q.at[6 + 3 * i + 2].set(-2.3)   # calf
    toe_z = rbd.site_positions(model, q)[a1.TOE_SITES][:, 2].min()
    return q.at[2].set(-toe_z + 0.001)
