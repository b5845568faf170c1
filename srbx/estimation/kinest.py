"""Stance-anchored kinematic odometry.

Functional port of the reference's `kinEst0..3` (`include/OtherUtils.hpp:11-306`
— four near-identical copies differing only in the initial COM offset; here
one function with the offset in the carry). Estimates base position by
integrating the negated motion of stance toes (computed with the base frame
pinned at the origin), base height from the mean stance-toe depth, and base
velocity from -J q̇ averaged over weighted contacts.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from srbx.models import a1, rbd


class KinEstState(NamedTuple):
    com: jax.Array        # (3,) estimated base position
    toe_prev: jax.Array   # (4, 3) previous base-frame toe positions


def init(model: rbd.Model, q_joints, com0=(0.0, 0.0, 0.0)) -> KinEstState:
    q = jnp.zeros(18, q_joints.dtype).at[6:].set(q_joints)
    toes = rbd.site_positions(model, q)[a1.TOE_SITES]
    return KinEstState(jnp.asarray(com0, q_joints.dtype), toes)


def update(
    model: rbd.Model,
    state: KinEstState,
    q_joints,
    qd,
    eul,
    foot_force,
    contact_ind,
    force_thresh: float = 20.0,
    z_toe_offset: float = 0.0,
):
    """One odometry step. Returns (new_state, com (3,), com_vel (3,)).

    q_joints: (12,); qd: (18,) with base rows ignored for FK (the base is
    pinned at the origin, matching `q[0]=q[1]=q[2]=0` in the reference);
    eul: (3,) base orientation; foot_force/contact_ind: (4,).
    """
    dtype = q_joints.dtype
    act = (foot_force > force_thresh).astype(dtype)
    weighted = act + contact_ind.astype(dtype)
    num = jnp.maximum(jnp.sum(weighted), 1e-9)

    q = jnp.zeros(18, dtype)
    q = q.at[3:6].set(eul)
    q = q.at[6:].set(q_joints)
    toes = rbd.site_positions(model, q)[a1.TOE_SITES]        # (4, 3)

    delta = -(toes[:, 0:2] - state.toe_prev[:, 0:2])
    delta_com = jnp.sum(weighted[:, None] * delta, axis=0) / num
    com_xy = state.com[0:2] + delta_com
    com_z = -jnp.sum(weighted * toes[:, 2]) / num + z_toe_offset

    qd_nobase = qd.at[0:3].set(0.0)
    toe_vel = rbd.site_velocities(model, q, qd_nobase)[a1.TOE_SITES]
    com_vel = -jnp.sum(weighted[:, None] * toe_vel, axis=0) / num

    com = jnp.concatenate([com_xy, com_z[None]])
    return KinEstState(com, toes), com, com_vel
