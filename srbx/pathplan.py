"""High-level path formatting: APF output -> full SRB reference states.

Functional equivalent of the reference's `PathPlanner::computePath`
(`src/PathPlanner.cpp:20-66` — present in-tree but not built): expand the
APF planner's (Pr, Prd) xy trajectories into 12-state-per-agent SRB
references (position, velocity, orientation from the velocity heading, and
yaw rate by finite difference), the input format of SRB-level trackers.
"""

from __future__ import annotations

import jax.numpy as jnp


def expand_srb_reference(pr, prd, z_height: float = 0.28, dt: float = 0.172):
    """(2A, T) position / velocity refs -> (A, T, 12) SRB references.

    Rows per state: [x, y, z, vx, vy, vz, roll, pitch, yaw, wx, wy, wz].
    Yaw = atan2(vy, vx) of the planned velocity; yaw rate by central
    difference; roll/pitch zero (the template walks flat).
    """
    n_agents = pr.shape[0] // 2
    t = pr.shape[1]
    pos = pr.reshape(n_agents, 2, t)
    vel = prd.reshape(n_agents, 2, t)

    yaw = jnp.arctan2(vel[:, 1], vel[:, 0])                      # (A, T)
    yaw_pad = jnp.concatenate([yaw[:, :1], yaw, yaw[:, -1:]], axis=1)
    dyaw = yaw_pad[:, 2:] - yaw_pad[:, :-2]
    dyaw = jnp.arctan2(jnp.sin(dyaw), jnp.cos(dyaw))             # wrap
    yaw_rate = dyaw / (2.0 * dt)

    zeros = jnp.zeros_like(yaw)
    ref = jnp.stack(
        [
            pos[:, 0], pos[:, 1], jnp.full_like(yaw, z_height),
            vel[:, 0], vel[:, 1], zeros,
            zeros, zeros, yaw,
            zeros, zeros, yaw_rate,
        ],
        axis=-1,
    )
    return ref
