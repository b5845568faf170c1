"""Offline visualization: the TPU-native replacement for the reference's
rendering/analysis role.

The reference renders live through RaiSim's OgreVis (`src/A1_Sim.cpp:825-857`,
one `renderOneFrame` every 30 ticks at `:1216-1217`, helper headers in
`raisimOgre_include/`) and plots offline in MATLAB
(`matlab_scripts/PlotHLReference.m`, `matlab_dbg/plot_mpc_dbg.m`). In a
batched device-resident engine the honest equivalent is offline rendering of
logged trajectories: state lives on-device, campaigns run thousands of lanes,
and the useful artifacts are (a) 3-D robot skeleton renders / animations of a
whole-body rollout and (b) top-view team/obstacle plots of a campaign.
Everything here is matplotlib(Agg)+numpy on host data — nothing touches the
hot path.

Conventions: `q` is the 18-dof generalized coordinate vector of
`srbx.models.rbd` (base pos, base XYZ-Euler, 4 legs x hip/thigh/calf);
trajectories are arrays shaped (T, nq) (whole-body) or (domains, agents, 2)
(template campaigns).
"""

from __future__ import annotations

import numpy as np

from srbx.models import rbd


def _mpl():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


# trunk collision-box dimensions from the reference's robot description
# (`rsc/A1/A1_modified.urdf` trunk <collision> box size)
TRUNK_DIMS = (0.267, 0.194, 0.114)


def skeleton_segments(model: rbd.Model, q):
    """Line segments (world frame) of the robot's skeleton at q.

    Returns (segments, toe_xyz): `segments` is a list of (2, 3) arrays —
    the 12 trunk-box edges plus, per leg, hip-abduction -> thigh-joint ->
    calf-joint -> toe. Leg chains come from the same `rbd.link_frames` FK
    every controller evaluation uses, so a render IS a view of the
    controller's kinematics (`srbx/models/rbd.py`), not a parallel
    implementation.
    """
    q = np.asarray(q)
    rots, pos = rbd.link_frames(model, q)
    rots = [np.asarray(r) for r in rots]
    pos = [np.asarray(p) for p in pos]
    sites = np.asarray(rbd.site_positions(model, q))

    segs = []
    # trunk box (8 corners in the base frame)
    hx, hy, hz = (d / 2.0 for d in TRUNK_DIMS)
    corners = np.array(
        [[sx * hx, sy * hy, sz * hz]
         for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
    )
    world = pos[0] + corners @ rots[0].T
    edges = [(0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3), (4, 6), (5, 7),
             (0, 4), (1, 5), (2, 6), (3, 7)]
    for a, b in edges:
        segs.append(np.stack([world[a], world[b]]))

    # legs: link i layout is 3 per leg (hip, thigh, calf); toe = site row
    n_legs = len(model.links) // 3
    for leg in range(n_legs):
        hip_i, thigh_i, calf_i = 3 * leg, 3 * leg + 1, 3 * leg + 2
        chain = [pos[1 + hip_i], pos[1 + thigh_i], pos[1 + calf_i],
                 sites[leg]]
        for a, b in zip(chain[:-1], chain[1:]):
            segs.append(np.stack([a, b]))
    return segs, sites[:4]


def render_pose(model: rbd.Model, q, ax=None, color="C0", ground=True):
    """Draw one robot skeleton into a 3-D axes (created if None)."""
    plt = _mpl()
    if ax is None:
        fig = plt.figure(figsize=(6, 5))
        ax = fig.add_subplot(projection="3d")
    segs, toes = skeleton_segments(model, q)
    for s in segs:
        ax.plot(s[:, 0], s[:, 1], s[:, 2], color=color, lw=1.2)
    ax.scatter(toes[:, 0], toes[:, 1], toes[:, 2], color=color, s=12)
    if ground:
        c = np.asarray(q)[:2]
        gx, gy = np.meshgrid(np.linspace(c[0] - 0.5, c[0] + 0.5, 2),
                             np.linspace(c[1] - 0.5, c[1] + 0.5, 2))
        ax.plot_surface(gx, gy, np.zeros_like(gx), alpha=0.15, color="gray")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.set_zlabel("z [m]")
    return ax


def render_wholebody(model: rbd.Model, q_traj, path, stride=50,
                     n_ghosts=6, elev=18, azim=-60):
    """Render a whole-body rollout as a ghosted-pose strip -> PNG.

    q_traj: (T, nq) logged generalized coordinates (e.g. from
    `srbx.sim.closedloop.run` / the datalog ring buffer). Draws n_ghosts
    poses fading in alpha plus the COM track.
    """
    plt = _mpl()
    q_traj = np.asarray(q_traj)
    fig = plt.figure(figsize=(8, 5))
    ax = fig.add_subplot(projection="3d")
    idx = np.linspace(0, len(q_traj) - 1, n_ghosts).astype(int)
    for rank, i in enumerate(idx):
        alpha = 0.25 + 0.75 * rank / max(len(idx) - 1, 1)
        segs, toes = skeleton_segments(model, q_traj[i])
        for s in segs:
            ax.plot(s[:, 0], s[:, 1], s[:, 2], color="C0", lw=1.0,
                    alpha=alpha)
    com = q_traj[::stride, :3]
    ax.plot(com[:, 0], com[:, 1], com[:, 2], "C1-", lw=1.5, label="COM")
    ax.view_init(elev=elev, azim=azim)
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.set_zlabel("z [m]")
    ax.legend(loc="upper left")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def animate_wholebody(model: rbd.Model, q_traj, path, stride=20, fps=15):
    """Animate a whole-body rollout -> GIF (PillowWriter, no extra deps).

    The offline stand-in for OgreVis's `renderOneFrame` every-30-ticks loop
    (`src/A1_Sim.cpp:1216-1217`); stride=20 on a 1 kHz log gives 50 wall-ms
    per frame.
    """
    plt = _mpl()
    from matplotlib import animation

    q_traj = np.asarray(q_traj)[::stride]
    fig = plt.figure(figsize=(6, 5))
    ax = fig.add_subplot(projection="3d")

    xy = q_traj[:, :2]
    lo = xy.min(0) - 0.4
    hi = xy.max(0) + 0.4

    def draw(i):
        ax.cla()
        render_pose(model, q_traj[i], ax=ax)
        ax.set_xlim(lo[0], hi[0])
        ax.set_ylim(lo[1], hi[1])
        ax.set_zlim(0, 0.6)
        ax.set_title(f"t = {i * stride} ticks")

    ani = animation.FuncAnimation(fig, draw, frames=len(q_traj))
    ani.save(path, writer=animation.PillowWriter(fps=fps))
    plt.close(fig)
    return path


def plot_team_campaign(traj, pobs, path, success=None, fail_radius=0.5,
                       goal=(10.0, 0.0), max_panels=6):
    """Top-view plot of template-campaign trajectories over their obstacle
    fields -> PNG. The batched replacement for the reference's MATLAB APF
    plot (`matlab_scripts/PlotHLReference.m`).

    traj: (S, domains, agents, 2) from CampaignResult.traj (or a single
    (domains, agents, 2) scenario); pobs: (S, 2, n_obs) or (2, n_obs) REAL
    obstacle fields; success: optional (S, agents) bool — failed lanes draw
    red. Each scenario's field is different, so scenarios render as
    separate panels (up to max_panels, failures panel-prioritized).
    """
    plt = _mpl()
    traj = np.asarray(traj)
    pobs = np.asarray(pobs)
    if traj.ndim == 3:
        traj = traj[None]
    if pobs.ndim == 2:
        pobs = pobs[None, :, :].repeat(traj.shape[0], 0)
    if success is not None:
        success = np.asarray(success).reshape(traj.shape[0], traj.shape[2])

    n_s = traj.shape[0]
    # show failures first — they are the interesting panels
    order = np.arange(n_s)
    if success is not None:
        order = np.argsort(success.all(axis=1).astype(int), kind="stable")
    show = order[: min(n_s, max_panels)]
    ncol = min(len(show), 2)
    nrow = (len(show) + ncol - 1) // ncol
    fig, axes = plt.subplots(nrow, ncol, figsize=(7.5 * ncol, 3.2 * nrow),
                             squeeze=False)
    for panel, s in enumerate(show):
        ax = axes[panel // ncol][panel % ncol]
        for o in pobs[s].T:
            ax.add_patch(plt.Circle(o, fail_radius, color="0.8", lw=0))
            ax.plot(*o, "k.", ms=3)
        for a in range(traj.shape[2]):
            ok = True if success is None else bool(success[s, a])
            ax.plot(traj[s, :, a, 0], traj[s, :, a, 1],
                    color=("C0" if ok else "C3"), lw=1.4)
            ax.plot(*traj[s, 0, a], marker="o", ms=4,
                    color=("C0" if ok else "C3"))
        ax.plot(*goal, "g*", ms=12)
        ax.set_aspect("equal")
        label = f"scenario {s}"
        if success is not None and not success[s].all():
            label += " (FAIL)"
        ax.set_title(label, fontsize=9)
    for panel in range(len(show), nrow * ncol):
        axes[panel // ncol][panel % ncol].axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=130)
    plt.close(fig)
    return path
