"""NMPC optimal-control-problem assembly as pure, batched functions.

Builds the event-based LIP MPC quadratic program of `MPC_dist::run_NMPC`
(`src/MPC_dist.cpp:81-454`) with static padded shapes:

  decision x = [ x_1..x_N (4 each) | u_1..u_N (2 each) | lambda (4 per grid,
                 one slot per leg, padded) | slack ]          -> n = 41
  equalities  : LIP dynamics rollout, COP = sum(foothold * lambda),
                sum(lambda) = 1 per grid                      -> me = 28
  inequalities: |com_k - u_{k+1}| <= mu*h/sqrt(2), +-box on x and u,
                0 <= lambda <= 1                              -> mi = 92

Variable contact count (2 vs 4, `src/MPC_dist.cpp:132-135`) is handled by
masking: absent legs get zero foothold columns, are dropped from the
sum-lambda row, and get unit diagonal cost pinning their lambda to 0 — the
compacted solution of the reference is recovered exactly (test-verified).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from srbx.config import MpcConfig
from srbx.models import lip


class OcpData(NamedTuple):
    """Padded QP operands, ready for srbx.ops.qp (batched via vmap)."""

    P: jnp.ndarray
    c: jnp.ndarray
    A: jnp.ndarray
    b: jnp.ndarray
    G: jnp.ndarray
    h: jnp.ndarray


def reference_window(pr, prd, agent_id: int, gait_domain, horizon: int):
    """Slice the N-knot desired-COM window from the refined APF trajectory.

    Matches `copPlanner_eventbase` (`src/MPC_dist.cpp:702-782`): rows of the
    (4, N) window are (x, dx, y, dy); window k of agent a reads columns
    [N*gait_domain, N*gait_domain + N) of Pr/Prd rows 2a (x) and 2a+1 (y).

    pr, prd: (2*n_agents, T) position / velocity reference tables.
    gait_domain may be a traced integer (dynamic_slice).
    """
    start = gait_domain * horizon
    px = jnp.stack(
        [
            jnp.asarray(pr)[2 * agent_id],
            jnp.asarray(prd)[2 * agent_id],
            jnp.asarray(pr)[2 * agent_id + 1],
            jnp.asarray(prd)[2 * agent_id + 1],
        ]
    )
    return jax.lax.dynamic_slice_in_dim(px, start, horizon, axis=1)


def assemble(cfg: MpcConfig, x0, ref_traj, foothold_xy, contact_ind, dtype=None):
    """Build the padded NMPC QP.

    Args:
      cfg: MpcConfig (static).
      x0: (4,) current LIP state (x, dx, y, dy) (`src/MPC_dist.cpp:226-229`).
      ref_traj: (4, N) desired (x, dx, y, dy) knots from reference_window.
      foothold_xy: (2, 4) world xy of each leg's foothold (FR, FL, RR, RL)
        — `footholdsPlanner` output (`src/MPC_dist.cpp:1204-1266`).
      contact_ind: (4,) 0/1 contact mask for the current domain.

    Returns OcpData with shapes (n,n),(n,),(me,n),(me,),(mi,n),(mi,).
    """
    dtype = dtype or x0.dtype
    n_s, m, N, nd = cfg.n_state, cfg.n_input, cfg.horizon, cfg.ndomain
    nN, mN = n_s * N, m * N
    n_lam = cfg.n_lambda
    n = cfg.num_dec
    me = cfg.n_eq
    # Build the FULL inequality block; the elided-box variant drops rows at
    # the end (static indexing, so shapes stay jit-constant per config).
    mi = 2 * m * (N - 1) + 2 * nN + 2 * mN + 2 * n_lam

    contact_ind = contact_ind.astype(dtype)
    ad, bd = lip.discrete(cfg.lip)
    ad = jnp.asarray(ad, dtype)
    bd = jnp.asarray(bd, dtype)

    # ------------------------------ cost ---------------------------------- #
    q_diag = np.zeros(n)
    q_diag[:nN] = cfg.q_weight
    q_diag[n_s * (N - 1) : nN] = cfg.p_weight          # terminal block
    q_diag[nN : nN + mN] = cfg.r_weight
    q_diag[-1] = cfg.slack_weight
    p_mat = jnp.asarray(np.diag(q_diag), dtype)
    # Pin padded lambda slots (absent legs) with a stiff cost; real slots
    # cost 0 as in the reference. The pinned slots have zero foothold columns
    # and are excluded from the sum-lambda rows, so any residual interior
    # value (~sqrt(gap/weight)) is inert for the trajectory.
    lam_mask = jnp.tile(contact_ind, (nd,))            # (16,) grid-major
    lam_cost = 1e2 * (1.0 - lam_mask)
    p_mat = p_mat.at[
        jnp.arange(nN + mN, nN + mN + n_lam), jnp.arange(nN + mN, nN + mN + n_lam)
    ].set(lam_cost)

    ref_vec = ref_traj.T.reshape(-1).astype(dtype)     # knot-major (4 per knot)
    weights = jnp.asarray(q_diag[:nN], dtype)
    c = jnp.zeros((n,), dtype).at[:nN].set(-ref_vec * weights)

    # --------------------------- equalities ------------------------------- #
    a_eq = jnp.zeros((me, n), dtype)
    b_eq = jnp.zeros((me,), dtype)

    # LIP rollout: x_1 = Ad x0 + Bd u_1 ; x_{k+1} = Ad x_k + Bd u_{k+1}
    # (reference rows `src/MPC_dist.cpp:252-260`). Written as
    # (Abig - I) x + Bbig u = -Abigx0 x0, with Abig the block-subdiagonal
    # of Ad built via kron with the shift pattern.
    shift = np.zeros((N, N))
    for i in range(N - 1):
        shift[i + 1, i] = 1.0
    a_dyn = jnp.kron(jnp.asarray(shift, dtype), ad) - jnp.eye(nN, dtype=dtype)
    b_dyn = jnp.kron(jnp.eye(N, dtype=dtype), bd)
    a_eq = a_eq.at[:nN, :nN].set(a_dyn)
    a_eq = a_eq.at[:nN, nN : nN + mN].set(b_dyn)
    b_eq = b_eq.at[:n_s].set(-(ad @ x0.astype(dtype)))

    # COP = foothold combination: u_k - Fp_k lambda_k = 0
    # (`src/MPC_dist.cpp:255-257`): Fp_k = foothold_xy * mask, same for all k
    # of the domain (footholdsPlanner repeats the current footholds).
    fp = foothold_xy.astype(dtype) * contact_ind[None, :]   # (2, 4)
    for k in range(N):
        a_eq = a_eq.at[
            nN + k * m : nN + (k + 1) * m, nN + k * m : nN + (k + 1) * m
        ].set(jnp.eye(m, dtype=dtype))
        a_eq = a_eq.at[
            nN + k * m : nN + (k + 1) * m, nN + mN + 4 * k : nN + mN + 4 * (k + 1)
        ].set(-fp)

    # sum(lambda_k) = 1 over present legs (`src/MPC_dist.cpp:258-261`).
    for k in range(N):
        a_eq = a_eq.at[nN + mN + k, nN + mN + 4 * k : nN + mN + 4 * (k + 1)].set(
            contact_ind
        )
        b_eq = b_eq.at[nN + mN + k].set(1.0)

    # -------------------------- inequalities ------------------------------ #
    g = jnp.zeros((mi, n), dtype)
    h = jnp.ones((mi,), dtype)

    # |com_k - u_{k+1}| <= mu*h/sqrt(2) (`src/MPC_dist.cpp:278-292,315`):
    # row pair i couples state knot i (x_{i+1}) with input u_{i+2}.
    xsel = np.zeros((m, n_s))
    xsel[0, 0] = 1.0
    xsel[1, 2] = 1.0
    gsubx = np.zeros((m * (N - 1), nN))
    gsubu = np.zeros((m * (N - 1), mN))
    for i in range(N - 1):
        gsubx[i * m : (i + 1) * m, i * n_s : (i + 1) * n_s] = xsel
        gsubu[i * m : (i + 1) * m, (i + 1) * m : (i + 2) * m] = np.eye(m)
    r0 = 0
    g = g.at[r0 : r0 + m * (N - 1), :nN].set(jnp.asarray(gsubx, dtype))
    g = g.at[r0 : r0 + m * (N - 1), nN : nN + mN].set(jnp.asarray(-gsubu, dtype))
    g = g.at[r0 + m * (N - 1) : r0 + 2 * m * (N - 1), :nN].set(
        jnp.asarray(-gsubx, dtype)
    )
    g = g.at[r0 + m * (N - 1) : r0 + 2 * m * (N - 1), nN : nN + mN].set(
        jnp.asarray(gsubu, dtype)
    )
    cop_bound = cfg.mu * cfg.lip.h / math_sqrt2(dtype)
    h = h.at[: 2 * m * (N - 1)].set(cop_bound)

    # +-box on states and inputs (`src/MPC_dist.cpp:294-297,317-318`).
    r1 = 2 * m * (N - 1)
    g = g.at[r1 : r1 + nN, :nN].set(jnp.eye(nN, dtype=dtype))
    g = g.at[r1 + nN : r1 + 2 * nN, :nN].set(-jnp.eye(nN, dtype=dtype))
    g = g.at[r1 + 2 * nN : r1 + 2 * nN + mN, nN : nN + mN].set(jnp.eye(mN, dtype=dtype))
    g = g.at[r1 + 2 * nN + mN : r1 + 2 * nN + 2 * mN, nN : nN + mN].set(
        -jnp.eye(mN, dtype=dtype)
    )
    h = h.at[r1 : r1 + 2 * nN + 2 * mN].set(cfg.box_bound)

    # 0 <= lambda <= 1 (`src/MPC_dist.cpp:299-300,320-321`).
    r2 = r1 + 2 * nN + 2 * mN
    lam_cols = slice(nN + mN, nN + mN + n_lam)
    g = g.at[r2 : r2 + n_lam, lam_cols].set(-jnp.eye(n_lam, dtype=dtype))
    h = h.at[r2 : r2 + n_lam].set(0.0)
    g = g.at[r2 + n_lam : r2 + 2 * n_lam, lam_cols].set(jnp.eye(n_lam, dtype=dtype))
    h = h.at[r2 + n_lam : r2 + 2 * n_lam].set(1.0)

    if cfg.elide_box_rows:
        b0, b1 = cfg.box_row_range
        # also drop lambda <= 1 (rows [r2 + n_lam, r2 + 2 n_lam)): implied
        # by sum(lambda) = 1 equalities + lambda >= 0.
        keep = np.r_[0:b0, r2 : r2 + n_lam]
        g = g[keep, :]
        h = h[keep]

    return OcpData(p_mat, c, a_eq, b_eq, g, h)


def math_sqrt2(dtype):
    return jnp.asarray(np.sqrt(2.0), dtype)


def unpack(cfg: MpcConfig, x):
    """Split a decision vector into (states (N,4), inputs (N,2), lambda, slack).

    Mirrors `src/MPC_dist.cpp:431-440`.
    """
    n_s, m, N = cfg.n_state, cfg.n_input, cfg.horizon
    nN, mN = n_s * N, m * N
    states = x[..., :nN].reshape(*x.shape[:-1], N, n_s)
    inputs = x[..., nN : nN + mN].reshape(*x.shape[:-1], N, m)
    lam = x[..., nN + mN : nN + mN + cfg.n_lambda]
    slack = x[..., -1]
    return states, inputs, lam, slack


def expansion(cfg: MpcConfig, x0, foothold_xy, contact_ind, dtype=None):
    """Affine expansion of the condensed decision space.

    The NMPC QP's dynamics equalities (x_{k+1} = Ad x_k + Bd u_{k+1}) and
    COP-coupling equalities (u_k = Fp lambda_k) are linear with a trivially
    invertible structure, so they are eliminated in closed form (standard
    condensed MPC — the sparse formulation the reference solves with iSWIFT's
    sparse LDL, `src/MPC_dist.cpp:249-261`, maps to a dense condensed QP on
    TPU where dense batched algebra is the fast regime):

        x_full = e0 + E v,   v = [lambda (n_lambda), slack]   (n_cond = 17)

    with x = Sx x0 + Su u and u = blockdiag(Fp) lambda. The sum-lambda rows
    stay as the condensed QP's only equalities. Returns (E, e0) with
    E: (num_dec, n_cond), e0: (num_dec,).
    """
    dtype = dtype or x0.dtype
    n_s, m, N = cfg.n_state, cfg.n_input, cfg.horizon
    nN, mN, n_lam = n_s * N, m * N, cfg.n_lambda
    n = cfg.num_dec
    n_cond = n_lam + 1

    ad, bd = lip.discrete(cfg.lip)
    ad = np.asarray(ad, np.float64)
    bd = np.asarray(bd, np.float64)

    # Static rollout operators (trace-time numpy — Ad, Bd are config constants).
    pows = [np.eye(n_s)]
    for _ in range(N):
        pows.append(pows[-1] @ ad)         # pows[i] = Ad^i
    sx = np.concatenate([pows[k + 1] for k in range(N)], axis=0)   # (nN, n_s)
    su = np.zeros((nN, mN))
    for k in range(N):
        for j in range(k + 1):
            su[k * n_s : (k + 1) * n_s, j * m : (j + 1) * m] = pows[k - j] @ bd
    sx = jnp.asarray(sx, dtype)
    su = jnp.asarray(su, dtype)

    # u = blockdiag(Fp) lambda with Fp masked by contact (runtime values).
    # Built as kron/concat block composition, NOT .at[].set scatters: under
    # vmap each batched dynamic-update-slice rewrites the whole padded
    # (B, rows, cols) buffer — profiled at 53 ms per scatter at B=131072
    # (the lane dim pads 17 -> 128), which made this function 60% of the
    # NMPC cycle. The block composition fuses to one pass.
    fp = foothold_xy.astype(dtype) * contact_ind.astype(dtype)[None, :]
    efp = jnp.kron(jnp.eye(N, dtype=dtype), fp)        # (mN, n_lam) blockdiag

    def _with_zero_col(block):
        return jnp.concatenate(
            [block, jnp.zeros(block.shape[:-1] + (1,), dtype)], axis=-1
        )

    slack_row = jnp.concatenate(
        [jnp.zeros((1, n_lam), dtype), jnp.ones((1, 1), dtype)], axis=-1
    )
    e_mat = jnp.concatenate(
        [
            _with_zero_col(su @ efp),                  # states = Su u
            _with_zero_col(efp),                       # inputs = Fp lambda
            _with_zero_col(jnp.eye(n_lam, dtype=dtype)),
            slack_row,
        ],
        axis=0,
    )
    e0 = jnp.concatenate(
        [sx @ x0.astype(dtype), jnp.zeros((n - nN,), dtype)]
    )

    if cfg.elide_simplex:
        # Second-stage elimination: per knot, express the first stance leg's
        # lambda through its simplex row, lambda_{j*} = 1 - sum_{stance
        # i != j*} lambda_i. The sum-lambda equalities then hold identically
        # (condense drops them); the eliminated coordinate's lambda >= 0 row
        # becomes the sum <= 1 row automatically under the projection.
        # n_cond 17 -> 13.
        t_knot, d_knot = _simplex_elim_maps(contact_ind, dtype)
        n_cond2 = 3 * cfg.ndomain + 1
        t_core = jnp.kron(jnp.eye(cfg.ndomain, dtype=dtype), t_knot)
        t_mat = jnp.concatenate(
            [
                jnp.concatenate(
                    [t_core, jnp.zeros((n_lam, 1), dtype)], axis=-1
                ),
                jnp.concatenate(
                    [jnp.zeros((1, n_cond2 - 1), dtype),
                     jnp.ones((1, 1), dtype)], axis=-1,
                ),
            ],
            axis=0,
        )
        d_vec = jnp.concatenate(
            [jnp.tile(d_knot, cfg.ndomain), jnp.zeros((1,), dtype)]
        )
        e0 = e0 + e_mat @ d_vec
        e_mat = e_mat @ t_mat

    return e_mat, e0


def _simplex_order(contact_ind):
    """Per-knot lambda ordering [j*, rest...] with j* = first stance leg."""
    idx = jnp.arange(4)
    j_star = jnp.argmax(contact_ind)
    return jnp.argsort(jnp.where(idx == j_star, -1, idx))


def _simplex_elim_maps(contact_ind, dtype):
    """(t_knot (4, 3), d_knot (4,)) with lambda_k = t_knot v_k + d_knot."""
    ci = contact_ind.astype(dtype)
    order = _simplex_order(ci)
    pm = jax.nn.one_hot(order, 4, dtype=dtype)         # row r = e_{order[r]}
    s_rest = ci[order][1:]                             # kept coords' stance mask
    t_knot = pm.T @ jnp.concatenate(
        [-s_rest[None, :], jnp.eye(3, dtype=dtype)], axis=0
    )
    d_knot = pm.T @ jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype)
    return t_knot, d_knot


def condense(cfg: MpcConfig, data: OcpData, e_mat, e0) -> OcpData:
    """Project the assembled QP onto the condensed space (see `expansion`).

    The dynamics + COP equalities hold identically under the expansion, so
    only the sum-lambda rows remain as equalities; cost and inequalities are
    exact affine substitutions — the condensed optimum expands to the full
    optimum (test-enforced to 1e-8 in f64).
    """
    nN, mN = cfg.n_state * cfg.horizon, cfg.n_input * cfg.horizon
    pe = data.P @ e_mat
    p_c = e_mat.T @ pe
    p_c = 0.5 * (p_c + p_c.T)
    c_c = e_mat.T @ (data.c + data.P @ e0)
    if cfg.elide_simplex:
        # the sum-lambda rows hold identically under the elimination — the
        # condensed problem has NO equality rows. me=0 lets the fused
        # kernel take its noeq specialization (skips the whole Schur
        # stage); backends that need me >= 1 get an inert (0 = 0) row
        # re-added inside qp_batch.solve (quasidefinite dual
        # regularization keeps dy = 0 there, so the solutions coincide).
        n_c = e_mat.shape[1]
        a_c = jnp.zeros((0, n_c), e_mat.dtype)
        b_c = jnp.zeros((0,), e_mat.dtype)
    else:
        a_keep = data.A[nN + mN :]
        b_keep = data.b[nN + mN :]
        a_c = a_keep @ e_mat
        b_c = b_keep - a_keep @ e0
    g_c = data.G @ e_mat
    h_c = data.h - data.G @ e0
    return OcpData(p_c, c_c, a_c, b_c, g_c, h_c)


def condense_rows(rows, rhs, e_mat, e0):
    """Project extra inequality rows (SQP CBF / velocity) onto the condensed
    space: rows.(e0 + E v) <= rhs  =>  (rows E) v <= rhs - rows.e0."""
    return rows @ e_mat, rhs - rows @ e0


def expand(e_mat, e0, v):
    """Map a condensed solution back to the full decision vector."""
    return e0 + e_mat @ v


def contract(cfg: MpcConfig, x_full, contact_ind=None):
    """Extract the condensed coordinates from a full decision vector — the
    warm-start handoff in condensed space: (lambda, slack), or with
    cfg.elide_simplex the per-knot kept lambdas (requires contact_ind for
    the per-lane elimination order)."""
    nN, mN = cfg.n_state * cfg.horizon, cfg.n_input * cfg.horizon
    lam = x_full[nN + mN : nN + mN + cfg.n_lambda]
    if cfg.elide_simplex:
        if contact_ind is None:
            raise ValueError("contract with elide_simplex needs contact_ind")
        keep = _simplex_order(contact_ind.astype(x_full.dtype))[1:]
        lam = lam.reshape(cfg.ndomain, 4)[:, keep].reshape(-1)
    return jnp.concatenate([lam, x_full[-1:]])


def default_footholds(agent_initial, dtype=None):
    """Nominal stance footholds before locomotion starts
    (`src/MPC_dist.cpp:1205-1216`): initFootprint + agent initial xy."""
    dtype = dtype or agent_initial.dtype
    init = jnp.asarray(
        [[0.2188, 0.2188, -0.1472, -0.1472], [-0.1320, 0.1320, -0.1320, 0.1320]],
        dtype,
    )
    return init + agent_initial[:, None]


# Nominal leg offsets of the PLANNED footstep table
# (`src/MPC_dist.cpp:519-524`: FR, FL, RR, RL), relative to the body center.
PLANNED_OFFSETS = (
    (0.1830, -0.1320),
    (0.1830, 0.1320),
    (-0.1830, -0.1320),
    (-0.1830, 0.1320),
)


def planned_footprint_table(
    pr_agent,
    agent_initial,
    cycle,
    samples_per_domain: int = 8,
):
    """Planned footstep table over ALL gait domains — the TPU realization of
    `MPC_dist::footstepPlanner_eventbase` (`src/MPC_dist.cpp:456-700`).

    The reference builds, once per cycle, an 8xM `totalFootprint` matrix:
    domain k's foothold for a leg that TOUCHES DOWN at k is the refined APF
    reference COM at the end of domain k's window plus the leg's nominal
    offset (`:562-575`); a leg already in stance CARRIES its previous
    foothold (`:568-571`); swing legs are marked inf (`:576-578`, realized
    here as the pad-and-mask convention: carried value + contact mask).
    Domains 0 and 1 use the initial footprint anchored at the agent start
    (`:531-547`).

    Args:
      pr_agent: (2, T) refined reference for this agent (absolute xy).
      agent_initial: (2,) start position.
      cycle: (M, 4) planned contact schedule (gait.contact_schedule).
    Returns:
      footprints: (M, 4, 2) per-domain foothold of each leg (carried during
        swing), mask: (M, 4) the stance mask (== cycle).
    """
    dtype = pr_agent.dtype
    cycle = jnp.asarray(cycle, jnp.int32)
    m_dom = cycle.shape[0]
    offsets = jnp.asarray(PLANNED_OFFSETS, dtype)

    k = jnp.arange(m_dom)
    idx = jnp.clip(
        samples_per_domain * (k - 2) + samples_per_domain - 1,
        0,
        pr_agent.shape[1] - 1,
    )
    anchors = jnp.where(
        (k < 2)[:, None], agent_initial[None, :], pr_agent[:, idx].T
    )                                                    # (M, 2)
    touchdown = anchors[:, None, :] + offsets[None, :, :]  # (M, 4, 2)

    ci_prev = jnp.concatenate([jnp.ones((1, 4), jnp.int32), cycle[:-1]], 0)

    def step(prev_fp, inp):
        ci, ci_p, td = inp
        stay = (ci > 0) & (ci_p > 0)
        fp = jnp.where(
            (ci > 0)[:, None],
            jnp.where(stay[:, None], prev_fp, td),
            prev_fp,                                      # swing: carry
        )
        return fp, fp

    _, fps = jax.lax.scan(step, touchdown[0], (cycle, ci_prev, touchdown))
    return fps, cycle


def planned_footholds(footprints, mask, gait_domain):
    """(2, 4) foothold matrix + (4,) contact mask for one gait domain, with
    the reference's terminal-column clamp (`src/MPC_dist.cpp:619-625`:
    domains past the schedule repeat the last all-stance column)."""
    d = jnp.clip(gait_domain, 0, footprints.shape[0] - 1)
    return footprints[d].T, mask[d]
