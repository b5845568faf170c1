"""Sequential convex programming for the discrete-CBF NMPC.

Replaces the reference's ifopt+SNOPT NLP stage (`src/MPC_dist.cpp:363-427`,
`include/dec_vars_constr_cost.h:217-410`). The NLP is the MPC QP plus, per
horizon knot k:

  * obstacle-distance (discrete CBF) constraints
        (x_k - ox)^2 + (y_k - oy)^2 + slack >= eps        (eps = 1.9)
    (`dec_vars_constr_cost.h:262-265,401`), generalized here to a set of
    "circles" (closest obstacle, and optionally neighbor agents);
  * velocity saturation  |dx_k|, |dy_k| <= 0.35 m/s
    (`dec_vars_constr_cost.h:270-317`).

Because the squared-distance function g is convex, its linearization
underestimates g, so each linearized constraint g(x_j) + grad.(x - x_j) >= eps
is a conservative (safe) inner approximation — the SQP iterates are always
feasible for the true CBF constraint at convergence. We run a fixed number of
full-step SCP iterations (each subproblem is solved to optimality by the
batched IPM), warm-started from the plain-QP solution exactly as the
reference warm-starts SNOPT from the iSWIFT solution.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from srbx.config import MpcConfig, QpConfig
from srbx.ocp import OcpData
from srbx.ops import qp


class SqpResult(NamedTuple):
    x: jax.Array           # final decision vector
    converged: jax.Array   # last subproblem convergence flag
    qp_iters: jax.Array    # IPM iterations of the last subproblem


def _knot_xy_indices(cfg: MpcConfig):
    ks = jnp.arange(cfg.horizon)
    return 4 * ks, 4 * ks + 2          # x, y positions per knot


def _vel_rows(cfg: MpcConfig, dtype):
    """Static two-sided velocity-saturation rows (16, n)."""
    n = cfg.num_dec
    ks = jnp.arange(cfg.horizon)
    vx_idx = 4 * ks + 1
    vy_idx = 4 * ks + 3
    idx = jnp.concatenate([vx_idx, vy_idx])            # (8,)
    rows = jnp.zeros((8, n), dtype).at[jnp.arange(8), idx].set(1.0)
    g = jnp.concatenate([rows, -rows], axis=0)         # (16, n)
    h = jnp.full((16,), cfg.vel_sat, dtype)
    return g, h


def _cbf_rows(cfg: MpcConfig, x, circles, circle_mask, dtype):
    """Linearized CBF rows at iterate x.

    circles: (n_circ, 2) centers; circle_mask: (n_circ,) 0/1.
    Returns (n_circ*N, n) G rows and rhs h with  G x <= h  equivalent to
    grad_g(x_j) . x >= eps - g(x_j) + grad_g(x_j) . x_j  (masked rows inert).
    """
    n = cfg.num_dec
    N = cfg.horizon
    xi, yi = _knot_xy_indices(cfg)
    px = x[xi]                                         # (N,)
    py = x[yi]
    slack = x[-1]

    dx = px[None, :] - circles[:, 0:1]                 # (n_circ, N)
    dy = py[None, :] - circles[:, 1:2]
    g_val = dx * dx + dy * dy + slack                  # (n_circ, N)

    n_circ = circles.shape[0]
    # scatter-free build: batched .at[].set() compiles to a full rewrite of
    # the padded destination per scatter (see ocp.expansion); the rows are
    # 3-sparse, so compose them from constant one-hot masks instead
    oh_x = jax.nn.one_hot(xi, n, dtype=dtype)          # (N, n) constants
    oh_y = jax.nn.one_hot(yi, n, dtype=dtype)
    oh_s = jax.nn.one_hot(n - 1, n, dtype=dtype)
    rows = (
        (-2.0 * dx)[:, :, None] * oh_x[None, :, :]
        + (-2.0 * dy)[:, :, None] * oh_y[None, :, :]
        - oh_s[None, None, :]
    )
    # -grad.x <= -eps + g - grad.x_j ; grad.x_j = 2dx*px + 2dy*py + slack
    grad_dot_xj = 2.0 * dx * px[None, :] + 2.0 * dy * py[None, :] + slack
    rhs = -cfg.cbf_eps + g_val - grad_dot_xj           # (n_circ, N)

    mask = circle_mask[:, None, None]
    rows = rows * mask
    rhs = jnp.where(circle_mask[:, None] > 0, rhs, 1.0)
    return rows.reshape(n_circ * N, n), rhs.reshape(n_circ * N)


def solve(
    cfg: MpcConfig,
    qp_cfg: QpConfig,
    data: OcpData,
    x_init,
    circles,
    circle_mask,
    full_data: OcpData = None,
    e_mat=None,
    e0=None,
    contact_ind=None,
):
    """Run the SCP loop from the plain-QP warm start x_init.

    When (e_mat, e0) are given, `data` is the condensed QP (srbx.ocp.condense)
    and full_data the full-space one; the CBF/velocity rows are built in full
    space around the full-space iterate x, projected onto the condensed space,
    and each subproblem solves in condensed coordinates (x stays full-space).
    """
    from srbx.ocp import condense_rows, contract, expand

    condensed = e_mat is not None
    row_src = full_data if condensed else data
    dtype = data.P.dtype
    vel_g, vel_h = _vel_rows(cfg, dtype)

    def body(_, carry):
        x, _, _ = carry
        cbf_g, cbf_h = _cbf_rows(cfg, x, circles, circle_mask, dtype)
        if condensed:
            # row_src.G's projection is already data.G (computed once in
            # condense()); only the fresh vel+CBF rows need projecting —
            # bitwise the same as projecting the whole stacked block
            ng, nh = condense_rows(
                jnp.concatenate([vel_g, cbf_g], axis=0),
                jnp.concatenate([vel_h, cbf_h], axis=0), e_mat, e0,
            )
            g_ext = jnp.concatenate([data.G, ng], axis=0)
            h_ext = jnp.concatenate([data.h, nh], axis=0)
            x0_s = contract(cfg, x, contact_ind)
        else:
            g_ext = jnp.concatenate([row_src.G, vel_g, cbf_g], axis=0)
            h_ext = jnp.concatenate([row_src.h, vel_h, cbf_h], axis=0)
            x0_s = x
        sol = qp.solve(data.P, data.c, data.A, data.b, g_ext, h_ext, qp_cfg,
                       x0=x0_s)
        x_sol = expand(e_mat, e0, sol.x) if condensed else sol.x
        if cfg.sqp_linesearch:
            # Merit-function line search (SURVEY.md §7.4): the subproblem's
            # linear rows can underestimate the true (concave-in-distance)
            # CBF constraint, so a full step may worsen the NONLINEAR
            # violation. Evaluate the exact-penalty merit
            #   phi(x) = f(x) + mu * sum relu(eps - g_cbf(x))
            #          + mu * sum relu(vel violation)
            # at a fixed candidate ladder (batched argmin — no data-dependent
            # control flow) and take the best step; t=0 makes phi
            # non-increasing by construction. f uses the full-space
            # quadratic; QP equality/inequality rows are convex-feasible at
            # both endpoints, so they don't enter the merit.
            f_p, f_c = (
                (full_data.P, full_data.c) if condensed else (data.P, data.c)
            )
            ts = jnp.asarray([1.0, 0.5, 0.25, 0.0], dtype)
            cand = x[None, :] + ts[:, None] * (x_sol - x)[None, :]

            def merit(xc):
                f = 0.5 * xc @ (f_p @ xc) + f_c @ xc
                marg = cbf_margins(cfg, xc, circles)
                viol = (
                    jnp.maximum(cfg.cbf_eps - marg, 0.0)
                    * circle_mask[:, None]
                ).sum()
                vv = jnp.maximum(vel_g @ xc - vel_h, 0.0).sum()
                return f + cfg.merit_mu * (viol + vv)

            merits = jax.vmap(merit)(cand)
            # Take the full step unless it genuinely worsens the merit vs
            # the current iterate (ts[-1]=0); only then fall back to the
            # ladder argmin. The slack keeps solver-tolerance noise from
            # engaging the fallback, so in benign fields the line search is
            # exactly inert (LS-on == LS-off, test-enforced).
            m_full, m_cur = merits[0], merits[-1]
            slack = 1e-6 * jnp.maximum(jnp.abs(m_cur), 1.0)
            x_sol = jnp.where(
                m_full <= m_cur + slack, x_sol, cand[jnp.argmin(merits)]
            )
        # NaN-guard: keep previous iterate if the subproblem broke.
        ok = jnp.isfinite(x_sol).all()
        x_new = jnp.where(ok, x_sol, x)
        return x_new, sol.converged, sol.iters

    x, conv, iters = jax.lax.fori_loop(
        0,
        cfg.sqp_iters,
        body,
        (x_init, jnp.asarray(False), jnp.zeros((), jnp.int32)),
    )
    return SqpResult(x, conv, iters)


def solve_penalty(
    cfg: MpcConfig,
    qp_cfg: QpConfig,
    data: OcpData,
    x_init,
    circles,
    circle_mask,
    mu: float = 1e6,
    eps: float = 1.0,
):
    """Penalty-method alternative to the hard-constraint SCP — the analogue
    of the reference's (unused-alternative) `AugCost` term
    (`include/dec_vars_constr_cost.h:450-511`): per horizon knot k and circle,

        cost += mu/2 * max(0, eps - d_k)^2,   d_k = ||p_k - center||.

    Each SCP iteration takes a Gauss-Newton model of the penalty at the
    current iterate (gradient -mu*max(0,eps-d)*unit, curvature mu on the
    active radial direction) folded into (P, c), then re-solves the QP with
    no extra constraint rows. Defaults (mu=1e6, eps=1) match the reference
    (which runs in f64); in f32, mu <= ~1e4 keeps the penalized Hessian
    within f32 conditioning (trajectory agreement verified to 5e-4).
    """
    dtype = data.P.dtype
    n = cfg.num_dec
    xi, yi = _knot_xy_indices(cfg)
    N = cfg.horizon

    def body(_, carry):
        x, _, _ = carry
        px, py = x[xi], x[yi]
        dx = px[None, :] - circles[:, 0:1]             # (n_circ, N)
        dy = py[None, :] - circles[:, 1:2]
        d = jnp.sqrt(dx * dx + dy * dy + 1e-12)
        act = (d < eps).astype(dtype) * circle_mask[:, None]
        ux, uy = dx / d, dy / d                        # radial unit vector
        # Gauss-Newton: J row per (circle, knot) = -[ux, uy] on (x_k, y_k);
        # residual r = max(0, eps - d); grad = mu * J^T r; H = mu * J^T J.
        r = act * (eps - d)
        jrows = jnp.zeros((circles.shape[0], N, n), dtype)
        jrows = jrows.at[:, jnp.arange(N), xi].set(-ux * act)
        jrows = jrows.at[:, jnp.arange(N), yi].set(-uy * act)
        jflat = jrows.reshape(-1, n)
        grad = mu * jflat.T @ r.reshape(-1)
        hess = mu * jflat.T @ jflat
        p_aug = data.P + hess
        c_aug = data.c + grad - hess @ x               # model centered at x
        sol = qp.solve(p_aug, c_aug, data.A, data.b, data.G, data.h,
                       qp_cfg, x0=x)
        ok = jnp.isfinite(sol.x).all()
        x_new = jnp.where(ok, sol.x, x)
        return x_new, sol.converged, sol.iters

    x, conv, iters = jax.lax.fori_loop(
        0,
        cfg.sqp_iters,
        body,
        (x_init, jnp.asarray(False), jnp.zeros((), jnp.int32)),
    )
    return SqpResult(x, conv, iters)


def cbf_margins(cfg: MpcConfig, x, circles):
    """Squared-distance CBF values per (circle, knot) — for diagnostics and
    the trajectory-safety checks in srbx.eval."""
    xi, yi = _knot_xy_indices(cfg)
    dx = x[xi][None, :] - circles[:, 0:1]
    dy = x[yi][None, :] - circles[:, 1:2]
    return dx * dx + dy * dy + x[-1]
