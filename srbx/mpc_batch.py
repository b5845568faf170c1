"""Batch-level NMPC cycle — the TPU production path.

Functionally identical to vmapping srbx.mpc.run_nmpc, but the QP/SQP solves
run through the batch-native IPM (srbx.ops.qp_batch) so the factorization
backend can be the Pallas lanes-last kernels (measured ~3.8x over XLA's
batched Cholesky at the NMPC shapes). Everything around the solves (QP
assembly, CBF linearization, Bezier fit) is vmapped pure functions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from srbx import mpc, sqp
from srbx.config import MpcConfig, QpConfig
from srbx.ocp import (
    assemble,
    condense,
    condense_rows,
    contract,
    default_footholds,
    expand,
    expansion,
    reference_window,
    unpack,
)
from srbx.ops import qp_batch
from srbx.ops.bezier import fit_domain_bezier


def run_nmpc_batch(
    cfg: MpcConfig,
    qp_cfg: QpConfig,
    carry: mpc.MpcCarry,          # leaves batched (B, ...)
    q_xy,                         # (B, 2)
    dq_xy,                        # (B, 2)
    toe_xy,                       # (B, 2, 4)
    contact_ind,                  # (B, 4)
    pr_agent,                     # (B, 2, T)
    prd_agent,                    # (B, 2, T)
    agent_initial,                # (B, 2)
    pobs_real,                    # (B, 2, n_obs)
    backend: str = "pallas",
    tile: int = 256,
    interpret: bool = False,
    condensed: bool | None = None,
    state_other=None,             # optional (B, 4) neighbor (x, y, dx, dy)
    agent_circle_eps: float = 0.0,
    x0_warm=None,                 # optional (B, num_dec) first-QP warm start
) -> mpc.MpcOutput:
    if condensed is None:
        condensed = cfg.condensed
    dtype = q_xy.dtype
    bsz = q_xy.shape[0]

    # effective stance mask (nominal override before locomotion starts) —
    # shared by the QP build, the condensed warm-start contraction, and the
    # hold-position fallback
    ci_eff = jnp.where(
        (carry.gait_domain <= 1)[:, None], jnp.ones_like(contact_ind),
        contact_ind,
    )

    def build(carry_a, q, dq, toe, ci2, pr, prd, a0):
        x0 = jnp.stack([q[0], dq[0], q[1], dq[1]])
        ref = reference_window(pr, prd, 0, carry_a.gait_domain, cfg.horizon)
        nominal = default_footholds(a0.astype(dtype))
        use_nominal = carry_a.gait_domain <= 1
        foot = jnp.where(use_nominal, nominal, toe)
        data = assemble(cfg, x0, ref, foot, ci2, dtype=dtype)
        e_mat, e0 = expansion(cfg, x0, foot, ci2, dtype=dtype)
        return data, e_mat, e0

    data, e_mat, e0 = jax.vmap(build)(
        carry, q_xy, dq_xy, toe_xy, ci_eff, pr_agent, prd_agent,
        agent_initial,
    )

    if condensed:
        data_s = jax.vmap(lambda d, e, o: condense(cfg, d, e, o))(
            data, e_mat, e0
        )
    else:
        data_s = data

    if x0_warm is not None:
        x0w = (
            jax.vmap(lambda xx, cc: contract(cfg, xx, cc))(x0_warm, ci_eff)
            if condensed else x0_warm
        )
    else:
        x0w = None
    qp_sol = qp_batch.solve(*data_s, qp_cfg, backend=backend, tile=tile,
                            interpret=interpret, x0=x0w)
    x = (
        jax.vmap(expand)(e_mat, e0, qp_sol.x) if condensed else qp_sol.x
    )

    obs_xy = jax.vmap(lambda q, p: mpc.closest_obstacle(q, p.astype(dtype))[0])(
        q_xy, pobs_real
    )
    if state_other is None:
        circles = obs_xy[:, None, :]                   # (B, 1, 2)
        mask = jnp.ones((bsz, 1), dtype)
    else:
        # distributed inter-agent safety: the neighbor's broadcast position
        # becomes a second CBF circle (mirrors mpc.run_nmpc)
        circles = jnp.stack([obs_xy, state_other[:, :2].astype(dtype)], axis=1)
        mask = jnp.broadcast_to(
            jnp.asarray([1.0, 1.0 if agent_circle_eps > 0 else 0.0], dtype),
            (bsz, 2),
        )

    if cfg.use_sqp:
        vel_g, vel_h = sqp._vel_rows(cfg, dtype)
        for _ in range(cfg.sqp_iters):
            cbf = jax.vmap(
                lambda xx, cc, mm: sqp._cbf_rows(cfg, xx, cc, mm, dtype)
            )(x, circles, mask)
            g_ext = jnp.concatenate(
                [data.G, jnp.broadcast_to(vel_g, (bsz,) + vel_g.shape), cbf[0]],
                axis=1,
            )
            h_ext = jnp.concatenate(
                [data.h, jnp.broadcast_to(vel_h, (bsz,) + vel_h.shape), cbf[1]],
                axis=1,
            )
            if condensed:
                g_s, h_s = jax.vmap(condense_rows)(g_ext, h_ext, e_mat, e0)
                x0_s = jax.vmap(lambda xx, cc: contract(cfg, xx, cc))(
                    x, ci_eff)
            else:
                g_s, h_s, x0_s = g_ext, h_ext, x
            sol = qp_batch.solve(
                data_s.P, data_s.c, data_s.A, data_s.b, g_s, h_s, qp_cfg,
                backend=backend, tile=tile, interpret=interpret, x0=x0_s,
            )
            x_new = (
                jax.vmap(expand)(e_mat, e0, sol.x) if condensed else sol.x
            )
            ok = jnp.isfinite(x_new).all(-1, keepdims=True)
            x = jnp.where(ok, x_new, x)

    # per-lane hold-position elasticity (see mpc.run_nmpc); the lambda slots
    # use the same nominal-override stance mask the QP was assembled with
    x0s = jnp.stack([q_xy[:, 0], dq_xy[:, 0], q_xy[:, 1], dq_xy[:, 1]], axis=1)
    holds = jax.vmap(lambda x0, cc: mpc.hold_position_x(cfg, x0, cc))(
        x0s, ci_eff
    )
    x = jnp.where(jnp.isfinite(x).all(-1, keepdims=True), x, holds)

    states, inputs, _, _ = jax.vmap(lambda xx: unpack(cfg, xx))(x)
    knots = jnp.concatenate(
        [carry.alpha_buffer[:, :, None], jnp.swapaxes(states, 1, 2)], axis=2
    )
    alpha_com = fit_domain_bezier(knots)
    new_carry = mpc.MpcCarry(carry.gait_domain + 1, states[:, -1])
    margin = jax.vmap(lambda xx, cc: jnp.min(sqp.cbf_margins(cfg, xx, cc)))(
        x, circles
    )
    return mpc.MpcOutput(
        alpha_com, states, inputs, new_carry, qp_sol.converged, qp_sol.iters,
        margin, x,
    )
