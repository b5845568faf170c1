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

    # Lanes-last condensed pipeline (the TPU production path): when the
    # fused kernel will run anyway, compute the CONDENSED operands directly
    # in lanes-last layout instead of per-lane-vmapped matmuls followed by
    # a batch-leading -> lanes-last relayout of every operand. The
    # materialized transposes were profiled at ~20 ms/solve at B=131072 —
    # more than the solve itself once lanes converge early. This exploits
    # two structural facts of the assembled QP: the full-space P is
    # DIAGONAL, and the full-space G/h carry no per-lane values (cop, box,
    # lambda rows are config constants).
    use_ll = (
        condensed and backend == "fused" and cfg.elide_simplex
        and bsz % tile == 0
    )
    if use_ll:
        from srbx.ops import qp_fused

        proto = assemble(
            cfg, jnp.zeros((4,), dtype),
            jnp.zeros((4, cfg.horizon), dtype),
            jnp.zeros((2, 4), dtype), jnp.ones((4,), dtype), dtype=dtype,
        )
        g_full, h_full = proto.G, proto.h          # lane-constant

        e_ll = jnp.moveaxis(e_mat, 0, -1)          # (n_full, n_c, B)
        e0_ll = jnp.swapaxes(e0, 0, 1)             # (n_full, B)
        d_ll = jnp.swapaxes(
            jnp.diagonal(data.P, axis1=-2, axis2=-1), 0, 1
        )                                          # (n_full, B); P diagonal
        c_ll = jnp.swapaxes(data.c, 0, 1)          # (n_full, B)

        pe = e_ll * d_ll[:, None, :]
        p_ll = jnp.sum(pe[:, :, None, :] * e_ll[:, None, :, :], axis=0)
        p_ll = 0.5 * (p_ll + jnp.swapaxes(p_ll, 0, 1))
        cc_ll = jnp.sum(e_ll * (c_ll + d_ll * e0_ll)[:, None, :], axis=0)
        g_ll = jnp.einsum("mn,nkb->mkb", g_full, e_ll)
        h_ll = h_full[:, None] - jnp.einsum("mn,nb->mb", g_full, e0_ll)

        def _contract_ll(x_b):
            return jnp.swapaxes(
                jax.vmap(lambda xx, cc: contract(cfg, xx, cc))(x_b, ci_eff),
                0, 1,
            )

        def _expand_ll_full(x_ll):
            """Full-space solution, still lanes-last: (n_full, B)."""
            return e0_ll + jnp.sum(e_ll * x_ll[None, :, :], axis=1)

        x0_ll = None if x0_warm is None else _contract_ll(x0_warm)
        x_ll, _, _, stat1 = qp_fused.solve_lanes_last(
            p_ll, cc_ll, g_ll, h_ll, qp_cfg, tile=tile,
            interpret=interpret, x0=x0_ll,
        )
        qp_converged = stat1[2] > 0.5
        qp_iters = stat1[3].max().astype(jnp.int32)
        xf_ll = _expand_ll_full(x_ll)
        x = jnp.swapaxes(xf_ll, 0, 1)
    else:
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
        qp_converged = qp_sol.converged
        qp_iters = qp_sol.iters
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

    if cfg.use_sqp and use_ll:
        # Lanes-last SCP: rows are built per-lane (vmapped _cbf_rows, same
        # as the generic path), then projected onto the condensed space in
        # lanes-last via one multiply-reduce per iteration. (A "structural"
        # variant exploiting the 3-nonzero CBF rows measured ~20% SLOWER
        # at B=131072 — XLA fuses the dense reduce better than the
        # many-small-ops build.)
        vel_g, vel_h = sqp._vel_rows(cfg, dtype)
        for _ in range(cfg.sqp_iters):
            cbf = jax.vmap(
                lambda xx, cc, mm: sqp._cbf_rows(cfg, xx, cc, mm, dtype)
            )(x, circles, mask)
            new_g = jnp.concatenate(
                [jnp.broadcast_to(vel_g, (bsz,) + vel_g.shape), cbf[0]],
                axis=1,
            )
            new_h = jnp.concatenate(
                [jnp.broadcast_to(vel_h, (bsz,) + vel_h.shape), cbf[1]],
                axis=1,
            )
            ng_ll = jnp.moveaxis(new_g, 0, -1)         # (rows, n_full, B)
            nh_ll = jnp.swapaxes(new_h, 0, 1)
            png = jnp.sum(
                ng_ll[:, :, None, :] * e_ll[None, :, :, :], axis=1
            )
            pnh = nh_ll - jnp.sum(ng_ll * e0_ll[None, :, :], axis=1)
            g_s = jnp.concatenate([g_ll, png], axis=0)
            h_s = jnp.concatenate([h_ll, pnh], axis=0)
            x_ll2, _, _, _ = qp_fused.solve_lanes_last(
                p_ll, cc_ll, g_s, h_s, qp_cfg, tile=tile,
                interpret=interpret, x0=_contract_ll(x),
            )
            xf_new = _expand_ll_full(x_ll2)
            ok = jnp.isfinite(xf_new).all(0)[None, :]
            xf_ll = jnp.where(ok, xf_new, xf_ll)
            x = jnp.swapaxes(xf_ll, 0, 1)
    elif cfg.use_sqp:
        vel_g, vel_h = sqp._vel_rows(cfg, dtype)
        for _ in range(cfg.sqp_iters):
            cbf = jax.vmap(
                lambda xx, cc, mm: sqp._cbf_rows(cfg, xx, cc, mm, dtype)
            )(x, circles, mask)
            new_g = jnp.concatenate(
                [jnp.broadcast_to(vel_g, (bsz,) + vel_g.shape), cbf[0]],
                axis=1,
            )
            new_h = jnp.concatenate(
                [jnp.broadcast_to(vel_h, (bsz,) + vel_h.shape), cbf[1]],
                axis=1,
            )
            if condensed:
                # data.G's projection was already computed in condense()
                # (data_s.G/h) — only the fresh vel+CBF rows need the
                # full-space -> condensed row projection (bitwise the same
                # result as projecting the whole stacked block)
                ng_s, nh_s = jax.vmap(condense_rows)(new_g, new_h, e_mat, e0)
                g_s = jnp.concatenate([data_s.G, ng_s], axis=1)
                h_s = jnp.concatenate([data_s.h, nh_s], axis=1)
                x0_s = jax.vmap(lambda xx, cc: contract(cfg, xx, cc))(
                    x, ci_eff)
                sol = qp_batch.solve(
                    data_s.P, data_s.c, data_s.A, data_s.b, g_s, h_s, qp_cfg,
                    backend=backend, tile=tile, interpret=interpret, x0=x0_s,
                )
                x_new = jax.vmap(expand)(e_mat, e0, sol.x)
            else:
                g_s = jnp.concatenate([data.G, new_g], axis=1)
                h_s = jnp.concatenate([data.h, new_h], axis=1)
                sol = qp_batch.solve(
                    data_s.P, data_s.c, data_s.A, data_s.b, g_s, h_s, qp_cfg,
                    backend=backend, tile=tile, interpret=interpret, x0=x,
                )
                x_new = sol.x
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
        alpha_com, states, inputs, new_carry, qp_converged, qp_iters,
        margin, x,
    )
