import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srbx import mpc, mpc_batch, refplan
from srbx.config import MpcConfig, QpConfig
from srbx.ocp import default_footholds


def _args(B=6, dtype=jnp.float64):
    traj = refplan.generate(
        refplan.two_agent_config(loop_size=4000),
        jnp.asarray([0.0, 0.0, 0.0, -1.0], dtype),
        jnp.asarray([[5.0] + [100.0] * 19, [0.5] + [100.0] * 19], dtype),
        dtype=dtype,
    )
    agent0 = jnp.zeros(2, dtype)
    qs = jnp.tile(agent0, (B, 1)) + jnp.linspace(0, 0.02, B, dtype=dtype)[:, None]
    dqs = jnp.zeros((B, 2), dtype)
    toes = jnp.tile(default_footholds(agent0), (B, 1, 1))
    cis = jnp.tile(jnp.asarray([0.0, 1.0, 1.0, 0.0], dtype), (B, 1))
    doms = jnp.full((B,), 3, jnp.int32)
    alphas = jnp.concatenate(
        [qs[:, 0:1], jnp.zeros((B, 1), dtype), qs[:, 1:2], jnp.zeros((B, 1), dtype)],
        axis=1,
    )
    carry = mpc.MpcCarry(doms, alphas)
    pr = jnp.tile(traj.pr[0:2], (B, 1, 1))
    prd = jnp.tile(traj.prd[0:2], (B, 1, 1))
    a0s = jnp.tile(agent0, (B, 1))
    pobs = jnp.tile(
        jnp.asarray([[5.0] + [100.0] * 19, [0.5] + [100.0] * 19], dtype), (B, 1, 1)
    )
    return (carry, qs, dqs, toes, cis, pr, prd, a0s, pobs)


@pytest.mark.parametrize("backend", ["xla", "lanes"])
def test_batch_cycle_matches_vmap(backend):
    cfg = MpcConfig(use_sqp=True, sqp_iters=2)
    qcfg = QpConfig()
    args = _args()
    outb = mpc_batch.run_nmpc_batch(cfg, qcfg, *args, backend=backend,
                                    condensed=False)
    carry = args[0]
    for i in [0, 3, 5]:
        c = mpc.MpcCarry(carry.gait_domain[i], carry.alpha_buffer[i])
        o = mpc.run_nmpc(cfg, qcfg, c, *[a[i] for a in args[1:]])
        np.testing.assert_allclose(
            np.asarray(outb.states[i]), np.asarray(o.states), atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(outb.alpha_com[i]), np.asarray(o.alpha_com), atol=1e-9
        )


def test_batch_cycle_pallas_interpret():
    """Pallas backend (interpret mode on CPU) agrees with the xla backend."""
    cfg = MpcConfig(use_sqp=True, sqp_iters=1)
    qcfg = QpConfig()
    args = _args(B=4)
    out_x = mpc_batch.run_nmpc_batch(cfg, qcfg, *args, backend="xla",
                                     condensed=False)
    out_p = mpc_batch.run_nmpc_batch(
        cfg, qcfg, *args, backend="pallas", tile=4, interpret=True,
        condensed=False,
    )
    np.testing.assert_allclose(
        np.asarray(out_p.states), np.asarray(out_x.states), atol=1e-6
    )


def test_condensed_expansion_satisfies_eliminated_equalities():
    from srbx import ocp

    cfg = MpcConfig()
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=4) * 0.2)
    foot = default_footholds(jnp.asarray([0.3, -0.1]))
    ci = jnp.asarray([1.0, 0.0, 0.0, 1.0])
    t = np.arange(4)
    ref = jnp.asarray(
        np.stack([0.05 + 0.02 * t, 0.4 * np.ones(4), -0.01 * np.ones(4), np.zeros(4)])
    )
    data = ocp.assemble(cfg, x0, ref, foot, ci)
    e_mat, e0 = ocp.expansion(cfg, x0, foot, ci)
    nN = cfg.n_state * cfg.horizon
    mN = cfg.n_input * cfg.horizon
    for seed in range(3):
        v = jnp.asarray(np.random.default_rng(seed).normal(size=e_mat.shape[1]))
        xf = ocp.expand(e_mat, e0, v)
        res = data.A[: nN + mN] @ xf - data.b[: nN + mN]
        assert float(jnp.abs(res).max()) < 1e-12
    # contract is a left inverse of expand on the (lambda, slack) slots
    v2 = ocp.contract(cfg, ocp.expand(e_mat, e0, v))
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-14)


def test_condensed_qp_matches_full():
    from srbx import ocp
    from srbx.ops import qp

    cfg = MpcConfig()
    x0 = jnp.asarray([0.02, 0.1, -0.01, 0.0])
    t = np.arange(4)
    ref = jnp.asarray(
        np.stack([0.05 + 0.02 * t, 0.4 * np.ones(4), -0.01 * np.ones(4), np.zeros(4)])
    )
    for ci_v in ([1.0, 1.0, 1.0, 1.0], [0.0, 1.0, 1.0, 0.0]):
        ci = jnp.asarray(ci_v)
        foot = default_footholds(jnp.asarray([0.0, 0.0]))
        data = ocp.assemble(cfg, x0, ref, foot, ci)
        e_mat, e0 = ocp.expansion(cfg, x0, foot, ci)
        data_c = ocp.condense(cfg, data, e_mat, e0)
        full = qp.solve(*data, QpConfig())
        cond = qp.solve(*data_c, QpConfig())
        assert bool(full.converged) and bool(cond.converged)
        x_exp = ocp.expand(e_mat, e0, cond.x)
        # states/inputs agree to solver tolerance; padded (absent-leg) lambda
        # slots are cost-pinned, not constrained, so compare the trajectory.
        np.testing.assert_allclose(
            np.asarray(x_exp[:24]), np.asarray(full.x[:24]), atol=5e-6
        )


def test_batch_cycle_condensed_matches_full():
    cfg = MpcConfig(use_sqp=True, sqp_iters=2)
    qcfg = QpConfig()
    args = _args()
    out_f = mpc_batch.run_nmpc_batch(cfg, qcfg, *args, backend="xla",
                                     condensed=False)
    out_c = mpc_batch.run_nmpc_batch(cfg, qcfg, *args, backend="xla",
                                     condensed=True)
    np.testing.assert_allclose(
        np.asarray(out_c.states), np.asarray(out_f.states), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_c.alpha_com), np.asarray(out_f.alpha_com), atol=1e-4
    )


def test_elide_box_rows_equivalent():
    """Dropping the +-1e3 big-M state/input box rows cannot change the
    solution at operating scale (states O(10) << 1e3) — full vs elided
    cycles agree to solver tolerance in both formulations."""
    import dataclasses

    from srbx.ocp import assemble, default_footholds

    B = 8
    qp_cfg = QpConfig()
    dom = jnp.zeros((B,), jnp.int32)
    q = jnp.tile(jnp.asarray([0.0, 0.5]), (B, 1))
    dq = jnp.zeros((B, 2))
    alpha = jnp.stack([q[:, 0], jnp.zeros(B), q[:, 1], jnp.zeros(B)], 1)
    ci = jnp.tile(jnp.asarray([0.0, 1.0, 1.0, 0.0]), (B, 1))
    ref_cfg = refplan.two_agent_config(loop_size=2_000)
    p_start = jnp.asarray([0.0, 0.5, 0.0, -0.5])
    pobs = jnp.asarray([[5.0] * 20, [50.0] * 20])
    ref = refplan.generate(ref_cfg, p_start, pobs)
    pr = jnp.tile(ref.pr[0:2], (B, 1, 1))
    prd = jnp.tile(ref.prd[0:2], (B, 1, 1))
    a0s = jnp.tile(p_start[:2], (B, 1))
    pobs_b = jnp.tile(pobs, (B, 1, 1))
    toes = jnp.tile(default_footholds(p_start[:2]), (B, 1, 1))

    outs = {}
    for elide in (False, True):
        cfg = MpcConfig(use_sqp=True, sqp_iters=2, elide_box_rows=elide)
        outs[elide] = mpc_batch.run_nmpc_batch(
            cfg, qp_cfg, mpc.MpcCarry(dom, alpha), q, dq, toes, ci,
            pr, prd, a0s, pobs_b, backend="xla", condensed=True,
        ).states
    np.testing.assert_allclose(
        np.asarray(outs[True]), np.asarray(outs[False]), atol=1e-4
    )
