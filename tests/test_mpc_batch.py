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
    outb = mpc_batch.run_nmpc_batch(cfg, qcfg, *args, backend=backend)
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
    out_x = mpc_batch.run_nmpc_batch(cfg, qcfg, *args, backend="xla")
    out_p = mpc_batch.run_nmpc_batch(
        cfg, qcfg, *args, backend="pallas", tile=4, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out_p.states), np.asarray(out_x.states), atol=1e-6
    )
