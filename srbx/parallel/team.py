"""Device-mesh parallelism for multi-agent CBF-NMPC.

Maps the reference's two parallelism axes (SURVEY.md §2.3) onto a JAX mesh:

  * scenario axis  -> data parallel over mesh axis 'scen' (DCN/ICI);
  * agent axis     -> sharded over mesh axis 'agent'; the neighbor 4-state
    broadcast that the reference does through a mutex-guarded shared store
    (`include/shared_structs.hpp:19-44,298-318`) or UDP/LCM becomes a ring
    `ppermute` across ICI.

Everything below is shard_map-based so the collective layout is explicit;
the same functions run on a virtual CPU mesh (tests, dry-runs) and on real
TPU slices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from srbx import mpc
from srbx.config import MpcConfig, QpConfig
from srbx.ocp import default_footholds


def make_mesh(n_devices: int | None = None, n_agent_shards: int = 2) -> Mesh:
    """Mesh over (scen, agent). agent shards divide the team; remaining
    devices shard scenarios."""
    devs = jax.devices()[:n_devices] if n_devices else jax.devices()
    n = len(devs)
    if n % n_agent_shards != 0:
        n_agent_shards = 1
    shape = (n // n_agent_shards, n_agent_shards)
    return Mesh(np.asarray(devs).reshape(shape), ("scen", "agent"))


def ring_roll(x, axis_name: str):
    """Global roll by -1 of a ring-distributed leading axis.

    x: (L, ...) local block of an array sharded along `axis_name`. Element 0
    of each shard is sent to the previous device; result is the globally
    rolled array's local block. Single-shard meshes reduce to jnp.roll.
    """
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        return jnp.roll(x, shift=-1, axis=0)
    first = x[:1]
    perm = [(i, (i - 1) % n) for i in range(n)]
    recv = jax.lax.ppermute(first, axis_name, perm=perm)
    return jnp.concatenate([x[1:], recv], axis=0)


def team_cycle_fn(cfg: MpcConfig, qp_cfg: QpConfig, mesh: Mesh, n_agents: int):
    """Build the sharded one-domain team step.

    Returns f(carry_domain, carry_alpha, q, dq, ci, pr, prd, agent0, pobs)
    -> (new_domain, new_alpha, q', dq', states) where leading axes are
    (scenarios, agents) sharded over ('scen', 'agent').
    """

    def local_step(dom, alpha, q, dq, ci, pr, prd, agent0, pobs):
        # shapes inside shard_map: (S_loc, A_loc, ...)
        other = jnp.concatenate([q, dq], axis=-1)          # (S, A, 4)
        other = jax.vmap(lambda o: ring_roll(o, "agent"))(other)

        def agent_one(dom_a, alpha_a, q_a, dq_a, ci_a, oth, pr_a, prd_a, a0, pobs_s):
            carry = mpc.MpcCarry(dom_a, alpha_a)
            out = mpc.run_nmpc(
                cfg, qp_cfg, carry, q_a, dq_a, default_footholds(q_a), ci_a,
                pr_a, prd_a, a0, pobs_s, state_other=oth,
                agent_circle_eps=cfg.cbf_eps,
            )
            return (
                out.carry.gait_domain,
                out.carry.alpha_buffer,
                out.states[-1, jnp.asarray([0, 2])],
                out.states[-1, jnp.asarray([1, 3])],
                out.states,
            )

        inner = jax.vmap(  # agents
            agent_one, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, None)
        )
        outer = jax.vmap(  # scenarios
            inner, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
        )
        return outer(dom, alpha, q, dq, ci, other, pr, prd, agent0, pobs)

    spec_sa = P("scen", "agent")
    spec_s = P("scen")
    return jax.jit(
        jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(spec_sa, spec_sa, spec_sa, spec_sa, spec_sa, spec_sa,
                      spec_sa, spec_sa, spec_s),
            out_specs=(spec_sa, spec_sa, spec_sa, spec_sa, spec_sa),
            check_vma=False,
        )
    )


def team_cycle_batch_fn(cfg: MpcConfig, qp_cfg: QpConfig, mesh: Mesh,
                        n_agents: int, backend: str = "fused",
                        tile: int = 256):
    """team_cycle_fn with each shard's (S_loc x A_loc) lanes flattened into
    ONE batch-native NMPC solve (srbx.mpc_batch) — the fused-kernel
    production shape per device; the ring `ppermute` neighbor exchange is
    unchanged. Same signature and outputs as team_cycle_fn."""
    from srbx import mpc_batch

    def local_step(dom, alpha, q, dq, ci, pr, prd, agent0, pobs):
        s_loc, a_loc = q.shape[0:2]
        n_lanes = s_loc * a_loc
        other = jnp.concatenate([q, dq], axis=-1)
        other = jax.vmap(lambda o: ring_roll(o, "agent"))(other)

        def flat(x):
            return x.reshape((n_lanes,) + x.shape[2:])

        out = mpc_batch.run_nmpc_batch(
            cfg, qp_cfg, mpc.MpcCarry(flat(dom), flat(alpha)),
            flat(q), flat(dq),
            jax.vmap(default_footholds)(flat(q)), flat(ci),
            flat(pr), flat(prd), flat(agent0),
            jnp.repeat(pobs, a_loc, axis=0),
            backend=backend, tile=tile,
            state_other=flat(other), agent_circle_eps=cfg.cbf_eps,
        )

        def unflat(x):
            return x.reshape((s_loc, a_loc) + x.shape[1:])

        return (
            unflat(out.carry.gait_domain),
            unflat(out.carry.alpha_buffer),
            unflat(out.states[:, -1, jnp.asarray([0, 2])]),
            unflat(out.states[:, -1, jnp.asarray([1, 3])]),
            unflat(out.states),
        )

    spec_sa = P("scen", "agent")
    spec_s = P("scen")
    return jax.jit(
        jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(spec_sa, spec_sa, spec_sa, spec_sa, spec_sa, spec_sa,
                      spec_sa, spec_sa, spec_s),
            out_specs=(spec_sa, spec_sa, spec_sa, spec_sa, spec_sa),
            check_vma=False,
        )
    )


@functools.lru_cache(maxsize=None)
def _noop():  # pragma: no cover
    return None
