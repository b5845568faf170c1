"""Hardware-style host deployment demo — the `driver_scripts/qp_only_exp.cpp`
shape: a CPU-pinned 1 kHz low-level loop and a 20 ms high-level NMPC loop
communicating through the native seqlock shared store, each running the SAME
jitted srbx functions the batched sim uses.

    python examples/run_host.py [seconds]

The plant here is the LIP template itself (no robot attached): the LL loop
integrates the template state under the HL plan's Bezier evaluation — the
host-side deployment topology (threads, store, rates) is the point, mirroring
`ExternalComm::HighLevel`/`Calc` (`driver_scripts/qp_only_exp.cpp:156-370`,
loop wiring `:665-668`).
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from srbx import mpc, refplan, runtime
from srbx.config import MpcConfig, QpConfig
from srbx.ocp import default_footholds

STATE_SLOT, PLAN_SLOT = 0, 1


def main(seconds: float = 2.0):
    dtype = jnp.float32
    cfg = MpcConfig(use_sqp=True, sqp_iters=1)
    qp_cfg = QpConfig(abstol=2e-3, reltol=1e-4, reg_primal=1e-6,
                      reg_dual=1e-6, max_iters=12)

    p_start = jnp.asarray([0.0, 0.0], dtype)
    pobs = jnp.asarray([[6.0] + [100.0] * 19, [0.5] + [100.0] * 19], dtype)
    ref = refplan.generate(
        refplan.two_agent_config(loop_size=8_000),
        jnp.asarray([0.0, 0.0, 0.0, -1.0], dtype), pobs, dtype=dtype)
    pr, prd = ref.pr[0:2], ref.prd[0:2]

    contacts = jnp.asarray([[0, 1, 1, 0], [1, 0, 0, 1]], dtype)

    @jax.jit
    def hl_cycle(domain, alpha_buf, q, dq):
        carry = mpc.MpcCarry(domain, alpha_buf)
        out = mpc.run_nmpc(
            cfg, qp_cfg, carry, q, dq, default_footholds(q),
            contacts[domain % 2], pr, prd, p_start, pobs,
        )
        return out.alpha_com, out.states[-1]

    @jax.jit
    def ll_step(alpha, s):
        com, dcom, _ = mpc.eval_com_traj(alpha, jnp.minimum(s, 1.05))
        return com, dcom

    # warm up compiles off the loops
    a0, buf0 = hl_cycle(jnp.asarray(0), jnp.asarray([0., 0., 0., 0.], dtype),
                        p_start, jnp.zeros(2, dtype))
    jax.block_until_ready(ll_step(a0, jnp.asarray(0.5, dtype)))

    lib = runtime.load()
    store = runtime.SharedStore(lib, n_slots=2, slot_bytes=256)
    store.write(STATE_SLOT, np.zeros(4, np.float32).tobytes())
    store.write(PLAN_SLOT, np.asarray(a0, np.float32).tobytes())

    hl_n = [0]
    ll_n = [0]
    domain = [0]
    alpha_buf = [np.asarray(buf0, np.float32)]

    def hl_cb(_):
        st = np.frombuffer(store.read(STATE_SLOT), np.float32, 4)
        alpha, buf = hl_cycle(
            jnp.asarray(domain[0]), jnp.asarray(alpha_buf[0]),
            jnp.asarray(st[0:2]), jnp.asarray(st[2:4]))
        store.write(PLAN_SLOT, np.asarray(alpha, np.float32).tobytes())
        alpha_buf[0] = np.asarray(buf)
        domain[0] += 1
        hl_n[0] += 1

    def ll_cb(tick):
        alpha = np.frombuffer(store.read(PLAN_SLOT), np.float32, 20).reshape(4, 5)
        s = (tick % 172) / 172.0
        com, dcom = ll_step(jnp.asarray(alpha), jnp.asarray(s, jnp.float32))
        st = np.concatenate([np.asarray(com), np.asarray(dcom)]).astype(np.float32)
        store.write(STATE_SLOT, st.tobytes())
        ll_n[0] += 1

    # The reference's HL thread wakes every 20 ms but only replans when the
    # event fires (~each 172 ms gait domain); here the HL loop runs at the
    # event cadence directly.
    ll = runtime.RateLoop(lib, period_us=1_000, callback=ll_cb, cpu=0)
    hl = runtime.RateLoop(lib, period_us=172_000, callback=hl_cb, cpu=1)
    ll.start()
    hl.start()
    time.sleep(seconds)
    hl.stop()
    ll.stop()

    st = np.frombuffer(store.read(STATE_SLOT), np.float32, 4)
    print(f"ran {seconds}s: HL cycles {hl_n[0]} (target {seconds/0.172:.0f}), "
          f"LL ticks {ll_n[0]} (target {seconds/0.001:.0f})")
    print(f"HL p50 callback latency {hl.latency_ns()/1e3:.0f} us, "
          f"LL p50 {ll.latency_ns()/1e3:.0f} us; "
          f"overruns HL {hl.overruns} LL {ll.overruns}")
    print(f"final template COM {st[0:2]} (forward progress {st[0]:.3f} m)")
    hl.close()
    ll.close()
    store.close()


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 2.0)
