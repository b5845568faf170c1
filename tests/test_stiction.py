"""Stick-slip tangential contact (VERDICT r3 #5).

The round-1..3 plant's tangential force was viscous-only (-kt v clamped to
the friction cone): a statically loaded stance foot creeps at v = F/kt.
RaiSim — the platform the plant replaces (`src/A1_Sim.cpp:1214`) — enforces
stick-slip. The anchor-point model (wb.ContactState) adds true stiction;
these tests pin down (a) creep eliminated under sustained lateral load,
(b) kinetic slip + re-anchoring semantics, (c) trot behavior unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np

from srbx.models import a1, rbd
from srbx.sim import wholebody as wb

M = a1.model()
SIM = wb.SimConfig()


def _hold_crouch_tau(q, qd, q0):
    """Joint PD holding the crouch posture (no controller in the loop).
    kp=100 is the explicit-PD stability limit region at the 1 ms torque
    hold (kp=300 diverges by tick ~55)."""
    return -100.0 * (q[6:] - q0[6:]) - 5.0 * qd[6:]


def _settle(sim, n=500):
    def tick(s, _):
        tau = _hold_crouch_tau(s.q, s.qd, sim.q)
        return wb.step(SIM, M, s, tau), None
    out, _ = jax.lax.scan(tick, sim, None, length=n)
    return out


def test_static_lateral_push_creep_eliminated():
    """25 N sustained lateral base force on a standing robot (measured,
    2 s): the viscous model creeps 24.6 mm and is STILL moving (~12 mm/s);
    the anchor model deflects 3.6 mm elastically and comes to rest with
    zero recorded slip (cone unsaturated)."""
    q0 = wb.default_crouch(M)
    base_f = jnp.asarray([0.0, 25.0, 0.0])

    def drift(with_stiction):
        sim = wb.SimState(q0, jnp.zeros((18,)))
        sim = _settle(sim)
        if with_stiction:
            sim = sim._replace(con=wb.init_contact_state(M, sim.q))
        y_start = sim.q[1]

        def tick(s, _):
            tau = _hold_crouch_tau(s.q, s.qd, q0)
            return wb.step(SIM, M, s, tau, base_force=base_f), None

        sim, _ = jax.lax.scan(tick, sim, None, length=2000)
        return float(sim.q[1] - y_start), sim

    d_vis, sim_v = drift(False)
    d_stick, sim_s = drift(True)
    assert abs(d_vis) > 1e-2, d_vis            # creep (measured 24.6 mm)
    assert abs(d_stick) < 5e-3, d_stick        # elastic hold (3.6 mm)
    # and at rest vs still creeping
    assert float(jnp.linalg.norm(sim_s.qd)) < 1e-3
    assert float(jnp.linalg.norm(sim_v.qd)) > 5e-3
    # cone never saturates -> no slip recorded
    assert float(jnp.max(sim_s.con.slip)) < 1e-3


def test_kinetic_slip_and_reanchor():
    """Force above the cone drags the anchor (slip accumulates); breaking
    contact re-anchors at the toe."""
    q0 = wb.default_crouch(M)
    sim = _settle(wb.SimState(q0, jnp.zeros((18,))))
    sim = sim._replace(con=wb.init_contact_state(M, sim.q))

    # total weight ~ 13.7 kg * g ~ 134 N; mu=0.6 -> cone ~80 N total.
    big = jnp.asarray([120.0, 0.0, 0.0])

    def tick(s, _):
        tau = _hold_crouch_tau(s.q, s.qd, q0)
        return wb.step(SIM, M, s, tau, base_force=big), None

    slid, _ = jax.lax.scan(tick, sim, None, length=1000)
    # the robot slides: slip metric records centimetres of drag
    assert float(jnp.max(slid.con.slip)) > 1e-2
    assert float(slid.q[0] - sim.q[0]) > 1e-2

    # re-anchoring: lift the base so all toes leave the ground — every
    # anchor snaps to its toe xy on the first step
    q_air = slid.q.at[2].add(0.05)
    s_air = wb.SimState(q_air, jnp.zeros((18,)), slid.con)
    s2 = wb.step(SIM, M, s_air, jnp.zeros((12,)))
    toe_xy = rbd.site_positions(M, s2.q)[a1.TOE_SITES][:, 0:2]
    np.testing.assert_allclose(np.asarray(s2.con.anchor),
                               np.asarray(toe_xy), atol=5e-3)


def test_step_batch_threads_contact_state():
    """step_batch (xla path) with anchors == vmap(step) bitwise."""
    q0 = wb.default_crouch(M)
    s0 = wb.SimState(q0, jnp.zeros((18,)), wb.init_contact_state(M, q0))
    B = 3
    sb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), s0)
    tau = jnp.zeros((B, 12))
    out = wb.step_batch(SIM, M, sb, tau, backend="xla")
    ref = jax.vmap(lambda s, t: wb.step(SIM, M, s, t))(sb, tau)
    for a, b in zip(jax.tree.leaves(out), jax.tree.leaves(ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trot_trajectory_unchanged():
    """Closed-loop trot with stiction on vs off: same gait, COM within
    tolerance, bounded stance slip. Trot stance phases are short and the
    feet are placed (not dragged), so the models should agree closely."""
    from srbx import refplan
    from srbx.config import (LowLevelConfig, MotionConfig, MpcConfig,
                             QpConfig)
    from srbx.eval import campaign
    from srbx.sim import closedloop

    pobs = campaign.sample_obstacles(jax.random.PRNGKey(5), 1, 4)[1][0]
    ref = refplan.generate(refplan.two_agent_config(loop_size=8000),
                           jnp.asarray([0.0, 0.5, 0.0, -0.5]), pobs)
    loop = closedloop.LoopConfig(stand_ticks=300, n_domains=2,
                                 ticks_per_domain=172)
    cfg = MpcConfig(use_sqp=False)

    def one(stiction):
        return closedloop.run(
            cfg, LowLevelConfig(), MotionConfig(), QpConfig(),
            wb.SimConfig(), loop, a1.model(), ref.pr[0:2], ref.prd[0:2],
            jnp.asarray([0.0, 0.5]), pobs, stiction=stiction)

    res_v = one(False)
    res_s = one(True)
    assert float(res_s.qp_ok) == 1.0
    com_d = np.abs(np.asarray(res_s.com_hist) - np.asarray(res_v.com_hist))
    # same closed-loop trot to sub-cm over 2 domains
    assert com_d.max() < 2e-2, com_d.max()
    # slip metric: bounded (trot barely slides)
    assert float(jnp.max(res_s.sim.con.slip)) < 0.2
