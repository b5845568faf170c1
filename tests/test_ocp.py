import jax.numpy as jnp
import numpy as np
import pytest

from srbx import ocp
from srbx.config import MpcConfig, QpConfig
from srbx.models import lip
from srbx.ocp import assemble, default_footholds, reference_window, unpack
from srbx.ops import qp

CFG = MpcConfig()
QCFG = QpConfig()


def _compact_reference_qp(x0, ref_traj, foothold_xy, contact_ind):
    """Independent numpy transcription of the reference QP structure
    (`src/MPC_dist.cpp:138-321`) with COMPACT lambda columns
    (ndomain * contacts), for cross-checking the padded assembly."""
    n, m, N, nd = 4, 2, 4, 4
    g_, h_ = 9.81, 0.29
    ts = 0.043
    a = np.zeros((4, 4)); a[0, 1] = 1; a[1, 0] = g_ / h_; a[2, 3] = 1; a[3, 2] = g_ / h_
    b = np.zeros((4, 2)); b[1, 0] = -g_ / h_; b[3, 1] = -g_ / h_
    ad = np.eye(4) + a * ts + 0.5 * a @ a * ts**2 + a @ a @ a * ts**3 / 6
    bd = np.linalg.inv(a) @ (ad - np.eye(4)) @ b

    contacts = int(sum(contact_ind))
    nlam = nd * contacts
    ndec = n * N + m * N + nlam + 1
    nN, mN = n * N, m * N

    q = np.zeros((ndec, ndec))
    for i in range(N):
        w = 2e3 if i == N - 1 else 3e2
        q[n * i : n * (i + 1), n * i : n * (i + 1)] = w * np.eye(n)
    for i in range(N):
        q[nN + m * i : nN + m * (i + 1), nN + m * i : nN + m * (i + 1)] = 1e-1 * np.eye(m)
    q[-1, -1] = 0.3e4

    ref_vec = np.asarray(ref_traj).T.reshape(-1)
    f = np.zeros(ndec)
    pbig = q[:nN, :nN]
    f[:nN] = -(pbig @ ref_vec)

    aeq = np.zeros((nN + mN + mN // 2, ndec))
    beq = np.zeros(nN + mN + mN // 2)
    abig = np.zeros((nN, nN))
    bbig = np.zeros((nN, mN))
    for i in range(N - 1):
        abig[(i + 1) * n : (i + 2) * n, i * n : (i + 1) * n] = ad
        bbig[i * n : (i + 1) * n, i * m : (i + 1) * m] = bd
    bbig[(N - 1) * n :, (N - 1) * m :] = bd
    aeq[:nN, :nN] = abig - np.eye(nN)
    aeq[:nN, nN : nN + mN] = bbig
    beq[:n] = -(ad @ np.asarray(x0))

    # footprint matrix, compact columns in leg order of present legs
    present = [i for i in range(4) if contact_ind[i]]
    fp = np.asarray(foothold_xy)[:, present]  # (2, contacts)
    fpg = np.zeros((mN, nlam))
    ones = np.zeros((mN, nlam))
    for k in range(nd):
        fpg[2 * k : 2 * k + 2, contacts * k : contacts * (k + 1)] = fp
        ones[2 * k : 2 * k + 2, contacts * k : contacts * (k + 1)] = 1.0
    aeq[nN : nN + mN, nN : nN + mN] = np.eye(mN)
    aeq[nN : nN + mN, nN + mN : nN + mN + nlam] = -fpg
    for k in range(nd):
        aeq[nN + mN + k, nN + mN : nN + mN + nlam] = ones[2 * k]
        beq[nN + mN + k] = 1.0

    mi = 2 * m * (N - 1) + 2 * nN + 2 * mN + 2 * nlam
    gin = np.zeros((mi, ndec))
    hin = np.ones(mi)
    xsel = np.array([[1.0, 0, 0, 0], [0, 0, 1.0, 0]])
    gsx = np.zeros((m * (N - 1), nN))
    gsu = np.zeros((m * (N - 1), mN))
    for i in range(N - 1):
        gsx[i * m : (i + 1) * m, i * n : (i + 1) * n] = xsel
        gsu[i * m : (i + 1) * m, (i + 1) * m : (i + 2) * m] = np.eye(m)
    gin[: m * (N - 1), :nN] = gsx
    gin[: m * (N - 1), nN : nN + mN] = -gsu
    gin[m * (N - 1) : 2 * m * (N - 1), :nN] = -gsx
    gin[m * (N - 1) : 2 * m * (N - 1), nN : nN + mN] = gsu
    hin[: 2 * m * (N - 1)] = 0.7 * h_ / np.sqrt(2)
    r = 2 * m * (N - 1)
    gin[r : r + nN, :nN] = np.eye(nN)
    gin[r + nN : r + 2 * nN, :nN] = -np.eye(nN)
    gin[r + 2 * nN : r + 2 * nN + mN, nN : nN + mN] = np.eye(mN)
    gin[r + 2 * nN + mN : r + 2 * nN + 2 * mN, nN : nN + mN] = -np.eye(mN)
    hin[r : r + 2 * nN + 2 * mN] = 1e3
    r2 = r + 2 * nN + 2 * mN
    gin[r2 : r2 + nlam, nN + mN : nN + mN + nlam] = -np.eye(nlam)
    hin[r2 : r2 + nlam] = 0.0
    gin[r2 + nlam :, nN + mN : nN + mN + nlam] = np.eye(nlam)
    hin[r2 + nlam :] = 1.0
    return map(jnp.asarray, (q, f, aeq, beq, gin, hin))


def _scenario(contact_ind):
    x0 = jnp.asarray([0.02, 0.05, -0.01, 0.0])
    # gently advancing reference
    t = np.arange(4)
    ref = jnp.asarray(
        np.stack([0.05 + 0.02 * t, 0.4 * np.ones(4), -0.01 * np.ones(4), np.zeros(4)])
    )
    foot = default_footholds(jnp.asarray([0.0, 0.0]))
    return x0, ref, foot, jnp.asarray(contact_ind)


@pytest.mark.parametrize("contact_ind", [(1, 1, 1, 1), (1, 0, 0, 1), (0, 1, 1, 0)])
def test_padded_matches_compact_reference(contact_ind):
    x0, ref, foot, ci = _scenario(contact_ind)
    data = assemble(CFG, x0, ref, foot, ci)
    sol = qp.solve(*data, QCFG)
    assert bool(sol.converged)

    compact = _compact_reference_qp(x0, ref, foot, contact_ind)
    sol_c = qp.solve(*compact, QCFG)
    assert bool(sol_c.converged)

    xs, us, lam, slack = unpack(CFG, sol.x)
    nN, mN = 16, 8
    xs_c = np.asarray(sol_c.x)[:nN].reshape(4, 4)
    us_c = np.asarray(sol_c.x)[nN : nN + mN].reshape(4, 2)
    np.testing.assert_allclose(np.asarray(xs), xs_c, atol=2e-4)
    np.testing.assert_allclose(np.asarray(us), us_c, atol=2e-4)


def test_solution_satisfies_dynamics_and_cop():
    x0, ref, foot, ci = _scenario((1, 1, 1, 1))
    data = assemble(CFG, x0, ref, foot, ci)
    sol = qp.solve(*data, QCFG)
    xs, us, lam, slack = unpack(CFG, sol.x)

    # dynamics: x_k = Ad x_{k-1} + Bd u_k
    roll = lip.rollout(CFG.lip, x0, us)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(roll), atol=1e-5)

    # COP is a convex combination of footholds
    lam_g = np.asarray(lam).reshape(4, 4)
    np.testing.assert_allclose(lam_g.sum(axis=1), np.ones(4), atol=1e-5)
    assert lam_g.min() > -1e-6
    cop = lam_g @ np.asarray(foot).T
    np.testing.assert_allclose(np.asarray(us), cop, atol=1e-5)

    # COP-kinematics bound holds
    bound = CFG.mu * CFG.lip.h / np.sqrt(2)
    com_xy = np.asarray(xs)[:, [0, 2]]
    assert np.abs(com_xy[:3] - np.asarray(us)[1:]).max() <= bound + 1e-6


def test_absent_leg_lambda_pinned_to_zero():
    x0, ref, foot, ci = _scenario((1, 0, 0, 1))
    data = assemble(CFG, x0, ref, foot, ci)
    sol = qp.solve(*data, QCFG)
    _, _, lam, _ = unpack(CFG, sol.x)
    lam_g = np.asarray(lam).reshape(4, 4)
    np.testing.assert_allclose(lam_g[:, [1, 2]], 0.0, atol=1e-3)


def test_tracking_pulls_com_toward_reference():
    x0, ref, foot, ci = _scenario((1, 1, 1, 1))
    data = assemble(CFG, x0, ref, foot, ci)
    sol = qp.solve(*data, QCFG)
    xs, _, _, _ = unpack(CFG, sol.x)
    # terminal x position should move toward the reference's x (0.11)
    assert float(xs[-1, 0]) > float(x0[0])


def test_reference_window_slicing():
    pr = jnp.asarray(np.arange(2 * 2 * 40).reshape(4, 40), dtype=jnp.float64)
    prd = -pr
    win = reference_window(pr, prd, agent_id=1, gait_domain=3, horizon=4)
    np.testing.assert_allclose(np.asarray(win[0]), np.asarray(pr[2, 12:16]))
    np.testing.assert_allclose(np.asarray(win[1]), np.asarray(prd[2, 12:16]))
    np.testing.assert_allclose(np.asarray(win[2]), np.asarray(pr[3, 12:16]))
    np.testing.assert_allclose(np.asarray(win[3]), np.asarray(prd[3, 12:16]))


def test_gait_tables():
    from srbx import gait as gaitmod
    from srbx.config import Gait

    table = gaitmod.total_cycle_index(Gait.TROT, 700)
    assert table.shape == (4, 700)
    assert (table[:, 0] == 1).all()
    # interior trot columns always have exactly 2 feet down
    sums = table.sum(axis=0)
    assert set(sums[1:-1].tolist()) <= {2, 4}
    # diagonal pairs
    assert (table[0] == table[3]).all()
    assert (table[1] == table[2]).all()

    sched = gaitmod.contact_schedule(Gait.TROT, 700)
    assert sched.shape == (700, 4)


def test_planned_footprint_table_matches_naive_loop():
    """srbx.ocp.planned_footprint_table vs a literal transcription of the
    reference's totalFootprint construction (`src/MPC_dist.cpp:531-606`)."""
    from srbx import gait as gait_mod
    from srbx.config import Gait

    t_len = 100
    pr = jnp.stack(
        [jnp.linspace(0.0, 2.0, t_len), 0.1 * jnp.sin(jnp.linspace(0, 3, t_len))]
    )
    agent0 = jnp.asarray([0.3, -0.2])
    cycle = gait_mod.contact_schedule(Gait.TROT, 14)   # (M, 4)
    fps, mask = ocp.planned_footprint_table(pr, agent0, cycle)

    m_dom = cycle.shape[0]
    off = np.asarray(ocp.PLANNED_OFFSETS)
    pr_np = np.asarray(pr)
    a0 = np.asarray(agent0)
    spd = 8

    expect = np.zeros((m_dom, 4, 2))
    for k in range(m_dom):
        if k < 2:
            anchor = a0
        else:
            anchor = pr_np[:, min(spd * (k - 2) + spd - 1, t_len - 1)]
        for i in range(4):
            if cycle[k, i] == 1:
                if k > 0 and cycle[k - 1, i] == 1:
                    expect[k, i] = expect[k - 1, i]       # carry in stance
                else:
                    expect[k, i] = anchor + off[i]        # touchdown
            else:
                expect[k, i] = expect[k - 1, i]           # swing: carried
    np.testing.assert_allclose(np.asarray(fps), expect, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(mask), cycle)


def test_planned_footholds_clamps_past_schedule():
    from srbx import gait as gait_mod
    from srbx.config import Gait

    pr = jnp.stack([jnp.linspace(0.0, 1.0, 40), jnp.zeros(40)])
    agent0 = jnp.zeros(2)
    cycle = gait_mod.contact_schedule(Gait.TROT, 10)
    fps, mask = ocp.planned_footprint_table(pr, agent0, cycle)
    f_last, m_last = ocp.planned_footholds(fps, mask, jnp.asarray(9))
    f_over, m_over = ocp.planned_footholds(fps, mask, jnp.asarray(25))
    np.testing.assert_allclose(f_over, f_last)
    np.testing.assert_array_equal(m_over, m_last)
    assert f_last.shape == (2, 4) and m_last.shape == (4,)
