"""Per-gait integration-fidelity checks for the SimConfig.substeps default.

ADVICE r1: the substeps 4->2 default was measured on trot closed-loop only
(7e-4 m over 4 domains); the stiffer contact events of the newly added gaits
(PACE with 0.1 s domains, TAP) inherited the coarser default untested. These
tests record the substeps=2 vs substeps=4 deviation for those gaits through
the full plant, justifying the global default (or catching a regression of
it)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srbx.config import Gait, LowLevelConfig, MotionConfig, QpConfig
from srbx.models import a1
from srbx.sim import closedloop
from srbx.sim import wholebody as wb

M = a1.model()
LL, MO, QP = LowLevelConfig(), MotionConfig(), QpConfig()


def _run_gait(gait, substeps, n_ticks=500):
    sim_cfg = dataclasses.replace(wb.SimConfig(), substeps=substeps)
    loop = closedloop.LoopConfig(stand_ticks=400)
    a0 = jnp.asarray([[0.0, 0.0], [0.0, -0.6]])
    return jax.jit(lambda: closedloop.run_velocity_gait(
        gait, LL, MO, QP, sim_cfg, loop, M, a0, n_ticks=n_ticks,
        backend="xla"))()


@pytest.mark.slow
@pytest.mark.parametrize("gait", [Gait.PACE, Gait.TAP])
def test_substeps_default_accuracy_stiff_gaits(gait):
    """substeps=2 (the default) must track substeps=4 within mm through the
    stiffest contact schedules (PACE 0.1 s domains; TAP single-leg taps),
    with LL-QP convergence unaffected."""
    r2 = _run_gait(gait, 2)
    r4 = _run_gait(gait, 4)
    com2 = np.asarray(r2.com_hist)
    com4 = np.asarray(r4.com_hist)
    assert np.isfinite(com2).all() and np.isfinite(com4).all()
    dev = np.abs(com2 - com4).max()
    # trot's measured 2-vs-4 deviation is 7e-4 m (wholebody.py:32); allow
    # the stiff gaits a few mm before calling the default unjustified
    assert dev < 5e-3, f"{gait}: substeps 2 vs 4 COM deviation {dev:.2e} m"
    assert float(np.asarray(r2.qp_ok).min()) > 0.97
    assert float(np.asarray(r4.qp_ok).min()) > 0.97
