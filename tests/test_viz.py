"""srbx.viz — offline rendering of whole-body poses and campaigns.

The skeleton is a view of the controller's own FK (`srbx.models.rbd`), so
the tests pin the geometric identities (toe segments end exactly at the FK
toe sites; trunk box corners transform with the base frame) and smoke the
file-producing entry points."""

import os

import numpy as np
import pytest

from srbx import viz
from srbx.models import a1, rbd
from srbx.sim import wholebody as wb


@pytest.fixture(scope="module")
def model():
    return a1.model()


@pytest.fixture(scope="module")
def crouch(model):
    return np.asarray(wb.default_crouch(model))


def test_skeleton_segment_structure(model, crouch):
    segs, toes = viz.skeleton_segments(model, crouch)
    assert len(segs) == 12 + 4 * 3          # trunk box edges + 4 leg chains
    assert toes.shape == (4, 3)
    for s in segs:
        assert s.shape == (2, 3)
        assert np.isfinite(s).all()


def test_leg_chains_end_at_fk_toe_sites(model, crouch):
    """The rendered toe must be the SAME point the controller's FK uses."""
    segs, toes = viz.skeleton_segments(model, crouch)
    sites = np.asarray(rbd.site_positions(model, crouch))[:4]
    np.testing.assert_allclose(toes, sites, atol=1e-12)
    for leg in range(4):
        np.testing.assert_allclose(segs[12 + 3 * leg + 2][1], sites[leg],
                                   atol=1e-12)


def test_trunk_box_follows_base_frame(model, crouch):
    """Yawing the base by 90 deg rotates every trunk corner accordingly."""
    q2 = crouch.copy()
    q2[5] = np.pi / 2
    segs0, _ = viz.skeleton_segments(model, crouch)
    segs1, _ = viz.skeleton_segments(model, q2)
    base = crouch[:3]
    rot90 = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    for s0, s1 in zip(segs0[:12], segs1[:12]):
        np.testing.assert_allclose(s1 - base, (s0 - base) @ rot90.T,
                                   atol=1e-12)


def test_render_wholebody_writes_png(model, crouch, tmp_path):
    traj = np.tile(crouch, (60, 1))
    traj[:, 0] += np.linspace(0.0, 0.3, 60)
    out = viz.render_wholebody(model, traj, str(tmp_path / "wb.png"),
                               n_ghosts=3)
    assert os.path.getsize(out) > 10_000


def test_plot_team_campaign_writes_png(tmp_path):
    rng = np.random.default_rng(0)
    traj = rng.normal(size=(3, 20, 2, 2)).cumsum(1) * 0.1
    pobs = rng.uniform(1.0, 8.0, size=(3, 2, 9))
    out = viz.plot_team_campaign(
        traj, pobs, str(tmp_path / "camp.png"),
        success=np.asarray([[True, True], [True, False], [True, True]]))
    assert os.path.getsize(out) > 10_000
