"""SSX stills indexing: synthetic still recovers the known cell."""

import numpy as np
import pytest

from ffs_tpu.indexing.ssx import SSXIndexer, find_candidate_cells
from ffs_tpu.models.crystal import Crystal
from ffs_tpu.models.geometry import simple_panel
from ffs_tpu.prediction.stills import predict_stills


def _still_experiment(seed=5):
    rng = np.random.default_rng(seed)
    # a randomly oriented orthorhombic crystal
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    base = np.diag([30.0, 40.0, 50.0])
    vecs = base @ q.T
    crystal = Crystal(vecs[0], vecs[1], vecs[2])
    panel = simple_panel(100.0, (250.0, 260.0), (0.2, 0.2), (500, 520))
    wavelength = 1.1
    s0 = np.array([0.0, 0.0, -1.0 / wavelength])
    return crystal, panel, wavelength, s0, rng


def _synthetic_still_spots(crystal, panel, wavelength, s0, rng, n=20000, tol=4e-3):
    """Reflections close enough to the Ewald sphere to appear on a still."""
    hkl = rng.integers(-15, 16, size=(n, 3))
    hkl = np.unique(hkl[~(hkl == 0).all(axis=1)], axis=0)
    A = crystal.a_matrix
    q = hkl @ A.T
    # distance from Ewald sphere
    d_es = np.abs(np.linalg.norm(q + s0, axis=1) - np.linalg.norm(s0))
    near = d_es < tol
    hkl = hkl[near]
    pred = predict_stills(hkl, s0, A, panel)
    x, y = pred["xyzcal_px"][:, 0], pred["xyzcal_px"][:, 1]
    ok = (x > 5) & (x < 495) & (y > 5) & (y < 515)
    obs = np.stack([x[ok], y[ok], np.zeros(ok.sum())], axis=1)
    obs[:, :2] += rng.normal(0, 0.2, size=(len(obs), 2))
    return obs, hkl[ok]


def test_ssx_indexing_recovers_cell():
    crystal, panel, wavelength, s0, rng = _still_experiment()
    obs, hkl_true = _synthetic_still_spots(crystal, panel, wavelength, s0, rng)
    assert len(obs) >= 15, f"only {len(obs)} synthetic spots"

    indexer = SSXIndexer(min_spots=10, use_device=False)
    indexer.panel = panel
    indexer.cell = (30.0, 40.0, 50.0, 90.0, 90.0, 90.0)
    indexer.wavelength = wavelength

    result, n_unindexed = indexer.index(obs)
    assert result is not None
    n_indexed = len(result.delpsi)
    assert n_indexed >= 0.7 * len(obs), f"indexed only {n_indexed}/{len(obs)}"
    got = sorted(result.cell_parameters[:3])
    assert got == pytest.approx([30.0, 40.0, 50.0], rel=0.02)
    assert result.rmsds[0] < 1.0 and result.rmsds[1] < 1.0


def test_find_candidate_cells_angles():
    crystal, panel, wavelength, s0, rng = _still_experiment(seed=9)
    obs, _ = _synthetic_still_spots(crystal, panel, wavelength, s0, rng)
    from ffs_tpu.indexing.rlp import ssx_xyz_to_rlp

    rlp = ssx_xyz_to_rlp(obs, panel, wavelength)
    cells = find_candidate_cells(
        rlp, (30.0, 40.0, 50.0, 90.0, 90.0, 90.0), use_device=False
    )
    assert cells, "no candidate cells found"
    for m in cells:
        assert np.linalg.det(m) > 0  # right handed
        lengths = sorted(np.linalg.norm(m, axis=1))
        assert lengths == pytest.approx([30, 40, 50], rel=0.06)


def test_left_handed_candidate_repair_preserves_angles():
    """A left-handed angle-satisfying triple must be repaired by negating
    the WHOLE cell (preserves every mutual angle, flips handedness) —
    negating one vector would turn alpha/beta into their supplements."""
    from ffs_tpu.indexing.ssx import find_candidate_cells

    # monoclinic target: beta = 100 deg
    a, b, c, beta = 30.0, 40.0, 50.0, 100.0
    va = np.array([a, 0.0, 0.0])
    vb = np.array([0.0, b, 0.0])
    vc = c * np.array([np.cos(np.deg2rad(beta)), 0.0, np.sin(np.deg2rad(beta))])
    cell_vectors = np.stack([va, vb, vc])
    assert np.linalg.det(cell_vectors) > 0

    # synthesise rlp from this cell so the search recovers +-its axes
    A = np.linalg.inv(cell_vectors)
    hkl = np.stack(
        np.meshgrid(*([np.arange(-3, 4)] * 3), indexing="ij"), -1
    ).reshape(-1, 3)
    hkl = hkl[~(hkl == 0).all(axis=1)]
    rlp = hkl @ A.T

    cells = find_candidate_cells(
        rlp, (a, b, c, 90.0, beta, 90.0), use_device=False,
        num_halfsphere_points=4096, num_candidate_vectors=8,
    )
    assert cells
    for m in cells:
        assert np.linalg.det(m) > 0  # right-handed
        # angles honoured within the tolerance for every emitted cell
        def ang(u, v):
            cosv = u @ v / (np.linalg.norm(u) * np.linalg.norm(v))
            return np.degrees(np.arccos(np.clip(cosv, -1, 1)))

        assert abs(ang(m[0], m[2]) - beta) < 3.5
        assert abs(ang(m[1], m[2]) - 90.0) < 3.5
        assert abs(ang(m[0], m[1]) - 90.0) < 3.5
