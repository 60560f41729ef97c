"""Indexing chain: synthetic-lattice recovery + unit tests."""

import numpy as np
import pytest

from ffs_tpu.indexing import assign as assign_mod
from ffs_tpu.indexing import combinations as comb_mod
from ffs_tpu.indexing import fft3d as fft_mod
from ffs_tpu.indexing import flood_fill as ff_mod
from ffs_tpu.indexing import non_primitive
from ffs_tpu.indexing import peaks as peaks_mod
from ffs_tpu.models.crystal import Crystal, niggli_reduce_vectors


def _synthetic_rlps(crystal, n=300, noise=1e-4, seed=3, hmax=12, d_min=2.0):
    rng = np.random.default_rng(seed)
    A = crystal.a_matrix
    hkls = rng.integers(-hmax, hmax + 1, size=(n, 3))
    hkls = hkls[~(hkls == 0).all(axis=1)]
    rlp = hkls @ A.T + rng.normal(0, noise, size=(len(hkls), 3))
    d = 1.0 / np.linalg.norm(rlp, axis=1)
    keep = d > d_min
    return rlp[keep], hkls[keep]


CELL = Crystal(
    np.array([20.0, 0.0, 0.0]),
    np.array([0.0, 28.0, 0.0]),
    np.array([0.0, 0.0, 35.0]),
)


def test_niggli_properties():
    rng = np.random.default_rng(0)
    for _ in range(20):
        # random integer recombination of a known lattice
        M = np.eye(3, dtype=int)
        while abs(np.linalg.det(M)) != 1:
            M = rng.integers(-2, 3, size=(3, 3))
        vecs = M @ np.stack(
            [CELL.real_space_a, CELL.real_space_b, CELL.real_space_c]
        )
        a, b, c = niggli_reduce_vectors(*vecs)
        la, lb, lc = map(np.linalg.norm, (a, b, c))
        assert la <= lb + 1e-6 and lb <= lc + 1e-6
        # same lattice volume
        vol = abs(np.linalg.det(np.stack([a, b, c])))
        assert vol == pytest.approx(CELL.volume, rel=1e-9)
        # reduced cell of this orthorhombic lattice = the original lengths
        assert sorted([la, lb, lc]) == pytest.approx([20, 28, 35], rel=1e-9)


def test_niggli_canonical_sign_patterns():
    """Steps 3/4 sign normalisation (Krivy & Gruber 1976): every reduced
    cell must be Niggli-canonical — xi, eta, zeta all positive (type I) or
    all non-positive (type II), with the main ordering conditions — and
    span exactly the input lattice.  The pre-fix code left (+,-,-)-pattern
    inputs (xi*eta*zeta > 0 with mixed signs) untransformed: ~43% of random
    bases reduced to cells with mixed acute/obtuse angles."""
    rng = np.random.default_rng(7)
    checked = 0
    while checked < 200:
        m = rng.normal(size=(3, 3)) * rng.uniform(5, 50)
        if abs(np.linalg.det(m)) < 1.0:
            continue
        checked += 1
        a, b, c = niggli_reduce_vectors(m[0], m[1], m[2])
        red = np.stack([a, b, c])
        # same lattice: integer change of basis with |det| == 1
        T = red @ np.linalg.inv(m)
        assert np.allclose(T, np.round(T), atol=1e-6)
        assert abs(abs(np.linalg.det(T)) - 1.0) < 1e-6
        xi = 2 * np.dot(b, c)
        eta = 2 * np.dot(a, c)
        zeta = 2 * np.dot(a, b)
        vol = abs(np.linalg.det(red))
        eps = 1e-5 * vol ** (2.0 / 3.0)
        signs = [
            0 if abs(v) <= eps else (1 if v > 0 else -1)
            for v in (xi, eta, zeta)
        ]
        assert all(s > 0 for s in signs) or all(s <= 0 for s in signs), signs
        A, B, C = (np.dot(v, v) for v in (a, b, c))
        assert A <= B + eps and B <= C + eps
        assert abs(xi) <= B + eps
        assert abs(eta) <= A + eps and abs(zeta) <= A + eps


def test_fft_chain_recovers_cell():
    rlp, _ = _synthetic_rlps(CELL, n=4000, d_min=2.0)
    d_min = 2.0
    b_iso = fft_mod.b_iso_from_d_min(d_min)
    grid, used = fft_mod.fft3d(rlp, d_min, b_iso, n_points=128, use_device=False)
    vols, coms = ff_mod.flood_fill(grid, rmsd_cutoff=15.0, n_points=128)
    assert len(vols) > 0
    vols, coms = ff_mod.flood_fill_filter(vols, coms, 0.15)
    vectors = peaks_mod.peaks_to_rlvs(
        coms, vols, d_min, min_cell=3.0, max_cell=50.0, n_points=128
    )
    assert len(vectors) >= 3
    # candidate crystals must include one matching the true cell
    found = False
    for crystal in comb_mod.candidate_orientation_matrices(vectors, 100):
        cell = crystal.unit_cell
        if np.allclose(sorted(cell[:3]), [20, 28, 35], atol=0.5) and np.allclose(
            cell[3:], [90, 90, 90], atol=2.0
        ):
            found = True
            break
    assert found, "true cell not among candidates"


def test_assign_indices():
    rlp, hkls = _synthetic_rlps(CELL, n=500, noise=1e-5)
    xyz_mm = np.zeros((len(rlp), 3))
    got, n_indexed = assign_mod.assign_indices_global(CELL.a_matrix, rlp, xyz_mm)
    sel = ~(got == 0).all(axis=1)
    assert n_indexed == sel.sum()
    np.testing.assert_array_equal(got[sel], hkls[sel])
    # >90% indexed (only hkl == 0 rejected, duplicates collapse)
    assert n_indexed > 0.8 * len(rlp)


def test_assign_duplicate_resolution():
    A = np.eye(3) * 0.1
    rlp = np.array([[0.1, 0.0, 0.0], [0.102, 0.0, 0.0], [0.0, 0.1, 0.0]])
    xyz = np.zeros((3, 3))
    hkl, n = assign_mod.assign_indices_global(A, rlp, xyz)
    # first two collide on (1,0,0); the closer one (index 0) survives
    assert n == 2
    np.testing.assert_array_equal(hkl[0], [1, 0, 0])
    np.testing.assert_array_equal(hkl[1], [0, 0, 0])


def test_flood_fill_periodic_wrap():
    n = 32
    grid = np.zeros((n, n, n))
    # blob crossing the x boundary
    grid[-1, 5, 5] = grid[0, 5, 5] = grid[1, 5, 5] = 100.0
    vols, coms = ff_mod.flood_fill(grid, rmsd_cutoff=5.0, n_points=n)
    assert len(vols) == 1 and vols[0] == 3
    # unwrapped COM: around x=0 (mean of -1, 0, 1)
    assert coms[0][0] == pytest.approx(0.0, abs=1e-9)


def test_non_primitive_correction():
    # doubled cell along a: only even h observed -> correction halves a*
    rlp, hkls = _synthetic_rlps(CELL, n=600, noise=1e-5, seed=5)
    even = hkls[:, 0] % 2 == 0
    rlp, hkls = rlp[even], hkls[even]
    xyz = np.zeros((len(rlp), 3))
    hkl0, n0 = assign_mod.assign_indices_global(CELL.a_matrix, rlp, xyz)
    hkl1, crystal, n1 = non_primitive.correct(hkl0, CELL, rlp, xyz)
    assert n1 >= n0 * 0.9
    a, b, c, *_ = crystal.unit_cell
    # only even h observed -> the true primitive cell has a = 20/2 = 10
    assert min(a, b, c) == pytest.approx(10.0, rel=1e-3)


def test_tukey_outliers_empty_residuals():
    """A candidate that loses every reflection before outlier rejection
    must yield an empty mask, not IndexError."""
    from ffs_tpu.indexing.filter import simple_tukey_outliers

    out = simple_tukey_outliers(np.zeros(0), np.zeros(0), np.zeros(0))
    assert out.shape == (0,) and out.dtype == bool


def test_sample_size_rounds_half_away_from_zero():
    """std::round semantics for the subsample size: a 50.5-degree scan
    must sample 20*51, not banker's-rounded 20*50 (the mt19937 subsample
    is bit-for-bit only if sample_size matches the reference)."""
    import numpy as np

    for width, want in ((50.5, 51), (49.5, 50), (0.2, 1)):
        got = max(int(np.floor(width + 0.5)), 1)
        assert got == want
