"""DIALS-derived golden oracles for the indexer stage functions.

Input vectors and expected values transcribed from the reference's
hand-built-input unit tests (reference: baseline/indexer/tests/*.cc), whose
expectations were themselves produced by the equivalent DIALS computations
(e.g. centroid_px_to_mm + map_centroids_to_reciprocal_space for
xyz_to_rlp).  Asserting them pins DIALS parity without needing a dataset.
"""

import numpy as np
import pytest

from ffs_tpu.indexing.assign import assign_indices_global
from ffs_tpu.indexing.combinations import candidate_orientation_matrices
from ffs_tpu.indexing.fft3d import map_centroids_to_grid
from ffs_tpu.indexing.flood_fill import flood_fill, flood_fill_filter
from ffs_tpu.indexing.peaks import peaks_to_rlvs
from ffs_tpu.indexing.rlp import xyz_to_rlp
from ffs_tpu.models.geometry import Goniometer, MonochromaticBeam, Panel, Scan


def test_xyz_to_rlp_dials_values():
    """reference: tests/test_xyz_to_rlp.cc:18-57 (EXPECT_DOUBLE_EQ)."""
    panel = Panel.from_json(
        {
            "fast_axis": [1.0, 0.0, 0.0],
            "slow_axis": [0.0, -1.0, 0.0],
            "origin": [-150, 162, -200],
            "pixel_size": [0.075, 0.075],
            "image_size": [4148, 4362],
            "trusted_range": [0.0, 46051],
            "thickness": 0.45,
            "mu": 3.92,
            "px_mm_strategy": {"type": "ParallaxCorrectedPxMmStrategy"},
        }
    )
    beam = MonochromaticBeam(wavelength=1.0)
    gonio = Goniometer(
        rotation_axis=np.array([1.0, 0.0, 0.0]),
        fixed_rotation=np.eye(3),
        setting_rotation=np.eye(3),
    )
    scan = Scan(image_range=(1, 100), oscillation=(0.0, 0.1))
    xyz = np.array([[10.1, 10.1, 50.2], [20.1, 20.1, 70.2]])
    rlp = xyz_to_rlp(xyz, panel, beam, scan, gonio)["rlp"]
    expected = np.array(
        [
            [-0.5021752936083477, 0.5690514955867707, 0.27788051106787137],
            [-0.5009709068399325, 0.5770958485799975, 0.2562207980973077],
        ]
    )
    np.testing.assert_allclose(rlp, expected, rtol=0, atol=1e-14)


def test_map_centroids_to_grid_dials_values():
    """reference: tests/test_fft3d.cc:16-81."""
    rsv = np.array([[-0.2, 0.2, 0.25], [-0.2, 0.1, 0.1]])

    grid, used = map_centroids_to_grid(rsv, d_min=2.0, b_iso=0.0, n_points=64)
    flat = grid.reshape(-1)
    np.testing.assert_array_equal(np.nonzero(flat)[0], [80294, 80752])
    assert flat[80294] == 1.0 and flat[80752] == 1.0
    assert flat.sum() == 2.0

    grid2, _ = map_centroids_to_grid(rsv, d_min=2.0, b_iso=10.0, n_points=64)
    flat2 = grid2.reshape(-1)
    assert flat2[80294] == pytest.approx(0.86070797642505781, abs=1e-15)
    assert flat2[80752] == pytest.approx(0.70029752396813894, abs=1e-15)
    assert flat2.sum() == pytest.approx(1.5610055003931969, abs=1e-15)

    # d_min=4 rescales reciprocal space and filters one point
    grid3, _ = map_centroids_to_grid(rsv, d_min=4.0, b_iso=10.0, n_points=64)
    flat3 = grid3.reshape(-1)
    np.testing.assert_array_equal(np.nonzero(flat3)[0], [27501])
    assert flat3.sum() == pytest.approx(0.86070797642505781, abs=1e-15)


def test_flood_fill_dials_values():
    """reference: tests/test_flood_fill.cc:12-45.

    Void ORDER is traversal-dependent in the reference (unordered_map) and
    differs here; the (count, COM) pairs must match modulo the periodic
    wrap convention (COMs are equivalent mod 1.0).  The weak grid[1]=1
    point must be filtered by the rmsd cutoff.
    """
    n = 5
    grid = np.zeros(n * n * n)
    for i in [0, 4, 20, 24, 100, 104, 120, 124]:  # cube across all 8 corners
        grid[i] = 100
    for i in [12, 37, 38, 39, 42, 43, 62, 63, 67, 112]:  # broken channel
        grid[i] = 100
    grid[1] = 1  # below the rmsd cutoff -> excluded
    counts, coms = flood_fill(grid, rmsd_cutoff=1.0, n_points=n)
    assert sorted(counts.tolist()) == [8, 10]
    by_count = {int(c): com for c, com in zip(counts, coms)}
    # channel: reference expects (z, y, x) = (1.2, 0.46, 0.5) == (0.2, ...)
    np.testing.assert_allclose(
        np.mod(by_count[10], 1.0), [0.2, 0.46, 0.5], atol=1e-12
    )
    # corner cube: reference expects (0.9, -0.1, 0.9) == 0.9 mod 1 each
    np.testing.assert_allclose(
        np.mod(by_count[8], 1.0), [0.9, 0.9, 0.9], atol=1e-12
    )


def test_flood_fill_filter_dials_values():
    """reference: tests/test_flood_fill.cc:47-83."""
    vols = np.array([1, 3, 1, 2, 80, 5, 3, 4, 2])
    coms = np.array([[(i + 1) / 10.0] * 3 for i in range(9)])
    vols_out, coms_out = flood_fill_filter(vols, coms, 0.2)
    np.testing.assert_array_equal(vols_out, [3, 2, 80, 5, 3, 4, 2])
    np.testing.assert_allclose(
        coms_out[:, 0], [0.2, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9], atol=1e-15
    )
    # inputs unmodified
    assert len(vols) == 9 and len(coms) == 9


def test_peaks_to_rlvs_dials_values():
    """reference: tests/test_peaks_to_rlvs.cc:13-90."""
    cfrac = np.array([[0.75] * 3, [0.1] * 3, [0.4] * 3])
    gppv = np.array([8, 10, 10])

    u1 = peaks_to_rlvs(cfrac, gppv, d_min=2.0, min_cell=3.0, max_cell=100.0,
                       n_points=256)
    assert len(u1) == 3
    np.testing.assert_allclose(u1[0], [25.6] * 3, atol=1e-12)
    np.testing.assert_allclose(u1[1], [102.4] * 3, atol=1e-12)
    np.testing.assert_allclose(u1[2], [-64.0] * 3, atol=1e-12)

    # raising the second volume makes the third an equivalent multiple
    u2 = peaks_to_rlvs(cfrac, np.array([8, 11, 10]), 2.0, 3.0, 100.0, 256)
    assert len(u2) == 2
    np.testing.assert_allclose(u2[0], [25.6] * 3, atol=1e-12)
    np.testing.assert_allclose(u2[1], [-64.0] * 3, atol=1e-12)

    # grouping by length/angle merges an inverse pair into the mean
    cfrac3 = np.array([[0.75] * 3, [0.6] * 3, [0.405] * 3])
    u3 = peaks_to_rlvs(cfrac3, np.array([8, 10, 10]), 2.0, 3.0, 100.0, 256)
    assert len(u3) == 2
    np.testing.assert_allclose(u3[0], [-103.04] * 3, atol=1e-12)
    np.testing.assert_allclose(u3[1], [-64.0] * 3, atol=1e-12)

    # min/max cell filters leave only the 110.85 A solution
    cfrac4 = np.array([[0.75] * 3, [0.6] * 3, [0.4] * 3])
    u4 = peaks_to_rlvs(cfrac4, np.array([8, 10, 10]), 2.0, 50.0, 80.0, 256)
    assert len(u4) == 1
    np.testing.assert_allclose(u4[0], [-64.0] * 3, atol=1e-12)


def test_assign_indices_dials_values():
    """reference: tests/test_assign_indices.cc:10-67 (beta lactamase refs)."""
    A = np.array(
        [
            [-0.0134, -0.0227, -0.0009],
            [-0.0053, 0.0030, -0.0140],
            [0.0203, -0.0098, -0.0036],
        ]
    )
    rlp = np.array(
        [
            [-0.20806554291174043, -0.20006695964877577, 0.46900930253991086],
            [-0.20711023322729, -0.1844213770514764, 0.47299170443928473],
            [-0.24784778679168532, -0.10882416182889978, 0.47089025552307],
            [-0.20693750699327926, -0.1837374215284657, 0.4732856446956432],
            [-0.24768402495471797, -0.11030902243741092, 0.4706897967841226],
            [-0.565, 0.15, 0.027],  # outside the 0.2 tolerance
        ]
    )
    xyz = np.array(
        [
            [128.09295901467863, 102.49866279545705, 2.325651228282444],
            [128.5569574846125, 103.27824528734998, 2.360557813322331],
            [119.93326007874127, 113.97862045047734, 2.5612706773016787],
            [128.71319842438626, 317.368360910889, 4.620759194654988],
            [119.97077430898872, 306.5586092785435, 4.751658888554562],
            [65.0, 226.0, 0.013],
        ]
    )
    hkl, n_indexed = assign_indices_global(A, rlp, xyz, tolerance=0.2)
    assert n_indexed == 5
    expected = [
        [22, -4, 5],
        [22, -4, 4],
        [22, -2, -1],
        [22, -4, 4],
        [22, -2, -1],
        [0, 0, 0],
    ]
    np.testing.assert_array_equal(hkl, expected)


def test_combinations_dials_values():
    """reference: tests/test_combinations.cc:14-42."""
    basis = [
        np.array([10.0, 0.0, 0.0]),
        np.array([10.0, 1.0, 0.0]),
        np.array([0.0, 2.5, 0.0]),
        np.array([0.0, 0.0, 50.0]),
    ]
    cells = [c.unit_cell for c in candidate_orientation_matrices(basis, 10)]
    assert len(cells) == 2
    np.testing.assert_allclose(cells[0], [2.5, 10, 50, 90, 90, 90], atol=1e-4)
    np.testing.assert_allclose(
        cells[1], [2.5, 10.0499, 50, 90, 90, 95.7106], atol=1e-4
    )
