"""Scan-static prediction + LM refinement on a synthetic experiment."""

import numpy as np
import pytest

from ffs_tpu.indexing.predict import predict_scan_static
from ffs_tpu.indexing.refine import refine_candidate
from ffs_tpu.models.crystal import Crystal
from ffs_tpu.models.geometry import Goniometer, MonochromaticBeam, simple_panel


def _experiment():
    crystal = Crystal(
        np.array([20.0, 1.0, 0.0]),
        np.array([-1.0, 28.0, 0.5]),
        np.array([0.2, -0.3, 35.0]),
    )
    beam = MonochromaticBeam(wavelength=1.0)
    gonio = Goniometer()
    panel = simple_panel(
        distance_mm=80.0,
        beam_center_px=(200.0, 220.0),
        pixel_size_mm=(0.25, 0.25),
        image_size=(400, 440),
    )
    return crystal, beam, gonio, panel


def _observations(crystal, beam, gonio, panel, n=150, seed=11):
    rng = np.random.default_rng(seed)
    hkl = rng.integers(-12, 13, size=(n, 3))
    hkl = hkl[~(hkl == 0).all(axis=1)]
    d_matrix = np.stack([panel.fast_axis, panel.slow_axis, panel.origin], axis=1)
    # phi_obs in [0.05, 1.0] rad, entering flags from a first prediction
    phi0 = rng.uniform(0.05, 1.0, size=len(hkl))
    pred = predict_scan_static(
        hkl,
        np.zeros(len(hkl), dtype=bool),
        phi0,
        s0=beam.s0,
        fixed_rotation=gonio.fixed_rotation,
        setting_rotation=gonio.setting_rotation,
        rotation_axis=gonio.rotation_axis,
        ub=crystal.a_matrix,
        d_matrix=d_matrix,
    )
    # determine true entering flags: redo with flag = observed sign
    s0_m2 = np.cross(beam.s0, gonio.setting_rotation @ gonio.rotation_axis)
    s0_m2 /= np.linalg.norm(s0_m2)
    entering = (pred["s1"] @ s0_m2) < 0
    pred = predict_scan_static(
        hkl, entering, phi0,
        s0=beam.s0,
        fixed_rotation=gonio.fixed_rotation,
        setting_rotation=gonio.setting_rotation,
        rotation_axis=gonio.rotation_axis,
        ub=crystal.a_matrix,
        d_matrix=d_matrix,
    )
    ok = pred["valid"]
    # in-detector only (panel coordinates span 0..40 x 0..44 mm)
    xy = pred["xyzcal_mm"][:, :2]
    ok &= (xy[:, 0] > 0) & (xy[:, 0] < 100) & (xy[:, 1] > 0) & (xy[:, 1] < 110)
    return hkl[ok], entering[ok], pred["xyzcal_mm"][ok]


def test_predictor_consistency():
    crystal, beam, gonio, panel = _experiment()
    hkl, entering, xyz = _observations(crystal, beam, gonio, panel)
    assert len(hkl) > 30
    # re-predicting with the same models reproduces the observations exactly
    d_matrix = np.stack([panel.fast_axis, panel.slow_axis, panel.origin], axis=1)
    pred = predict_scan_static(
        hkl, entering, xyz[:, 2],
        s0=beam.s0,
        fixed_rotation=gonio.fixed_rotation,
        setting_rotation=gonio.setting_rotation,
        rotation_axis=gonio.rotation_axis,
        ub=crystal.a_matrix,
        d_matrix=d_matrix,
    )
    np.testing.assert_allclose(pred["xyzcal_mm"], xyz, atol=1e-9)


def test_refinement_recovers_perturbation():
    crystal, beam, gonio, panel = _experiment()
    hkl, entering, xyz = _observations(crystal, beam, gonio, panel)

    # perturb the crystal orientation by ~0.2 deg and the cell by 0.3%
    theta = np.deg2rad(0.2)
    R = np.array(
        [
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1],
        ]
    )
    perturbed = Crystal(
        R @ (crystal.real_space_a * 1.003),
        R @ crystal.real_space_b,
        R @ (crystal.real_space_c * 0.998),
    )

    refined, s0, (fast, slow, origin), rmsds = refine_candidate(
        perturbed, beam, panel, gonio, hkl, entering, xyz
    )
    assert np.sqrt(rmsds[0] ** 2 + rmsds[1] ** 2) < 5e-3  # mm
    a, b, c, al, be, ga = refined.unit_cell
    a0, b0, c0, al0, be0, ga0 = crystal.unit_cell
    assert [a, b, c] == pytest.approx([a0, b0, c0], rel=2e-3)
    assert [al, be, ga] == pytest.approx([al0, be0, ga0], abs=0.1)
