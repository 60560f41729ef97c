"""Rotation prediction: cross-check against the scan-static repredictor."""

import json

import numpy as np
import pytest

from ffs_tpu.indexing.predict import predict_scan_static
from ffs_tpu.models.crystal import Crystal
from ffs_tpu.models.experiment import Experiment
from ffs_tpu.models.geometry import Goniometer, MonochromaticBeam, Scan, simple_panel
from ffs_tpu.prediction.rotation import hkl_grid, predict_rotation


@pytest.fixture()
def experiment():
    crystal = Crystal([30.0, 0, 0], [0, 40.0, 0], [0, 0, 50.0])
    return Experiment(
        beam=MonochromaticBeam(wavelength=1.2),
        panel=simple_panel(100.0, (250.0, 260.0), (0.2, 0.2), (500, 520)),
        goniometer=Goniometer(),
        scan=Scan(image_range=(1, 20), oscillation=(0.0, 0.5)),
        crystal=crystal,
    )


def test_hkl_grid_bounds():
    A = Crystal([30.0, 0, 0], [0, 40.0, 0], [0, 0, 50.0]).a_matrix
    grid = hkl_grid(A, dmin=3.0)
    assert np.abs(grid[:, 0]).max() == 10
    assert np.abs(grid[:, 2]).max() == np.ceil(50 / 3)
    assert not (grid == 0).all(axis=1).any()


def test_rotation_prediction_agrees_with_repredictor(experiment):
    pred = predict_rotation(experiment, dmin=4.0, use_device=False)
    assert len(pred.hkl) > 20

    # each predicted reflection re-predicts to the same position via the
    # scan-static predictor given (hkl, entering)
    d_matrix = experiment.d_matrix
    re = predict_scan_static(
        pred.hkl,
        pred.entering,
        pred.xyzcal_mm[:, 2],
        s0=experiment.beam.s0,
        fixed_rotation=experiment.goniometer.fixed_rotation,
        setting_rotation=experiment.goniometer.setting_rotation,
        rotation_axis=experiment.goniometer.rotation_axis,
        ub=experiment.crystal.a_matrix,
        d_matrix=d_matrix,
    )
    assert re["valid"].all()
    # the rotation predictor linearises the rotation across each 0.5 deg
    # frame (ray_predictors.cc:115-201 does the same); the exact static
    # repredictor differs by the chord error, sub-micron here
    np.testing.assert_allclose(re["xyzcal_mm"], pred.xyzcal_mm, atol=2e-3)
    np.testing.assert_allclose(
        re["xyzcal_mm"][:, 2], pred.xyzcal_mm[:, 2], atol=1e-5
    )

    # angles inside the scan, frames inside the image range
    frames = pred.xyzcal_px[:, 2]
    assert (frames >= 0).all() and (frames <= 20).all()
    # no duplicated (hkl, entering) pairs
    keys = {(tuple(h), bool(e)) for h, e in zip(pred.hkl, pred.entering)}
    assert len(keys) == len(pred.hkl)


def test_predictor_cli(experiment, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    experiment.save("indexed.expt")
    from ffs_tpu.pipeline import predictor

    rc = predictor.run(["-e", "indexed.expt", "--dmin", "4.0"])
    assert rc == 0
    from ffs_tpu.models.reflection_table import ReflectionTable

    t = ReflectionTable.read("predicted.refl")
    assert len(t) > 20
    for col in ("miller_index", "s1", "xyzcal.px", "xyzcal.mm", "entering", "flags"):
        assert col in t
    assert (np.asarray(t["flags"]) & 1).all()  # predicted flag set


def test_laue_stills_on_ewald_sphere():
    from ffs_tpu.models.crystal import Crystal
    from ffs_tpu.prediction.stills import predict_laue_stills

    rng = np.random.default_rng(0)
    crystal = Crystal([30.0, 0, 0], [0, 40.0, 0], [0, 0, 50.0])
    hkl = rng.integers(-35, 36, size=(2000, 3))
    out = predict_laue_stills(
        hkl, [0.0, 0.0, -1.0], crystal.a_matrix, 0.8, 1.6, 1.2
    )
    ok = out["valid"]
    assert ok.sum() > 50
    # every valid ray lies on its own Ewald sphere: |s1| = wavenumber
    s1n = np.linalg.norm(out["s1"][ok], axis=1)
    np.testing.assert_allclose(s1n, out["wavenumber"][ok], rtol=1e-10)
    # wavenumbers within the bandpass
    assert (out["wavenumber"][ok] >= 1 / 1.6 - 1e-12).all()
    assert (out["wavenumber"][ok] <= 1 / 0.8 + 1e-12).all()


def test_reeke_limits_parity(experiment):
    """The conservative hkl-grid predictor and a direct port of the
    reference's Reeke loop limits must select the SAME reflections for an
    image (reference: include/predictor/index_generators.hpp:27-388).

    The Reeke enumeration is a tight candidate superset; the Ewald-crossing
    ray test is the arbiter.  Identical surviving hkl sets prove our grid
    never misses a Reeke-reachable reflection.
    """
    from ffs_tpu.prediction.reeke import reeke_indices
    from ffs_tpu.prediction.rotation import _rays_for_image

    dmin = 4.0
    A = experiment.crystal.a_matrix
    s0 = experiment.beam.s0
    gonio = experiment.goniometer
    osc0, d_osc = experiment.scan.oscillation
    m2 = gonio.rotation_axis / np.linalg.norm(gonio.rotation_axis)

    def rot(angle_deg):
        t = np.deg2rad(angle_deg)
        c, s = np.cos(t), np.sin(t)
        x, y, z = m2
        K = np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]])
        return c * np.eye(3) + s * K + (1 - c) * np.outer(m2, m2)

    def surviving(hkl, A1_full, A2_full, phi_beg):
        if len(hkl) == 0:
            return set()
        ok, _, _, _ = _rays_for_image(
            np, hkl.astype(np.float64), A1_full, A2_full, s0, s0,
            dmin, phi_beg, d_osc,
        )
        ok = ok & ~(hkl == 0).all(axis=1)
        return {tuple(v) for v in hkl[ok]}

    grid = hkl_grid(A, dmin)
    n_checked = 0
    for image_index in (0, 7, 19):
        phi_beg = osc0 + image_index * d_osc
        A1_full = (
            gonio.setting_rotation @ rot(phi_beg) @ gonio.fixed_rotation @ A
        )
        A2_full = (
            gonio.setting_rotation
            @ rot(phi_beg + d_osc)
            @ gonio.fixed_rotation
            @ A
        )
        reeke = reeke_indices(A1_full, A2_full, s0, s0, dmin)
        assert len(reeke) > 0
        # Reeke is a candidate enumeration far smaller than the full grid
        assert len(reeke) < len(grid) / 5

        got_grid = surviving(grid, A1_full, A2_full, phi_beg)
        got_reeke = surviving(reeke, A1_full, A2_full, phi_beg)
        assert got_grid == got_reeke
        n_checked += len(got_grid)
    assert n_checked > 20  # the comparison was not vacuous


def test_device_block_prediction_matches_host(experiment):
    """The batched device path (one dispatch per image block, on-device
    survivor compaction) must reproduce the per-image host path exactly."""
    host = predict_rotation(experiment, dmin=4.0, use_device=False)
    dev = predict_rotation(experiment, dmin=4.0, use_device=True)
    assert len(dev.hkl) == len(host.hkl) > 20

    def key(p):
        order = np.lexsort(
            (p.xyzcal_px[:, 2], p.hkl[:, 2], p.hkl[:, 1], p.hkl[:, 0])
        )
        return order

    oh, od = key(host), key(dev)
    np.testing.assert_array_equal(dev.hkl[od], host.hkl[oh])
    np.testing.assert_allclose(
        dev.xyzcal_px[od], host.xyzcal_px[oh], rtol=0, atol=1e-9
    )
    np.testing.assert_allclose(dev.s1[od], host.s1[oh], rtol=0, atol=1e-12)
    np.testing.assert_array_equal(dev.entering[od], host.entering[oh])


def test_host_on_panel_bounds_are_in_mm():
    """On-panel acceptance is decided in MM (the dx2 contract — reference:
    predict.cc:106 drops only rays with no mm intersection), not in
    parallax-corrected px space: a ray inside the physical panel can have
    px coordinates fractionally outside [0, size_px).  A steep-angle
    parallax panel with a full-turn scan lands dozens of spots in that
    boundary band; the host path must KEEP them (it used px bounds and
    silently dropped them before this regression test)."""
    panel = simple_panel(
        40.0, (250.0, 260.0), (0.2, 0.2), (500, 520),
        mu=0.15, thickness=1.0, parallax=True,
    )
    expt = Experiment(
        beam=MonochromaticBeam(wavelength=2.0),
        panel=panel,
        goniometer=Goniometer(),
        scan=Scan(image_range=(1, 120), oscillation=(0.0, 3.0)),
        crystal=Crystal([30.0, 0, 0], [0, 40.0, 0], [0, 0, 50.0]),
    )
    pred = predict_rotation(expt, dmin=2.2, use_device=False)
    w, h = panel.image_size
    wmm = w * panel.pixel_size[0]
    hmm = h * panel.pixel_size[1]
    xmm, ymm = pred.xyzcal_mm[:, 0], pred.xyzcal_mm[:, 1]
    assert ((xmm >= 0) & (xmm < wmm) & (ymm >= 0) & (ymm < hmm)).all()
    x_px, y_px = panel.mm_to_px(xmm, ymm)
    out_px = (x_px < 0) | (x_px >= w) | (y_px < 0) | (y_px >= h)
    # the band is genuinely occupied — px bounds would have dropped these
    assert int(out_px.sum()) > 10


def test_systematic_absences_filtered_in_prediction(experiment):
    """A C2 crystal must predict no h+k-odd reflections, and the kept set
    must be exactly the P1 prediction minus the absent rows (reference:
    the generators filter via the crystal's space-group operations,
    predict.cc:156-157, index_generators.hpp:83)."""
    from dataclasses import replace

    pred_p1 = predict_rotation(experiment, dmin=4.0, use_device=False)
    assert ((pred_p1.hkl.sum(axis=1) % 2) != 0).any()  # P1 keeps them

    expt_c2 = replace(
        experiment,
        crystal=Crystal(
            experiment.crystal.real_space_a,
            experiment.crystal.real_space_b,
            experiment.crystal.real_space_c,
            space_group="C 2y",
        ),
    )
    pred_c2 = predict_rotation(expt_c2, dmin=4.0, use_device=False)
    assert len(pred_c2.hkl) > 0
    assert ((pred_c2.hkl[:, 0] + pred_c2.hkl[:, 1]) % 2 == 0).all()

    # exactly the allowed subset of the P1 prediction, same positions
    allowed = (pred_p1.hkl[:, 0] + pred_p1.hkl[:, 1]) % 2 == 0
    np.testing.assert_array_equal(pred_c2.hkl, pred_p1.hkl[allowed])
    np.testing.assert_allclose(
        pred_c2.xyzcal_px, pred_p1.xyzcal_px[allowed], rtol=0, atol=1e-12
    )


def test_reeke_group_ops_filter(experiment):
    from ffs_tpu.models.symmetry import GroupOps
    from ffs_tpu.prediction.reeke import reeke_indices

    A = experiment.crystal.a_matrix
    s0 = experiment.beam.s0
    # one 0.5-degree image interval about the spindle
    t = np.deg2rad(0.5)
    c, s = np.cos(t), np.sin(t)
    R = np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
    all_hkl = reeke_indices(A, R @ A, s0, s0, dmin=4.0)
    ops = GroupOps.from_hall("C 2y")
    kept = reeke_indices(A, R @ A, s0, s0, dmin=4.0, group_ops=ops)
    want = all_hkl[~ops.is_systematically_absent(all_hkl)]
    np.testing.assert_array_equal(kept, want)
    assert len(kept) < len(all_hkl)
