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
