"""End-to-end baseline_indexer on a synthetic rotation experiment."""

import json
import os

import numpy as np
import pytest

from ffs_tpu.indexing.predict import predict_scan_static
from ffs_tpu.models.crystal import Crystal
from ffs_tpu.models.experiment import Experiment
from ffs_tpu.models.geometry import Goniometer, MonochromaticBeam, Scan, simple_panel
from ffs_tpu.models.reflection_table import STRONG, ReflectionTable


@pytest.fixture()
def synthetic_experiment(tmp_path):
    rng = np.random.default_rng(17)
    # a mildly rotated orthorhombic crystal
    theta = 0.3
    R = np.array(
        [
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1],
        ]
    )
    crystal = Crystal(R @ [60.0, 0, 0], R @ [0, 70.0, 0], R @ [0, 0, 80.0])
    beam = MonochromaticBeam(wavelength=1.0)
    gonio = Goniometer()
    scan = Scan(image_range=(1, 100), oscillation=(0.0, 0.5))
    panel = simple_panel(
        distance_mm=150.0,
        beam_center_px=(500.0, 520.0),
        pixel_size_mm=(0.1, 0.1),
        image_size=(1000, 1040),
    )
    expt = Experiment(beam, panel, gonio, scan)

    # generate observed spots: predict hkls over the scan
    hkl = rng.integers(-25, 26, size=(12000, 3))
    hkl = np.unique(hkl[~(hkl == 0).all(axis=1)], axis=0)
    d_matrix = np.stack([panel.fast_axis, panel.slow_axis, panel.origin], axis=1)
    phi_seed = rng.uniform(0.0, np.deg2rad(50.0), size=len(hkl))
    pred = predict_scan_static(
        hkl,
        np.zeros(len(hkl), bool),
        phi_seed,
        s0=beam.s0,
        fixed_rotation=gonio.fixed_rotation,
        setting_rotation=gonio.setting_rotation,
        rotation_axis=gonio.rotation_axis,
        ub=crystal.a_matrix,
        d_matrix=d_matrix,
    )
    s0_m2 = np.cross(beam.s0, gonio.setting_rotation @ gonio.rotation_axis)
    s0_m2 /= np.linalg.norm(s0_m2)
    entering = (pred["s1"] @ s0_m2) < 0
    pred = predict_scan_static(
        hkl, entering, phi_seed,
        s0=beam.s0,
        fixed_rotation=gonio.fixed_rotation,
        setting_rotation=gonio.setting_rotation,
        rotation_axis=gonio.rotation_axis,
        ub=crystal.a_matrix,
        d_matrix=d_matrix,
    )
    xyz = pred["xyzcal_mm"]
    ok = pred["valid"]
    ok &= (xyz[:, 0] > 2) & (xyz[:, 0] < 98) & (xyz[:, 1] > 2) & (xyz[:, 1] < 102)
    phi_deg = np.degrees(xyz[:, 2])
    ok &= (phi_deg >= 0.0) & (phi_deg < 50.0)
    xyz = xyz[ok]

    # convert mm/rad -> px/image-index (inverse of xyz_to_rlp conventions)
    x_px = xyz[:, 0] / 0.1
    y_px = xyz[:, 1] / 0.1
    z_img = np.degrees(xyz[:, 2]) / 0.5 - 1 + scan.image_range[0]
    xyzobs_px = np.stack([x_px, y_px, z_img], axis=1)
    # small centroid noise
    xyzobs_px += rng.normal(0, 0.1, xyzobs_px.shape)

    table = ReflectionTable()
    table["xyzobs.px.value"] = xyzobs_px
    table["flags"] = np.full(len(xyzobs_px), STRONG, dtype=np.uint64)
    refl_path = tmp_path / "strong.refl"
    table.write(str(refl_path))
    expt_path = tmp_path / "imported.expt"
    expt.save(str(expt_path))
    return expt_path, refl_path, crystal, len(xyzobs_px)


def test_indexer_cli_recovers_cell(synthetic_experiment, tmp_path, monkeypatch):
    expt_path, refl_path, truth, n_obs = synthetic_experiment
    assert n_obs > 300, f"only {n_obs} observations"
    monkeypatch.chdir(tmp_path)
    from ffs_tpu.pipeline import indexer

    rc = indexer.run(
        [
            "-e", str(expt_path),
            "-r", str(refl_path),
            "--max-cell", "100",
            "--max-refine", "12",
            "--macro-cycles", "2",
            "--test",
        ]
    )
    assert rc == 0
    assert os.path.exists("indexed.expt")
    assert os.path.exists("indexed.refl")
    assert os.path.exists("candidate_vectors.json")
    assert os.path.exists("candidate_crystals.json")

    with open("indexed.expt") as f:
        out = json.load(f)
    cell = Crystal.from_json(out["crystal"][0]).unit_cell
    want = sorted(truth.unit_cell[:3])
    got = sorted(cell[:3])
    assert got == pytest.approx(want, rel=0.01)
    assert list(cell[3:]) == pytest.approx([90, 90, 90], abs=1.0)

    out_table = ReflectionTable.read("indexed.refl")
    assert "miller_index" in out_table and "xyzcal.mm" in out_table
    hkl = out_table["miller_index"]
    frac = (~(hkl == 0).all(axis=1)).mean()
    assert frac > 0.8
