"""Full-pipeline chain test: frames -> spotfinder -> indexer -> integrator.

The one test that exercises the REAL beamline flow through the CLI
surfaces and the HDF5/JSON handoff contracts between them (reference flow:
spotfinder writes results_ffs.h5 [spotfinder.cc:1219-1305], the indexer
consumes a strong-reflection table + experiment JSON [indexer.cc:130-167]
and writes indexed.expt/indexed.refl [indexer.cc:449-613], the integrator
consumes those + images [integrator.cc:340-527]).  Each stage is run as a
subprocess console entry point on data generated from a KNOWN crystal, so
the assertions close the loop: the indexer must recover the ground-truth
cell from the spotfinder's centroids, and the integrator must recover the
injected intensities from the indexed model.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from .util import write_nexus

# ground truth
CELL = (28.0, 32.0, 36.0)
N_IMG = 32
HW = 280
PIX_MM = 0.2
DIST_MM = 120.0
WL = 1.0
SXY = 1.3  # spot Gaussian sigma, px
SZ = 1.3  # spot Gaussian sigma, frames


def _make_experiment(with_crystal):
    from ffs_tpu.models.crystal import Crystal
    from ffs_tpu.models.experiment import Experiment
    from ffs_tpu.models.geometry import (
        Goniometer,
        MonochromaticBeam,
        Scan,
        simple_panel,
    )

    theta = 0.25
    R = np.array(
        [
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1],
        ]
    )
    crystal = Crystal(
        R @ [CELL[0], 0, 0], R @ [0, CELL[1], 0], R @ [0, 0, CELL[2]]
    )
    return Experiment(
        beam=MonochromaticBeam(wavelength=WL),
        panel=simple_panel(
            distance_mm=DIST_MM,
            beam_center_px=(HW / 2.0, HW / 2.0),
            pixel_size_mm=(PIX_MM, PIX_MM),
            image_size=(HW, HW),
        ),
        goniometer=Goniometer(),
        scan=Scan(image_range=(1, N_IMG), oscillation=(0.0, 1.0)),
        crystal=crystal if with_crystal else None,
    )


def _render_frames(pred, rng):
    """Poisson background + localized Gaussian spots at the predictions.
    Returns (frames uint16, injected photon sum per prediction)."""
    frames = rng.poisson(5.0, size=(N_IMG, HW, HW)).astype(np.float64)
    injected = np.zeros(len(pred.xyzcal_px))
    wxy, wz = 8, 6
    for i, (px, py, pz) in enumerate(pred.xyzcal_px):
        amp = 8000.0 + 22000.0 * ((i * 2654435761) % 1000) / 1000.0
        x0, x1 = int(px) - wxy, int(px) + wxy + 1
        y0, y1 = int(py) - wxy, int(py) + wxy + 1
        yy, xx = np.mgrid[y0:y1, x0:x1]
        g2 = np.exp(-(((xx - px) ** 2 + (yy - py) ** 2) / (2 * SXY**2)))
        g2 /= 2 * np.pi * SXY**2
        for z in range(max(0, int(pz) - wz), min(N_IMG, int(pz) + wz + 1)):
            fz = np.exp(-((z + 0.5 - (pz + 0.5)) ** 2) / (2 * SZ**2)) / (
                np.sqrt(2 * np.pi) * SZ
            )
            spot = amp * fz * g2
            frames[z, y0:y1, x0:x1] += spot
            injected[i] += spot.sum()
    return np.round(frames).astype(np.uint16), injected


def _run(cmd, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(cmd, capture_output=True, cwd=cwd, env=env)
    assert proc.returncode == 0, (
        " ".join(map(str, cmd))
        + "\n"
        + proc.stdout.decode()
        + proc.stderr.decode()
    )
    return proc.stdout.decode()


@pytest.mark.slow
def test_full_chain(tmp_path, monkeypatch):
    from ffs_tpu.models.experiment import Experiment
    from ffs_tpu.models.reflection_table import ReflectionTable
    from ffs_tpu.prediction.rotation import predict_rotation

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(11)

    # ----- ground truth + frames -----------------------------------------
    truth = _make_experiment(with_crystal=True)
    pred = predict_rotation(truth, dmin=3.5, use_device=False)
    x, y, z = pred.xyzcal_px.T
    keep = (
        (x > 15) & (x < HW - 15) & (y > 15) & (y < HW - 15)
        & (z > 4.0) & (z < N_IMG - 5.0)
    )
    import types

    P = types.SimpleNamespace(xyzcal_px=pred.xyzcal_px[keep])
    assert len(P.xyzcal_px) > 100, "fixture must give a real spot list"
    frames, injected = _render_frames(P, rng)
    write_nexus(
        "images.nxs",
        frames,
        wavelength=WL,
        distance=DIST_MM / 1000.0,
        pixel_size=PIX_MM / 1000.0,
        beam_center=(HW / 2.0, HW / 2.0),
        oscillation=(0.0, 1.0),
    )

    # ----- stage 1: spotfinder ------------------------------------------
    log = _run(
        [
            sys.executable,
            "-m",
            "ffs_tpu.pipeline.spotfinder",
            "images.nxs",
            "--threads",
            "2",
            "--save-h5",
        ],
        tmp_path,
    )
    assert "Successfully wrote 3D reflections to HDF5 file" in log
    strong = ReflectionTable.read("results_ffs.h5")
    obs = np.asarray(strong["xyzobs.px.value"])
    # most injected spots found as 3D spots, centroids on the predictions
    d = np.linalg.norm(obs[:, None, :2] - P.xyzcal_px[None, :, :2], axis=-1)
    dz = np.abs(obs[:, None, 2] - P.xyzcal_px[None, :, 2])
    matched_obs = ((d < 1.5) & (dz < 1.0)).any(axis=0)
    assert matched_obs.mean() > 0.9, (
        f"only {matched_obs.sum()}/{len(matched_obs)} injected spots found"
    )

    # ----- stage 2: indexer ----------------------------------------------
    _make_experiment(with_crystal=False).save("imported.expt")
    ilog = _run(
        [
            sys.executable,
            "-m",
            "ffs_tpu.pipeline.indexer",
            "-e",
            "imported.expt",
            "-r",
            "results_ffs.h5",
            "--max-cell",
            "45",
        ],
        tmp_path,
    )
    assert "Saved experiment list to indexed.expt" in ilog
    indexed = Experiment.load("indexed.expt")
    got = np.array(indexed.crystal.unit_cell)
    np.testing.assert_allclose(np.sort(got[:3]), CELL, rtol=7e-3)
    np.testing.assert_allclose(got[3:], 90.0, atol=0.5)

    # ----- stage 3: integrator -------------------------------------------
    glog = _run(
        [
            sys.executable,
            "-m",
            "ffs_tpu.pipeline.integrator",
            "-r",
            "indexed.refl",
            "-e",
            "indexed.expt",
            "-i",
            "images.nxs",
        ],
        tmp_path,
    )
    assert "Saved integrated reflections to integrated.refl" in glog
    out = ReflectionTable.read("integrated.refl")
    from ffs_tpu.models.reflection_table import INTEGRATED_SUM

    valid = (np.asarray(out["flags"]) & INTEGRATED_SUM) != 0
    inten = np.asarray(out["intensity.sum.value"])
    xyz = np.asarray(out["xyzobs.px.value"])

    # match integrated reflections to the injected ground truth by the
    # OBSERVED centroid the integrator measured from the images
    dxy = np.linalg.norm(xyz[:, None, :2] - P.xyzcal_px[None, :, :2], axis=-1)
    dzz = np.abs(xyz[:, None, 2] - P.xyzcal_px[None, :, 2])
    cand = (dxy < 2.0) & (dzz < 1.5) & valid[:, None]
    rows = cand.any(axis=0)
    pick = np.where(cand, dxy, np.inf).argmin(axis=0)
    got_i = inten[pick[rows]]
    want_i = injected[rows]
    assert rows.mean() > 0.7, f"only {rows.sum()}/{len(rows)} integrated"
    r = np.corrcoef(got_i, want_i)[0, 1]
    assert r > 0.95, f"intensity correlation {r}"
    rel = np.abs(got_i - want_i) / want_i
    assert np.median(rel) < 0.2, f"median rel err {np.median(rel)}"
