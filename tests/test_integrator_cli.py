"""End-to-end integrator CLI on synthetic NeXus frames."""

import os
import subprocess
import sys

import numpy as np
import pytest

from ffs_tpu.models.crystal import Crystal
from ffs_tpu.models.experiment import Experiment
from ffs_tpu.models.geometry import Goniometer, MonochromaticBeam, Scan, simple_panel
from ffs_tpu.models.reflection_table import PREDICTED, ReflectionTable
from ffs_tpu.prediction.rotation import predict_rotation

from .test_integration import _SyntheticReader
from .util import write_nexus


@pytest.mark.slow
def test_integrator_cli(tmp_path, monkeypatch):
    crystal = Crystal([40.0, 0, 0], [0, 50.0, 0], [0, 0, 60.0])
    expt = Experiment(
        beam=MonochromaticBeam(wavelength=1.0),
        panel=simple_panel(120.0, (120.0, 130.0), (0.3, 0.3), (240, 260)),
        goniometer=Goniometer(),
        scan=Scan(image_range=(1, 12), oscillation=(0.0, 1.0)),
        crystal=crystal,
    )
    pred = predict_rotation(expt, dmin=4.0, use_device=False)
    x, y, z = pred.xyzcal_px.T
    keep = (x > 20) & (x < 220) & (y > 20) & (y < 240) & (z > 1.5) & (z < 10.5)

    import types

    P = types.SimpleNamespace(
        hkl=pred.hkl[keep],
        s1=pred.s1[keep],
        xyzcal_px=pred.xyzcal_px[keep],
        xyzcal_mm=pred.xyzcal_mm[keep],
    )
    reader = _SyntheticReader(expt, P)

    monkeypatch.chdir(tmp_path)
    write_nexus(
        "images.nxs",
        reader.frames.astype(np.uint16),
        wavelength=1.0,
        distance=0.12,
        pixel_size=0.3e-3,
        beam_center=(120.0, 130.0),
        oscillation=(0.0, 1.0),
    )
    expt.save("indexed.expt")
    table = ReflectionTable()
    table["miller_index"] = P.hkl.astype(np.int32)
    table["s1"] = P.s1
    table["xyzcal.mm"] = P.xyzcal_mm
    table["flags"] = np.full(len(P.hkl), PREDICTED, dtype=np.uint64)
    table["id"] = np.zeros(len(P.hkl), dtype=np.int64)
    table.write("predicted.refl")

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [
            sys.executable, "-m", "ffs_tpu.pipeline.integrator",
            "-r", "predicted.refl",
            "-e", "indexed.expt",
            "-i", "images.nxs",
            "--sigma_b", str(np.deg2rad(0.08)),
            "--sigma_m", str(np.deg2rad(0.4)),
            "--profile",
        ],
        capture_output=True,
        env=env,
    )
    assert r.returncode == 0, r.stdout.decode() + r.stderr.decode()
    log = r.stdout.decode()
    assert "Summation integration complete" in log
    # observability: occupancy histogram + per-stage breakdown (--profile)
    assert "Shoebox fill over" in log
    assert "window utilisation" in log
    assert "Stage breakdown:" in log
    for stage in ("sigma+predict", "kabsch", "background", "finalize+write"):
        assert stage in log

    out = ReflectionTable.read("integrated.refl")
    assert len(out) == len(P.hkl)
    for col in (
        "intensity.sum.value",
        "intensity.sum.variance",
        "partiality",
        "lp",
        "d",
        "background.mean",
        "num_pixels.foreground",
    ):
        assert col in out
    flags = np.asarray(out["flags"], np.uint64)
    valid = (flags & (1 << 8)) != 0
    assert valid.mean() > 0.9
    ratio = np.asarray(out["intensity.sum.value"])[valid] / reader.injected[valid]
    assert np.median(ratio) > 0.7


def test_shoebox_fill_histogram_format():
    from ffs_tpu.integration.kabsch import format_shoebox_fill_histogram

    # two reflections: a full 8x8 box 3 images deep, a 2x2 box 1 deep
    # (z_max EXCLUSIVE, matching extent.py / the act_f frame condition)
    bboxes = np.array(
        [[0, 7, 0, 7, 0, 3], [10, 11, 10, 11, 0, 1], [0, -1, 0, -1, 0, 0]]
    )
    s = format_shoebox_fill_histogram(bboxes, 8, 8, 512)
    assert "Shoebox fill over 4 reflection-image slices" in s
    assert "8x8 padded windows, 512/step" in s
    assert ">=75%" in s and "<10%" in s
    assert "window utilisation" in s
    # skipped (empty) bbox rows contribute nothing
    assert "(3)" in s  # the 3 full-box slices land in the >=75% bucket
    # all-empty input -> empty string
    assert format_shoebox_fill_histogram(np.array([[0, -1, 0, -1, 0, 0]]), 8, 8, 1) == ""


def test_glm_vs_tukey_background_cli_option():
    # estimate_background dispatch sanity
    from ffs_tpu.integration.background import estimate_background

    rng = np.random.default_rng(0)
    vals = rng.poisson(6.0, size=400)
    bins = np.bincount(vals, minlength=256)[None, :256]
    for model in ("tukey", "glm", "constant", "dials"):
        mean, _, valid = estimate_background(bins, np.zeros(1, int), model)
        assert valid[0] and abs(mean[0] - 6.0) < 1.0


def test_bg_device_dispatch_matches_host():
    from ffs_tpu.integration.background import estimate_background
    from ffs_tpu.integration.background_jax import estimate_background_device

    rng = np.random.default_rng(1)
    bins = np.zeros((16, 256), np.int64)
    for i in range(16):
        vals = rng.poisson(rng.uniform(2, 60), size=200).clip(0, 255)
        np.add.at(bins[i], vals, 1)
    ovf = rng.integers(0, 2, 16)
    for model in ("tukey", "glm"):
        mh, wh, vh = estimate_background(bins, ovf, model)
        md, wd, vd = estimate_background_device(bins, ovf, model)
        np.testing.assert_array_equal(np.asarray(vd), vh)
        np.testing.assert_allclose(np.asarray(md), mh, rtol=1e-12, atol=1e-12)


def test_streaming_reader_waits_prefetches_and_times_out():
    """The CLI's --timeout/--threads facade: waits for frames a live
    collection hasn't written yet, prefetches ahead on the decode pool,
    and raises TimeoutError past the budget (reference: the integrator's
    reader threads, integrator.cc:820-991)."""
    import time

    from ffs_tpu.pipeline.integrator import _StreamingReader

    class _LateReader:
        def __init__(self):
            self.t0 = time.monotonic()
            self.fetched = []

        def is_image_available(self, n):
            # frame 1 "appears" 0.3 s into the run
            return n != 1 or time.monotonic() >= self.t0 + 0.3

        def get_image(self, n):
            self.fetched.append(n)
            return np.full((4, 4), n, np.uint16)

        def get_mask(self):
            return None

        def get_number_of_images(self):
            return 3

    r = _LateReader()
    s = _StreamingReader(r, range(3), timeout=5.0, threads=2)
    for n in range(3):
        assert s.get_image(n)[0, 0] == n
    s.close()
    assert sorted(r.fetched) == [0, 1, 2]

    class _NeverReader(_LateReader):
        def is_image_available(self, n):
            return False

    s2 = _StreamingReader(_NeverReader(), range(1), timeout=0.3, threads=0)
    with pytest.raises(TimeoutError, match="waiting for image 0"):
        s2.get_image(0)
