"""SIGINT cooperative cancellation and capacity hard-fail behaviour.

Reference: spotfinder.cc:43-54,603 (first SIGINT stops intake, the
epilogue still runs; second exits immediately) and the loud saturation
errors (integrator.cc:1073-1096 analogue) instead of silent truncation.
"""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

from .util import synthetic_rotation_stack, write_nexus


def test_sigint_stops_intake_and_runs_epilogue(tmp_path):
    stack, mask = synthetic_rotation_stack()
    path = tmp_path / "rot.nxs"
    write_nexus(path, stack, oscillation=(0.0, 0.1), mask=mask)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # claim more images than exist with a long SWMR timeout: after the real
    # frames the CLI polls for the next image, which is when SIGINT lands
    proc = subprocess.Popen(
        [
            sys.executable,
            "-m",
            "ffs_tpu.pipeline.spotfinder",
            str(path),
            "--images",
            "50",
            "--timeout",
            "120",
            "--save-h5",
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        cwd=tmp_path,
        env=env,
        text=True,
    )
    # wait until every real frame has been reported, then interrupt
    seen = 0
    lines = []
    deadline = time.monotonic() + 300
    while seen < len(stack) and time.monotonic() < deadline:
        line = proc.stdout.readline()
        if not line:
            break
        lines.append(line)
        if "finished image" in line:
            seen += 1
    assert seen == len(stack), "".join(lines)
    proc.send_signal(signal.SIGINT)
    out, err = proc.communicate(timeout=240)
    log = "".join(lines) + out
    assert proc.returncode == 0, log + err
    assert "Interrupt received" in log
    # the 3D epilogue ran: merge + totals + HDF5 written
    assert "Calculated" in log
    assert "3D spot analysis complete" in log
    assert (tmp_path / "results_ffs.h5").exists()


def _overflow_frame(h=256, w=320):
    """A frame with isolated bright pixels everywhere -> ~1200 strong."""
    image = np.zeros((h, w), dtype=np.uint16)
    image[4:-4:8, 4:-4:8] = 500
    mask = np.ones((h, w), dtype=np.uint8)
    return image, mask


@pytest.mark.parametrize("cc_backend", ["host", "device"])
def test_capacity_overflow_hard_fails(cc_backend):
    from ffs_tpu.spotfind import SpotfindConfig, SpotfindProcessor

    image, mask = _overflow_frame()
    cfg = SpotfindConfig(
        precision="f32",
        cc_backend=cc_backend,
        max_strong_pixels=64,
        max_spots=256,
        min_spot_size=1,
    )
    proc = SpotfindProcessor(image.shape[1], image.shape[0], mask, 65535.0, cfg)
    with pytest.raises(RuntimeError, match="exceed the"):
        proc.process_frame(0, image)


def test_spot_table_overflow_hard_fails_device_cc():
    """The per-frame device-CC path must fail loudly when the component
    count exceeds max_spots (ids past max_spots fall in the dropped
    overflow segment), matching collect_batch's contract."""
    from ffs_tpu.spotfind import SpotfindConfig, SpotfindProcessor

    image, mask = _overflow_frame()  # ~1200 isolated single-pixel spots
    cfg = SpotfindConfig(
        precision="f32",
        cc_backend="device",
        max_strong_pixels=4096,
        max_spots=256,
        min_spot_size=1,
    )
    proc = SpotfindProcessor(image.shape[1], image.shape[0], mask, 65535.0, cfg)
    with pytest.raises(RuntimeError, match="exceed max_spots"):
        proc.process_frame(0, image)


def test_capacity_tier_escalation_still_works():
    """Counts between tiers pick the next tier automatically (no failure)."""
    from ffs_tpu.spotfind import SpotfindConfig, SpotfindProcessor

    image, mask = _overflow_frame()
    cfg = SpotfindConfig(
        precision="f32",
        cc_backend="host",
        max_strong_pixels=65536,
        max_spots=4096,
        min_spot_size=1,
    )
    proc = SpotfindProcessor(image.shape[1], image.shape[0], mask, 65535.0, cfg)
    res = proc.process_frame(0, image)
    assert res.n_strong_pixels == int((np.asarray(image) > 0).sum())
