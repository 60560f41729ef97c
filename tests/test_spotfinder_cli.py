"""End-to-end spotfinder CLI tests on synthetic NeXus data."""

import json
import os
import re
import subprocess
import sys

import numpy as np
import pytest

from .util import synthetic_rotation_stack, write_nexus

PIXELS_RE = r"image\s+(\d+).*?(\d+)\s+strong pixels"
SPOTS_RE = r"Calculated\s+(\d+)\s+spots"


def _run_cli(args, cwd, pipe=False):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    cmd = [sys.executable, "-m", "ffs_tpu.pipeline.spotfinder", *args]
    if not pipe:
        return subprocess.run(cmd, capture_output=True, cwd=cwd, env=env), None
    r, w = os.pipe()
    os.set_inheritable(w, True)
    proc = subprocess.run(
        cmd + ["--pipe_fd", str(w)],
        capture_output=True,
        cwd=cwd,
        env=env,
        close_fds=False,
        pass_fds=(w,),
    )
    os.close(w)
    with os.fdopen(r) as f:
        lines = [json.loads(line) for line in f if line.strip()]
    return proc, lines


@pytest.fixture(scope="module")
def rotation_nexus(tmp_path_factory):
    d = tmp_path_factory.mktemp("nxs")
    stack, mask = synthetic_rotation_stack()
    path = d / "rot.nxs"
    write_nexus(path, stack, oscillation=(0.0, 0.1), mask=mask)
    return path, stack, mask


def test_rotation_end_to_end(rotation_nexus, tmp_path):
    path, stack, mask = rotation_nexus
    proc, pipe_lines = _run_cli(
        [str(path), "--threads", "2", "--save-h5"], tmp_path, pipe=True
    )
    assert proc.returncode == 0, proc.stdout.decode() + proc.stderr.decode()
    log = proc.stdout.decode()

    # expected per-image strong pixel counts from the oracle
    from ffs_tpu.ops import reference as ref

    trusted_max = 65535.0
    per_image = {
        z: int(ref.dispersion(stack[z], mask, trusted_max).sum())
        for z in range(stack.shape[0])
    }
    found = {
        int(m.group(1)): int(m.group(2))
        for m in re.finditer(PIXELS_RE, log)
    }
    assert found == per_image

    # pipe JSON per frame
    assert len(pipe_lines) == stack.shape[0]
    by_frame = {line["file-number"]: line for line in pipe_lines}
    for z, n in per_image.items():
        assert by_frame[z]["num_strong_pixels"] == n

    # 3D spots vs scipy reference
    from scipy import ndimage

    strong = np.stack(
        [ref.dispersion(stack[z], mask, trusted_max) for z in range(len(stack))]
    )
    s6 = np.zeros((3, 3, 3), int)
    s6[1] = [[0, 1, 0], [1, 1, 1], [0, 1, 0]]
    s6[0, 1, 1] = s6[2, 1, 1] = 1
    labels, n3d = ndimage.label(strong, structure=s6)
    m = re.search(SPOTS_RE, log)
    assert m and int(m.group(1)) == n3d

    # HDF5 output exists with xyzobs + variance columns
    import h5py

    with h5py.File(tmp_path / "results_ffs.h5") as f:
        g = f["dials/processing/group_0"]
        coms = g["xyzobs.px.value"][()]
        assert coms.shape[1] == 3
        assert "sigma_b_variance" in g and "spot_extent_z" in g
        assert list(g.attrs["experiment_ids"]) == [0]

    # COM of the brightest kept spot is near a planted spot centre (+0.5 conv)
    dists = np.min(
        np.linalg.norm(
            coms[:, :2][:, None, :]
            - np.array([[30.5, 20.5], [90.5, 60.5], [40.5, 75.5]])[None, :, :],
            axis=-1,
        ),
        axis=1,
    )
    assert (dists < 1.5).any()


def test_still_save_h5(tmp_path):
    stack, mask = synthetic_rotation_stack(nimg=3)
    path = tmp_path / "still.nxs"
    write_nexus(path, stack, oscillation=None, mask=mask)
    proc, _ = _run_cli(
        [str(path), "--save-h5", "--min-spot-size", "1"], tmp_path
    )
    log = proc.stdout.decode()
    assert proc.returncode == 0, log + proc.stderr.decode()
    assert "Still set" in log
    m = re.search(r"Successfully wrote\s+(\d+)\s+2D reflections", log)
    assert m and int(m.group(1)) > 0
    import h5py

    with h5py.File(tmp_path / "results_ffs.h5") as f:
        g = f["dials/processing/group_0"]
        ids = g["id"][()]
        # one experiment id per image
        assert set(np.unique(ids)) <= {0, 1, 2}
        assert len(g.attrs["experiment_ids"]) == 3
        # all z centroids at 0.5 (2D convention)
        assert np.allclose(g["xyzobs.px.value"][()][:, 2], 0.5)


def test_bit_depth_renegotiation(tmp_path):
    stack = np.zeros((2, 32, 48), dtype=np.uint32)
    path = tmp_path / "u32.nxs"
    write_nexus(path, stack)
    proc, _ = _run_cli([str(path)], tmp_path)
    assert proc.returncode == 32  # service relaunch protocol
    # and the 32-bit entry accepts it
    proc, _ = _run_cli([str(path), "--pixel-depth", "32"], tmp_path)
    assert proc.returncode == 0, proc.stdout.decode() + proc.stderr.decode()


def test_validate_mode(tmp_path):
    stack, mask = synthetic_rotation_stack(nimg=2)
    path = tmp_path / "val.nxs"
    write_nexus(path, stack, oscillation=(0.0, 0.1), mask=mask)
    proc, _ = _run_cli([str(path), "--validate"], tmp_path)
    log = proc.stdout.decode()
    assert proc.returncode == 0, log + proc.stderr.decode()
    assert log.count("Compared: Match") == 2


def test_validate_pixel_exact_catches_swapped_pixels(small_frame):
    """Equal counts with swapped pixels must FAIL validation (the reference
    compares the full mask per image: spotfinder.cc:1011-1053)."""
    from ffs_tpu.ops import reference as ref
    from ffs_tpu.pipeline.spotfinder import validate_strong_pixels

    image, mask = small_frame
    h, w = image.shape
    tm = float(np.iinfo(np.uint16).max)
    want = np.asarray(ref.dispersion(image, mask, tm), dtype=bool)
    lin = np.flatnonzero(want.reshape(-1))
    assert len(lin) > 2

    ok, msg = validate_strong_pixels(image, mask, tm, "dispersion", lin, h, w, 0)
    assert ok and "Match" in msg

    # swap one strong pixel for a non-strong one: count unchanged
    non_strong = np.flatnonzero(~want.reshape(-1) & (mask.reshape(-1) != 0))
    perturbed = lin.copy()
    perturbed[0] = non_strong[0]
    ok, msg = validate_strong_pixels(
        image, mask, tm, "dispersion", perturbed, h, w, 3
    )
    assert not ok
    assert "Mismatch" in msg and "first differing pixel" in msg
    # reported coordinate is a real difference
    import re

    mx, my = map(int, re.search(r"x=(\d+) y=(\d+)", msg).groups())
    got = np.zeros((h, w), dtype=bool)
    got.reshape(-1)[perturbed] = True
    assert got[my, mx] != want[my, mx]


def test_decode_threads_equivalence(rotation_nexus, tmp_path):
    """--threads N (decode pool) must produce identical per-image results
    to the serial reader, in order (reference: N reader threads,
    spotfinder.cc:724-855)."""
    path, _, _ = rotation_nexus
    out = {}
    for n in (1, 4):
        proc, _ = _run_cli([str(path), "--threads", str(n)], tmp_path)
        assert proc.returncode == 0, proc.stdout.decode() + proc.stderr.decode()
        out[n] = re.findall(PIXELS_RE, proc.stdout.decode())
    assert out[1] == out[4] and len(out[1]) > 0


def test_profile_mode_prints_stage_timings(rotation_nexus, tmp_path):
    path, _, _ = rotation_nexus
    proc, _ = _run_cli([str(path), "--profile", "--images", "2"], tmp_path)
    assert proc.returncode == 0, proc.stdout.decode() + proc.stderr.decode()
    log = proc.stdout.decode()
    assert "upload:" in log and "ms" in log
    # per-image breakdown appears for every image
    assert log.count("upload:") == 2


def test_jax_profile_writes_device_trace(rotation_nexus, tmp_path):
    """--jax-profile captures a jax.profiler trace of the collection loop
    (the TPU analogue of the reference's Nsight kernel profiling)."""
    path, _, _ = rotation_nexus
    trace_dir = tmp_path / "trace"
    proc, _ = _run_cli(
        [str(path), "--images", "2", "--jax-profile", str(trace_dir)],
        tmp_path,
    )
    assert proc.returncode == 0, proc.stdout.decode() + proc.stderr.decode()
    assert "JAX device trace written" in proc.stdout.decode()
    plane_files = list(trace_dir.rglob("*.xplane.pb"))
    assert plane_files, f"no xplane.pb under {trace_dir}"
