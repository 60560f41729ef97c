"""Device-decode ingestion: bitshuffle planes in, identical results out.

The --decode-backend device path (SpotfindProcessor.dispatch_batch_planes
+ reader get_image_planes + ops/bitshuffle_device) must be bit-identical
to host decode end-to-end: processor level, reader level, and through the
CLI over a real filter-32008 NeXus file.
"""

import os
import re
import subprocess
import sys

import numpy as np
import pytest

from ffs_tpu.io import compression

from .util import synthetic_rotation_stack, write_nexus


def _cfg():
    from ffs_tpu.spotfind import SpotfindConfig

    return SpotfindConfig(
        precision="f32",
        use_pallas=True,
        pallas_interpret=True,
        cc_backend="device",
        max_strong_pixels=4096,
        max_spots=2048,
        min_spot_size=1,
    )


def _planes_stack(stack):
    pls = []
    for frame in stack:
        chunk = compression.bshuf_lz4_compress(frame, frame.dtype.itemsize)
        planes, tail, _be, _ns = compression.bshuf_lz4_planes(
            chunk, frame.size, frame.dtype.itemsize
        )
        assert not tail  # multiple-of-8 frames
        pls.append(planes)
    return np.stack(pls)


def test_dispatch_batch_planes_matches_frames():
    """Same batch through planes and frames: every per-frame result field
    bit-identical."""
    from ffs_tpu.spotfind import SpotfindProcessor

    stack, mask = synthetic_rotation_stack()
    h, w = stack.shape[1:]
    proc = SpotfindProcessor(w, h, mask, 65535.0, _cfg())
    nums = list(range(stack.shape[0]))
    want = proc.collect_batch(
        nums, proc.dispatch_batch(stack), images=stack, want_com=True
    )
    got = proc.collect_batch(
        nums,
        proc.dispatch_batch_planes(_planes_stack(stack), dtype=np.uint16),
        images=stack,
        want_com=True,
    )
    for g, p in zip(got, want):
        assert g.n_strong_pixels == p.n_strong_pixels
        assert g.n_spots == p.n_spots
        np.testing.assert_array_equal(
            g.pixels.linear_index, p.pixels.linear_index
        )
        np.testing.assert_array_equal(g.pixels.intensity, p.pixels.intensity)
        np.testing.assert_array_equal(g.pixels.root, p.pixels.root)
        np.testing.assert_array_equal(g.centers_of_mass, p.centers_of_mass)
    assert sum(g.n_strong_pixels for g in got) > 0


def test_planes_guards():
    from ffs_tpu.spotfind import SpotfindProcessor

    stack, mask = synthetic_rotation_stack()
    h, w = stack.shape[1:]
    proc = SpotfindProcessor(w, h, mask, 65535.0, _cfg())
    with pytest.raises(ValueError, match="< frame size"):
        proc.dispatch_batch_planes(
            np.zeros((2, 1, 1024), dtype=np.uint8), dtype=np.uint16
        )


def test_nexus_get_image_planes_roundtrip(tmp_path):
    """Reader-level: get_image_planes + host untranspose == get_image on a
    real filter-32008 file; a gzip file returns None (host fallback)."""
    from ffs_tpu.io.nexus import NexusReader
    from ffs_tpu.ops.bitshuffle_device import planes_to_frame_host

    stack, mask = synthetic_rotation_stack(nimg=3)
    h, w = stack.shape[1:]
    p = tmp_path / "bshuf.nxs"
    write_nexus(p, stack, mask=mask, compression="bshuf")
    r = NexusReader(str(p))
    for i in range(3):
        np.testing.assert_array_equal(r.get_image(i), stack[i])
        planes = r.get_image_planes(i)
        assert planes is not None
        frame = (
            planes_to_frame_host(planes, h * w, 2)
            .view(np.uint16)
            .reshape(h, w)
        )
        np.testing.assert_array_equal(frame, stack[i])
    r.close()

    g = tmp_path / "gzip.nxs"
    write_nexus(g, stack, mask=mask)  # default gzip
    r = NexusReader(str(g))
    assert r.get_image_planes(0) is None
    np.testing.assert_array_equal(r.get_image(0), stack[0])
    r.close()


def test_shm_get_image_planes(tmp_path):
    import json

    from ffs_tpu.io.shm import SHMRead
    from ffs_tpu.ops.bitshuffle_device import planes_to_frame_host

    h, w = 64, 96
    rng = np.random.default_rng(3)
    frame = rng.integers(0, 4000, size=(h, w)).astype(np.uint16)
    header = {
        "nimages": 1,
        "ntrigger": 1,
        "y_pixels_in_detector": h,
        "x_pixels_in_detector": w,
        "bit_depth_image": 16,
        "countrate_correction_count_cutoff": 65530,
        "detector_distance": 250.0,
        "y_pixel_size": 7.5e-05,
        "x_pixel_size": 7.5e-05,
        "beam_center_y": 32.5,
        "beam_center_x": 48.5,
    }
    (tmp_path / "start_1").write_text(json.dumps(header))
    (tmp_path / "start_4").write_text("{}")
    (tmp_path / "start_5").write_bytes(np.zeros((h, w), np.int32).tobytes())
    blob = compression.bshuf_lz4_compress(frame, 2)
    (tmp_path / "image_000000_2").write_bytes(bytes(blob))
    r = SHMRead(str(tmp_path))
    planes = r.get_image_planes(0)
    got = planes_to_frame_host(planes, h * w, 2).view(np.uint16).reshape(h, w)
    np.testing.assert_array_equal(got, frame)


# ---------------------------------------------------------------------------
# CLI --decode-backend device
# ---------------------------------------------------------------------------


def _run_cli(args, cwd, env_extra=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.update(env_extra or {})
    cmd = [sys.executable, "-m", "ffs_tpu.pipeline.spotfinder", *args]
    return subprocess.run(cmd, capture_output=True, cwd=cwd, env=env)


@pytest.fixture(scope="module")
def bshuf_nexus(tmp_path_factory):
    d = tmp_path_factory.mktemp("nxs_bshuf")
    stack, mask = synthetic_rotation_stack()
    path = d / "rot.nxs"
    write_nexus(path, stack, oscillation=(0.0, 0.1), mask=mask,
                compression="bshuf")
    return path, stack


def test_cli_decode_device_matches_host(bshuf_nexus, tmp_path):
    """--decode-backend device on the batched interpret-mode packed path:
    per-pixel --validate mask comparisons identical to the host-decode
    batched run, no fallback notice."""
    path, stack = bshuf_nexus
    env = {"FFS_PALLAS_INTERPRET": "1"}
    base = _run_cli(
        [str(path), "--precision", "f32", "--validate", "--batch", "4"],
        tmp_path,
        env,
    )
    assert base.returncode == 0, base.stdout.decode() + base.stderr.decode()
    dev = _run_cli(
        [
            str(path),
            "--precision",
            "f32",
            "--validate",
            "--batch",
            "4",
            "--decode-backend",
            "device",
        ],
        tmp_path,
        env,
    )
    assert dev.returncode == 0, dev.stdout.decode() + dev.stderr.decode()
    dlog = dev.stdout.decode()
    assert "falling back to host decode" not in dlog
    val_re = r"Image\s+\d+: Compared:.*"
    base_val = sorted(re.findall(val_re, base.stdout.decode()))
    dev_val = sorted(re.findall(val_re, dlog))
    assert dev_val == base_val and len(dev_val) == stack.shape[0]


def test_cli_decode_device_fallback_notice(bshuf_nexus, tmp_path):
    """Without --batch the device decode downgrades loudly to host."""
    path, _ = bshuf_nexus
    env = {"FFS_PALLAS_INTERPRET": "1"}
    res = _run_cli(
        [
            str(path),
            "--precision",
            "f32",
            "--decode-backend",
            "device",
            "--min-spot-size",
            "1",
        ],
        tmp_path,
        env,
    )
    assert res.returncode == 0, res.stdout.decode() + res.stderr.decode()
    assert "falling back to host decode" in res.stdout.decode()
