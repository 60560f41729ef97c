"""spotfinder CLI over a /dev/shm-style directory source.

The directory branch of _make_reader (is_ready_for_read wait + SHMRead,
reference: spotfinder.cc reader selection + shmread.cc) was only covered
at the reader level; this drives the console entry point over a real
stream dump, host- and device-decode.
"""

import json
import os
import re
import subprocess
import sys

import numpy as np
import pytest

from ffs_tpu.io import compression

PIXELS_RE = r"image\s+(\d+).*?(\d+)\s+strong pixels"


@pytest.fixture(scope="module")
def shm_stream(tmp_path_factory):
    d = tmp_path_factory.mktemp("shm_stream")
    h, w = 64, 96
    rng = np.random.default_rng(11)
    frames = rng.poisson(2.0, size=(3, h, w)).astype(np.uint16)
    frames[0, 10:13, 20:23] = 700
    frames[1, 40:42, 60:62] = 900
    header = {
        "nimages": 3,
        "ntrigger": 1,
        "y_pixels_in_detector": h,
        "x_pixels_in_detector": w,
        "bit_depth_image": 16,
        "countrate_correction_count_cutoff": 65530,
        "wavelength": 0.9762,
        "detector_distance": 250.0,
        "y_pixel_size": 7.5e-05,
        "x_pixel_size": 7.5e-05,
        "beam_center_y": 32.5,
        "beam_center_x": 48.5,
    }
    (d / "start_1").write_text(json.dumps(header))
    (d / "start_4").write_text("{}")
    (d / "start_5").write_bytes(np.zeros((h, w), np.int32).tobytes())
    for i in range(3):
        blob = compression.bshuf_lz4_compress(frames[i], 2)
        (d / f"image_{i:06d}_2").write_bytes(bytes(blob))
    return d, frames


def _run_cli(args, cwd, env_extra=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.update(env_extra or {})
    cmd = [sys.executable, "-m", "ffs_tpu.pipeline.spotfinder", *args]
    return subprocess.run(cmd, capture_output=True, cwd=cwd, env=env)


def _counts(log):
    return {
        int(m.group(1)): int(m.group(2)) for m in re.finditer(PIXELS_RE, log)
    }


def test_cli_reads_shm_directory(shm_stream, tmp_path):
    d, frames = shm_stream
    res = _run_cli([str(d), "--min-spot-size", "1"], tmp_path)
    assert res.returncode == 0, res.stdout.decode() + res.stderr.decode()
    got = _counts(res.stdout.decode())
    assert len(got) == 3 and got[0] > 0 and got[1] > 0

    # oracle: the f64 jnp dispersion on the same frames + open mask
    import jax.numpy as jnp

    from ffs_tpu.ops.dispersion import dispersion

    for i in range(3):
        want = int(
            np.asarray(
                dispersion(
                    jnp.asarray(frames[i]),
                    jnp.ones_like(frames[i], dtype=jnp.uint8),
                    65530.0,
                )
            ).sum()
        )
        assert got[i] == want, f"image {i}: {got[i]} != {want}"


def test_cli_shm_device_decode_matches_host(shm_stream, tmp_path):
    d, _ = shm_stream
    env = {"FFS_PALLAS_INTERPRET": "1"}
    base = _run_cli(
        [str(d), "--precision", "f32", "--batch", "2", "--min-spot-size", "1"],
        tmp_path,
        env,
    )
    assert base.returncode == 0, base.stdout.decode() + base.stderr.decode()
    dev = _run_cli(
        [
            str(d),
            "--precision",
            "f32",
            "--batch",
            "2",
            "--min-spot-size",
            "1",
            "--decode-backend",
            "device",
        ],
        tmp_path,
        env,
    )
    assert dev.returncode == 0, dev.stdout.decode() + dev.stderr.decode()
    assert "falling back to host decode" not in dev.stdout.decode()
    assert _counts(dev.stdout.decode()) == _counts(base.stdout.decode())
