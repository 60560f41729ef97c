"""Direct SHMRead tests over a tmpdir fake /dev/shm Eiger stream.

Exercises the start_1 JSON header, start_5 int32 mask (non-zero = masked,
inverted on read), image_%06d_2 bshuf-LZ4 blobs, and the start_4 readiness
gate (reference: spotfinder/shmread.cc:13-95).
"""

import json

import numpy as np
import pytest

from ffs_tpu.io import compression
from ffs_tpu.io.shm import SHMRead, is_ready_for_read


@pytest.fixture
def shm_dir(tmp_path, rng):
    h, w = 64, 96
    header = {
        "nimages": 3,
        "ntrigger": 2,
        "y_pixels_in_detector": h,
        "x_pixels_in_detector": w,
        "bit_depth_image": 16,
        "countrate_correction_count_cutoff": 65530,
        "wavelength": 0.9762,
        "detector_distance": 250.0,  # mm in the stream header
        "y_pixel_size": 7.5e-05,
        "x_pixel_size": 7.5e-05,
        "beam_center_y": 32.5,
        "beam_center_x": 48.5,
        "omega_start": 10.0,
        "omega_increment": 0.1,
    }
    (tmp_path / "start_1").write_text(json.dumps(header))
    (tmp_path / "start_2").write_text("{}")
    (tmp_path / "start_4").write_text("{}")

    raw_mask = np.zeros((h, w), np.int32)
    raw_mask[:2, :] = 1  # masked rows (non-zero = masked in the stream)
    raw_mask[:, -3:] = 4
    (tmp_path / "start_5").write_bytes(raw_mask.tobytes())

    frames = rng.integers(0, 4000, size=(4, h, w)).astype(np.uint16)
    for i in range(4):
        blob = compression.bshuf_lz4_compress(frames[i], 2)
        (tmp_path / f"image_{i:06d}_2").write_bytes(bytes(blob))
    return tmp_path, frames, raw_mask


def test_shm_header_fields(shm_dir):
    path, _, _ = shm_dir
    r = SHMRead(str(path))
    assert r.get_number_of_images() == 6  # nimages * ntrigger
    assert r.image_shape == (64, 96)
    assert r.get_element_size() == 2
    assert r.get_trusted_range() == (0, 65530)
    assert r.get_wavelength() == pytest.approx(0.9762)
    assert r.get_detector_distance() == pytest.approx(0.25)  # mm -> m
    assert r.get_pixel_size() == (pytest.approx(7.5e-05), pytest.approx(7.5e-05))
    assert r.get_beam_center() == (pytest.approx(32.5), pytest.approx(48.5))
    assert r.get_oscillation() == (pytest.approx(10.0), pytest.approx(0.1))


def test_shm_mask_polarity_inverted(shm_dir):
    path, _, raw_mask = shm_dir
    r = SHMRead(str(path))
    mask = r.get_mask()
    # stream: non-zero = masked; reader: 1 = valid (reference inverts: !v)
    np.testing.assert_array_equal(mask, (raw_mask == 0).astype(np.uint8))


def test_shm_image_roundtrip(shm_dir):
    path, frames, _ = shm_dir
    r = SHMRead(str(path))
    for i in range(4):
        np.testing.assert_array_equal(r.get_image(i), frames[i])


def test_shm_availability_and_readiness(shm_dir, tmp_path_factory):
    path, _, _ = shm_dir
    r = SHMRead(str(path))
    assert r.is_image_available(3)
    assert not r.is_image_available(4)
    assert is_ready_for_read(str(path))
    # readiness requires start_1 AND start_4
    empty = tmp_path_factory.mktemp("empty_shm")
    assert not is_ready_for_read(str(empty))
    (empty / "start_1").write_text("{}")
    assert not is_ready_for_read(str(empty))


def test_shm_bad_mask_size_raises(shm_dir):
    path, _, _ = shm_dir
    (path / "start_5").write_bytes(b"\x00" * 16)
    with pytest.raises(RuntimeError, match="Mask file does not match"):
        SHMRead(str(path))


def test_shm_unhandled_bit_depth_raises(shm_dir):
    path, _, _ = shm_dir
    hdr = json.loads((path / "start_1").read_text())
    hdr["bit_depth_image"] = 8
    (path / "start_1").write_text(json.dumps(hdr))
    with pytest.raises(RuntimeError, match="unhandled bit-depth"):
        SHMRead(str(path))
