"""Direct CBFRead tests over synthetic byte-offset files, plus the
XRC result-compare service core (reference: spotfinder/cbfread.cc,
src/ffs/compare_service.py)."""

import numpy as np
import pytest

from ffs_tpu.io.cbf import BINARY_MARKER, CBFRead, expand_template, is_ready_for_read
from ffs_tpu.service.compare import XRCCompareCore


def byte_offset_encode(values: np.ndarray) -> bytes:
    """Minimal CBF byte-offset encoder (deltas as 1/3/7-byte records)."""
    out = bytearray()
    prev = 0
    for v in map(int, values):
        d = v - prev
        prev = v
        if -127 <= d <= 127:
            out.append(d & 0xFF)
        elif -32767 <= d <= 32767:
            out.append(0x80)
            out += int(d).to_bytes(2, "little", signed=True)
        else:
            out.append(0x80)
            out += (-32768).to_bytes(2, "little", signed=True)
            out += int(d).to_bytes(4, "little", signed=True)
    return bytes(out)


@pytest.fixture
def cbf_files(tmp_path, rng):
    h, w = 48, 64
    frames = []
    for i in range(3):
        img = rng.integers(0, 3000, size=(h, w)).astype(np.int32)
        img[0, :4] = -1  # detector gap sentinel -> masked
        img[10, 10] = 40000  # exercises the 16-bit delta record
        frames.append(img)
        header = (
            b"###CBF: synthetic\r\n"
            b"X-Binary-Size-Fastest-Dimension: %d\r\n"
            b"X-Binary-Size-Second-Dimension: %d\r\n\r\n"
            % (w, h)
        )
        blob = header + BINARY_MARKER + byte_offset_encode(img.reshape(-1))
        (tmp_path / f"ins_1_{i + 1:04d}.cbf").write_bytes(blob)
    return tmp_path / "ins_1_####.cbf", frames


def test_expand_template():
    assert expand_template("a_####.cbf", 7) == "a_0007.cbf"
    assert expand_template("plain.cbf", 3) == "plain.cbf"


def test_cbf_read_roundtrip(cbf_files):
    template, frames = cbf_files
    r = CBFRead(str(template), num_images=3, first_index=1)
    assert r.image_shape == frames[0].shape
    for i in range(3):
        np.testing.assert_array_equal(r.get_image(i), frames[i])
    # mask from frame 0 negatives: 1 = valid (documented divergence from the
    # reference's inverted polarity)
    mask = r.get_mask()
    assert mask[0, 0] == 0 and mask[0, 4] == 1 and mask.sum() == mask.size - 4
    assert r.is_image_available(2) and not r.is_image_available(3)
    assert is_ready_for_read(str(template))


# --- XRC compare core (reference: compare_service.py:23-126) ----------------


class _FakeTransport:
    def __init__(self):
        self.acked, self.nacked = [], []

    def ack(self, header):
        self.acked.append(header)

    def nack(self, header, requeue=False):
        self.nacked.append((header, requeue))


class _FakeRW:
    def __init__(self, params, transport):
        self.recipe_step = {"parameters": params}
        self.transport = transport


def _result_message(n=1):
    return {
        "results": [
            {
                "centre_of_mass": [1.0, 2.0, 3.0],
                "max_voxel": [1, 2, 3],
                "max_count": 10,
                "n_voxels": 4,
                "total_count": 20,
                "bounding_box": [[0, 0, 0], [4, 4, 4]],
            }
        ]
        * n,
        "success": True,
        "type": "3d",
    }


def test_xrc_compare_pairs_and_acks():
    core = XRCCompareCore()
    t = _FakeTransport()
    core.compare_xrc(
        _FakeRW({"dcid": 7, "gpu": True}, t), {"id": "gpu"}, _result_message()
    )
    assert not t.acked  # first result waits for its partner
    core.compare_xrc(
        _FakeRW({"dcid": 7, "gpu": False}, t), {"id": "cpu"}, _result_message()
    )
    assert {h["id"] for h in t.acked} == {"gpu", "cpu"}
    assert not t.nacked


def test_xrc_compare_rejects_duplicate_side():
    core = XRCCompareCore()
    t = _FakeTransport()
    core.compare_xrc(
        _FakeRW({"dcid": 9, "gpu": True}, t), {"id": "g1"}, _result_message()
    )
    core.compare_xrc(
        _FakeRW({"dcid": 9, "gpu": True}, t), {"id": "g2"}, _result_message()
    )
    assert len(t.nacked) == 2 and not t.acked


def test_xrc_compare_rejects_invalid_message():
    core = XRCCompareCore()
    t = _FakeTransport()
    core.compare_xrc(_FakeRW({"dcid": 5}, t), {"id": "bad"}, {"nope": 1})
    assert t.nacked and not t.acked
