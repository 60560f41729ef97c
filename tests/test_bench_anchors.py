"""bench.py hardware-anchor machinery: golden integrity + planted faults.

The bench compares the real chip's pixel list and every spot-table
column against the f64 host-oracle golden (VERDICT r4 item 2: count-only
anchors pass exactly the silent single-bit failure the v5e MXU showed).
These tests prove the comparator itself fails loudly on planted faults,
without needing TPU hardware.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


class _Table:
    """Minimal stand-in for the device SpotTable NamedTuple."""

    def __init__(self, golden, tag, frame, slots):
        n = len(golden[f"{tag}_n_pixels"])
        self.valid = np.zeros(slots, bool)
        self.valid[:n] = True
        self.z_min = np.full(slots, frame, np.int32)
        self.com_z = np.full(slots, frame + 0.5, np.float32)
        for col in (
            "n_pixels", "sum_intensity", "com_x", "com_y",
            "x_min", "x_max", "y_min", "y_max", "peak_x", "peak_y",
        ):
            g = golden[f"{tag}_{col}"]
            a = np.zeros(slots, g.dtype if g.dtype != np.float64 else np.float32)
            a[:n] = g.astype(a.dtype)
            setattr(self, col, a)


def _device_like(golden, tag, w, pitch, frame):
    y = golden[f"{tag}_y"].astype(np.int64)
    x = golden[f"{tag}_x"].astype(np.int64)
    lin = (y + frame * pitch) * w + x
    inten = golden[f"{tag}_intensity"].astype(np.int32)
    return lin, inten, _Table(golden, tag, frame, len(y) + 64)


@pytest.fixture(scope="module")
def golden():
    return bench._load_anchor_golden()


def test_golden_counts(golden):
    assert len(golden["img2_y"]) == 9506
    assert len(golden["img5_y"]) == 2388
    assert len(golden["img5_n_pixels"]) == 2311


@pytest.mark.parametrize("tag,frame", [("img2", 0), ("img5", 1)])
def test_bitparity_passes_on_golden(golden, tag, frame):
    w, hp = 4148, 4369
    lin, inten, table = _device_like(golden, tag, w, hp, frame)
    assert bench._check_anchor_bitparity(
        golden, tag, w, hp, frame, lin, inten, table
    ) == []


def test_planted_pixel_fault_fails(golden):
    w, hp = 4148, 4369
    lin, inten, table = _device_like(golden, "img2", w, hp, 0)
    inten = inten.copy()
    inten[1234] ^= 1  # single-bit intensity fault
    errs = bench._check_anchor_bitparity(
        golden, "img2", w, hp, 0, lin, inten, table
    )
    assert any("intensities differ" in e for e in errs)


def test_planted_coordinate_fault_fails(golden):
    w, hp = 4148, 4369
    lin, inten, table = _device_like(golden, "img2", w, hp, 0)
    lin = lin.copy()
    lin[77] += 1
    errs = bench._check_anchor_bitparity(
        golden, "img2", w, hp, 0, lin, inten, table
    )
    assert any("coordinate list differs" in e for e in errs)


def test_planted_table_fault_fails(golden):
    """The exact v5e failure class: one dropped product in one spot's
    sum while counts stay right."""
    w, hp = 4148, 4369
    lin, inten, table = _device_like(golden, "img5", w, hp, 1)
    table.sum_intensity = table.sum_intensity.copy()
    table.sum_intensity[5] += 1.0
    errs = bench._check_anchor_bitparity(
        golden, "img5", w, hp, 1, lin, inten, table
    )
    assert any("sum_intensity differs" in e for e in errs)


def test_planted_count_fault_fails(golden):
    w, hp = 4148, 4369
    lin, inten, table = _device_like(golden, "img2", w, hp, 0)
    errs = bench._check_anchor_bitparity(
        golden, "img2", w, hp, 0, lin[:-1], inten[:-1], table
    )
    assert any("pixel count" in e for e in errs)
