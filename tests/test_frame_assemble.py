"""Pallas flat-stream -> frame relayout kernel (ops/frame_assemble).

Runs in Mosaic interpret mode on the CPU test platform; bit-parity
against a NumPy row-slicing oracle for detector-like widths (none
lane-aligned) including Eiger (4148) and Jungfrau (1030) widths.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ffs_tpu.ops.frame_assemble import frames_from_flat_wide, padded_width


@pytest.mark.parametrize(
    "h,w", [(16, 256), (37, 132), (40, 1030), (20, 4148), (9, 516)]
)
def test_frames_from_flat_wide_parity(h, w):
    rng = np.random.default_rng(h * 1000 + w)
    bsz = 2
    n = h * w
    npad = ((n + 127) // 128) * 128
    el = rng.integers(0, 65536, size=(bsz, npad), dtype=np.uint32)
    out = np.asarray(
        frames_from_flat_wide(jnp.asarray(el), h, w, interpret=True)
    )
    wp = padded_width(w)
    assert out.shape == (bsz, h, wp)
    flat = np.concatenate(
        [(el & 0xFFFF).astype(np.uint16),
         np.zeros((bsz, 40 * wp), np.uint16)], axis=1
    )
    exp = np.stack([flat[:, w * y : w * y + wp] for y in range(h)], axis=1)
    assert np.array_equal(out, exp)


def test_frames_from_flat_wide_values_only_low16():
    """High bits of the wide words must not leak into the u16 output."""
    rng = np.random.default_rng(0)
    bsz, h, w = 1, 16, 256
    el = rng.integers(0, 2**32, size=(bsz, h * w), dtype=np.uint32)
    out = np.asarray(
        frames_from_flat_wide(jnp.asarray(el), h, w, interpret=True)
    )
    assert np.array_equal(
        out.reshape(bsz, -1), (el & 0xFFFF).astype(np.uint16)
    )
