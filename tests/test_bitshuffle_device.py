"""On-device bitshuffle untranspose (ops/bitshuffle_device.py).

Contract: bshuf_lz4_decompress_device == bshuf_lz4_decompress bit-for-bit
on filter-32008 chunks (host LZ4 + device bit untranspose vs the all-host
codec), across element sizes, partial final blocks and raw <8-element
tails — the decompression-offload path the reference leaves as a TODO
(spotfinder.cc:823-842).
"""

import numpy as np
import pytest

from ffs_tpu.io import compression
from ffs_tpu.ops import bitshuffle_device


def _roundtrip(n_elem, elem_size, seed):
    rng = np.random.default_rng(seed)
    dtype = {1: np.uint8, 2: np.uint16, 4: np.uint32}[elem_size]
    info = np.iinfo(dtype)
    data = rng.integers(0, int(info.max) + 1, size=n_elem, dtype=dtype)
    # plant extremes: all-ones, MSB-only (sign hazard), zero
    if n_elem >= 3:
        data[0] = info.max
        data[1] = dtype(1) << (8 * elem_size - 1)
        data[2] = 0
    chunk = compression.bshuf_lz4_compress(data, elem_size)
    want = compression.bshuf_lz4_decompress(chunk, n_elem, elem_size)
    got = bitshuffle_device.bshuf_lz4_decompress_device(chunk, n_elem, elem_size)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got.view(dtype), data)


@pytest.mark.parametrize("elem_size", [1, 2, 4])
@pytest.mark.parametrize(
    "n_elem",
    [
        8,  # single 8-element group
        4096,  # exactly one block at elem_size 2
        4096 * 3,  # several full blocks
        10000,  # partial final block (multiple of 8)
        10007,  # partial final block + 7-element raw tail
        63,  # sub-group tail only path
    ],
)
def test_device_decode_matches_host(n_elem, elem_size):
    _roundtrip(n_elem, elem_size, seed=n_elem * 7 + elem_size)


def test_untranspose_planes_matches_numpy_oracle():
    """Layout-level check against the independent NumPy bit decoder."""
    rng = np.random.default_rng(5)
    block_elem = 4096
    for elem_size in (2, 4):
        raw = rng.integers(0, 256, size=(3, block_elem * elem_size), dtype=np.uint8)
        got = np.asarray(
            bitshuffle_device.untranspose_planes(raw, elem_size)
        )
        for b in range(3):
            want = compression.bitshuffle_decode_np(
                raw[b], block_elem, elem_size
            )
            np.testing.assert_array_equal(
                got[b].copy().view(np.uint8), want
            )


def test_untranspose_rejects_ragged_blocks():
    with pytest.raises(ValueError):
        bitshuffle_device.untranspose_planes(
            np.zeros((1, 12), dtype=np.uint8), 2
        )


def test_untranspose_to_wide_matches_ref():
    """The SWAR wide-element untranspose (u32-word planes in, one u32 per
    element out) is bit-identical to the reference loop formulation."""
    import numpy as np

    from ffs_tpu.ops.bitshuffle_device import (
        untranspose_planes_ref,
        untranspose_planes_to_wide,
    )

    rng = np.random.default_rng(7)
    for es in (1, 2, 4):
        planes = rng.integers(0, 256, size=(5, 256 * 8 * es), dtype=np.uint8)
        ref = np.asarray(untranspose_planes_ref(planes, es)).astype(np.uint32)
        wide = np.asarray(
            untranspose_planes_to_wide(planes.view(np.uint32), es)
        )
        assert np.array_equal(ref, wide)


def test_untranspose_swar_matches_ref():
    import numpy as np

    from ffs_tpu.ops.bitshuffle_device import (
        untranspose_planes_ref,
        untranspose_planes_swar,
    )

    rng = np.random.default_rng(8)
    for es in (1, 2, 4):
        planes = rng.integers(0, 256, size=(4, 512 * 8 * es), dtype=np.uint8)
        a = np.asarray(untranspose_planes_ref(planes, es))
        b = np.asarray(untranspose_planes_swar(planes, es))
        assert np.array_equal(a, b)
