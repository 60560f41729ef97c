"""Native + NumPy codec round trips and cross-validation."""

import ctypes

import numpy as np
import pytest

from ffs_tpu.io import compression as comp
from ffs_tpu.utils.native import lib


def test_native_library_builds():
    assert lib() is not None, "native library must build in this environment"


def test_lz4_roundtrip_native_vs_python(rng):
    native = lib()
    data = rng.integers(0, 8, size=50000).astype(np.uint8)  # compressible
    data[1000:2000] = 7
    src = data.tobytes()
    cap = len(src) * 2 + 1024
    dst = np.empty(cap, np.uint8)
    n = native.ffs_lz4_compress_block(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_longlong(len(src)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_longlong(cap),
    )
    assert 0 < n < len(src)  # actually compressed
    # decode natively
    out = np.empty(len(src), np.uint8)
    m = native.ffs_lz4_decompress_block(
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_longlong(n),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_longlong(len(src)),
    )
    assert m == len(src)
    np.testing.assert_array_equal(out, data)
    # decode with the python oracle
    out2 = comp.lz4_decompress_block_np(bytes(dst[:n]), len(src))
    np.testing.assert_array_equal(np.frombuffer(bytes(out2), np.uint8), data)


@pytest.mark.parametrize("elem_size", [1, 2, 4])
def test_bitshuffle_native_matches_numpy(rng, elem_size):
    native = lib()
    n_elem = 1000  # deliberately not a multiple of 8
    data = rng.integers(0, 2 ** (8 * elem_size) - 1, size=n_elem).astype(
        {1: np.uint8, 2: np.uint16, 4: np.uint32}[elem_size]
    )
    flat = data.view(np.uint8)
    enc_np = comp.bitshuffle_encode_np(flat, elem_size)
    enc_nat = np.empty_like(flat)
    native.ffs_bitshuffle_encode(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        enc_nat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_longlong(n_elem),
        ctypes.c_longlong(elem_size),
    )
    np.testing.assert_array_equal(enc_nat, enc_np)

    dec = comp.bitshuffle_decode_np(enc_np, n_elem, elem_size)
    np.testing.assert_array_equal(dec, flat)


def test_bitshuffle_layout_convention():
    # 8 single-byte elements, only element 0 has bit 7 set:
    # row kk=0 (bit 7) must contain byte 0b00000001, all other rows zero.
    data = np.array([0x80, 0, 0, 0, 0, 0, 0, 0], dtype=np.uint8)
    enc = comp.bitshuffle_encode_np(data, 1)
    assert enc[0] == 1 and not enc[1:].any()
    # element 3 with bit 0 set -> last row (kk=7), bit position 3
    data = np.zeros(8, np.uint8)
    data[3] = 1
    enc = comp.bitshuffle_encode_np(data, 1)
    assert enc[7] == (1 << 3) and not enc[:7].any()


@pytest.mark.parametrize("dtype", [np.uint16, np.uint32])
def test_bshuf_lz4_chunk_roundtrip(rng, dtype):
    frame = rng.poisson(4, size=(123, 457)).astype(dtype)
    chunk = comp.bshuf_lz4_compress(frame, frame.dtype.itemsize)
    flat = comp.bshuf_lz4_decompress(chunk, frame.size, frame.dtype.itemsize)
    out = flat.view(dtype).reshape(frame.shape)
    np.testing.assert_array_equal(out, frame)


def test_byte_offset_roundtrip_and_oracle(rng):
    # values exercising all three delta widths
    vals = np.concatenate(
        [
            rng.integers(-100, 100, 500),
            rng.integers(-30000, 30000, 100),
            rng.integers(-(2**30), 2**30, 50),
        ]
    ).astype(np.int64)
    # encode per CBF spec
    out = bytearray()
    prev = 0
    for v in vals:
        d = int(v - prev)
        if -127 <= d <= 127:
            out += int(d & 0xFF).to_bytes(1, "little")
        elif -32767 <= d <= 32767:
            out += b"\x80" + int(d & 0xFFFF).to_bytes(2, "little")
        else:
            out += b"\x80" + b"\x00\x80" + int(d & 0xFFFFFFFF).to_bytes(4, "little")
        prev = v
    got = comp.byte_offset_decompress(bytes(out), len(vals))
    np.testing.assert_array_equal(got, vals.astype(np.int32))
    got_np = comp.byte_offset_decompress_np(bytes(out), len(vals))
    np.testing.assert_array_equal(got_np, vals.astype(np.int32))
