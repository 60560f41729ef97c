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
    """Upstream bitshuffle stores the LSB plane in row 0.

    The AVX2 kernel (bitshuffle_core.c bshuf_trans_bit_byte_AVX) writes
    movemask(current MSB) to row 7-kk and shifts left, so row r holds bit
    plane r; within a row, element 8m+t lands at bit t of byte m.
    """
    # 8 single-byte elements, only element 0 has bit 7 set:
    # row 7 (bit plane 7) must contain byte 0b00000001, all other rows zero.
    data = np.array([0x80, 0, 0, 0, 0, 0, 0, 0], dtype=np.uint8)
    enc = comp.bitshuffle_encode_np(data, 1)
    assert enc[7] == 1 and not enc[:7].any()
    # element 3 with bit 0 set -> row 0 (LSB plane), bit position 3
    data = np.zeros(8, np.uint8)
    data[3] = 1
    enc = comp.bitshuffle_encode_np(data, 1)
    assert enc[0] == (1 << 3) and not enc[1:].any()


def test_bitshuffle_spec_vector_u16():
    """Hand-authored filter-32008 layout vector for 16-bit elements.

    Layout (per upstream bshuf_trans_bit_elem): byte-position-major sections
    (all low bytes of the LE u16s first), each section 8 bit-plane rows, LSB
    plane in row 0, element 8m+t at bit t of row byte m.
    """
    vals = np.array([1, 2, 4, 8, 16, 32, 64, 128], dtype="<u2")
    enc = comp.bitshuffle_encode_np(vals.view(np.uint8), 2)
    # section 0 = low bytes: element e has only bit e set -> row r byte is
    # the one-hot 1<<r (element r contributes bit r at bit position r).
    np.testing.assert_array_equal(enc[:8], (1 << np.arange(8)).astype(np.uint8))
    # section 1 = high bytes: all zero
    assert not enc[8:].any()

    vals = np.array([0x100, 0, 0, 0, 0, 0, 0, 0x8000], dtype="<u2")
    enc = comp.bitshuffle_encode_np(vals.view(np.uint8), 2)
    assert not enc[:8].any()  # low bytes all zero
    hi = enc[8:]
    # element 0 high-byte bit 0 -> section 1 row 0, bit pos 0
    # element 7 high-byte bit 7 -> section 1 row 7, bit pos 7
    assert hi[0] == 1 and hi[7] == (1 << 7) and not hi[1:7].any()
    # decode must invert
    dec = comp.bitshuffle_decode_np(enc, 8, 2)
    np.testing.assert_array_equal(dec.view("<u2"), vals)


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


@pytest.mark.parametrize("n_elem", [5, 56211, 4096 + 3])
def test_bshuf_lz4_upstream_tail_framing(rng, n_elem):
    """Upstream bitshuffle framing: the final n_elem % 8 elements are
    stored RAW after all length-prefixed LZ4 blocks (bitshuffle
    bshuf_blocked_wrap_fun), not folded into the last block.  Pin the
    byte-level framing and cross-decode native <-> NumPy."""
    data = rng.poisson(4, size=n_elem).astype(np.uint16)
    chunk = comp.bshuf_lz4_compress(data, 2)  # native when available
    tail_elems = n_elem % 8
    if tail_elems:
        # the chunk must END with the raw little-endian tail elements
        tail = np.frombuffer(chunk[-tail_elems * 2 :], "<u2")
        np.testing.assert_array_equal(tail, data[-tail_elems:])

    # native decode
    flat = comp.bshuf_lz4_decompress(chunk, n_elem, 2)
    np.testing.assert_array_equal(flat.view("<u2"), data)

    # NumPy decode of the (native-encoded) chunk — framing must agree
    block_bytes = int.from_bytes(chunk[8:12], "big")
    out = np.empty(n_elem * 2, np.uint8)
    payload = chunk[12:]
    done = 0
    i = 0
    n_shuf = n_elem - tail_elems
    block_elem = block_bytes // 2
    while done < n_shuf:
        this_elem = min(block_elem, n_shuf - done)
        comp_len = int.from_bytes(payload[i : i + 4], "big")
        i += 4
        raw = comp.lz4_decompress_block_np(
            payload[i : i + comp_len], this_elem * 2
        )
        i += comp_len
        out[done * 2 : done * 2 + this_elem * 2] = comp.bitshuffle_decode_np(
            np.frombuffer(bytes(raw), np.uint8), this_elem, 2
        )
        done += this_elem
    if tail_elems:
        out[n_shuf * 2 :] = np.frombuffer(payload[i : i + tail_elems * 2], np.uint8)
    np.testing.assert_array_equal(out.view("<u2"), data)
