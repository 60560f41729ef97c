"""On-device bitshuffle untranspose (decompression offload).

The reference decodes bitshuffle-LZ4 chunks entirely on host CPUs and
carries an explicit TODO to offload decompression (reference:
spotfinder/spotfinder.cc:823-842, "we will want to offload this").  LZ4
is a sequential byte-oriented format and stays on the host (csrc
ffs_lz4_decompress_block, GIL-released, thread-pooled) — but the second
half of the filter, the bit-plane untranspose, is a pure data-parallel
bit rearrangement and maps naturally onto the TPU VPU: 8*elem_size
unrolled shift/mask/or passes over the plane buffer, no gathers, no
data-dependent control flow.  This halves the host-side decode work per
frame (the bit transpose costs about as much as LZ4 in the scalar codec)
at the price of ~n_elem*4 bytes of extra VPU traffic, and the uploaded
byte count is unchanged (the plane buffer is exactly the decoded frame
size).

Bitshuffle block layout (upstream bshuf_trans_bit_elem framing, the same
layout io/compression.py's host codec implements): a block of n8
elements (n8 % 8 == 0) of elem_size S bytes is stored as an
(S, 8, n8/8)-byte array where byte [s, kk, m] holds bit kk of byte s of
elements 8m..8m+7 — bit t of that byte belongs to element 8m+t (LSB
plane first).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def untranspose_planes_ref(planes, elem_size: int, out_dtype=None):
    """Reference inverse bitshuffle (the original 8*elem_size-pass
    shift/mask/or formulation).  Kept as the cross-check oracle for the
    butterfly production path below; bit-identical by test."""
    if out_dtype is None:
        out_dtype = {1: jnp.uint8, 2: jnp.uint16, 4: jnp.uint32}[elem_size]
    n_blocks, block_bytes = planes.shape
    if block_bytes % (8 * elem_size):
        raise ValueError(
            f"block of {block_bytes} bytes is not a whole number of "
            f"8-element groups at elem_size {elem_size}"
        )
    m = block_bytes // (8 * elem_size)  # byte-groups of 8 elements
    # (B, S, 8, M): byte s, bit-plane kk, element-group m
    p = planes.reshape(n_blocks, elem_size, 8, m)
    t = jnp.arange(8, dtype=jnp.uint32)  # element-within-group
    # accumulate in uint32 (bit 31 of a u32 element must not sign-flip)
    out = jnp.zeros((n_blocks, m, 8), dtype=jnp.uint32)
    for s in range(elem_size):
        for kk in range(8):
            plane = p[:, s, kk, :].astype(jnp.uint32)
            bit = (plane[:, :, None] >> t) & jnp.uint32(1)
            out = out | (bit << np.uint32(8 * s + kk))
    # element index e = 8*m + t: reshape (B, M, 8) -> (B, M*8)
    return out.reshape(n_blocks, m * 8).astype(out_dtype)


def _transpose8(r):
    """8x8 bit-matrix transpose of 8 stacked byte planes, vectorised.

    r: list of 8 u32 arrays (same shape), each holding one byte plane in
    its low 8 bits.  Returns (x, y): u32 arrays whose byte t (x: t=0..3,
    y: t=4..7) is the transposed byte c_t with bit kk = bit t of r[kk].

    Three delta-swap butterfly steps (the classic 64-bit flip-diagonal
    split across two u32 words) replace the 8-pass bit extraction: ~5x
    less VPU traffic than one shift/mask/or pass per (byte, bit) pair,
    which is what makes the device untranspose cheap enough to sit inside
    the ingest-inclusive spotfind program (bench.py).
    """
    x = r[0] | (r[1] << 8) | (r[2] << 16) | (r[3] << 24)
    y = r[4] | (r[5] << 8) | (r[6] << 16) | (r[7] << 24)

    def step(w, sh, mask):
        t = (w ^ (w >> sh)) & np.uint32(mask)
        return w ^ t ^ (t << sh)

    x = step(x, 7, 0x00AA00AA)
    y = step(y, 7, 0x00AA00AA)
    x = step(x, 14, 0x0000CCCC)
    y = step(y, 14, 0x0000CCCC)
    t = (x ^ (y << 4)) & np.uint32(0xF0F0F0F0)
    return x ^ t, y ^ (t >> 4)


def _bytes_of(x, y, shape):
    """(x, y) u32 word pair -> (..., 8) u8 byte tensor (byte t of the
    conceptual 64-bit word at last-axis position t; little-endian bitcast)."""
    w = jnp.stack([x, y], axis=-1)  # (..., 2) u32
    return jax.lax.bitcast_convert_type(w, jnp.uint8).reshape(*shape, 8)


def untranspose_planes(planes, elem_size: int, out_dtype=None):
    """Inverse bitshuffle of stacked equal-size blocks, on device.

    planes: (n_blocks, block_elem * elem_size) uint8 — the LZ4-decoded but
    still bit-transposed block bodies (pad a partial final block with
    zeros; the pad decodes to zero elements the caller slices off).
    Returns (n_blocks, block_elem) of out_dtype (default: the unsigned
    dtype of elem_size).

    Butterfly formulation: per output byte s, the 8 bit planes form an
    8x8 bit matrix per element group, transposed in 3 delta-swap steps on
    packed u32 words (_transpose8) instead of 8 extract/or passes —
    bit-identical to untranspose_planes_ref (tests/test_decode_device.py,
    tests/test_bitshuffle_device.py) at ~5x less VPU traffic.
    """
    if out_dtype is None:
        out_dtype = {1: jnp.uint8, 2: jnp.uint16, 4: jnp.uint32}[elem_size]
    n_blocks, block_bytes = planes.shape
    if block_bytes % (8 * elem_size):
        raise ValueError(
            f"block of {block_bytes} bytes is not a whole number of "
            f"8-element groups at elem_size {elem_size}"
        )
    m = block_bytes // (8 * elem_size)  # byte-groups of 8 elements
    # (B, S, 8, M): byte s, bit-plane kk, element-group m
    p = planes.reshape(n_blocks, elem_size, 8, m)
    per_s = []
    for s in range(elem_size):
        r = [p[:, s, kk, :].astype(jnp.uint32) for kk in range(8)]
        x, y = _transpose8(r)
        per_s.append(_bytes_of(x, y, (n_blocks, m)))  # (B, M, 8) u8
    if elem_size == 1:
        out = per_s[0]
    else:
        # byte-interleave the per-s byte tensors into typed elements via
        # ONE little-endian bitcast (pure relayout, fused by XLA)
        stacked = jnp.stack(per_s, axis=-1)  # (B, M, 8, S) u8
        out = jax.lax.bitcast_convert_type(stacked, out_dtype)
    return out.reshape(n_blocks, m * 8).astype(out_dtype)


def _swar_level(rows, bit: int, sh: int, mlo: int, mhi: int):
    """One delta-swap level of the array-level 8x8 bit transpose.

    rows: (N, 8, L) u32 — 8 bit-plane rows, lane dim L.  Pairs rows whose
    index differs in ``bit`` (0 = distance 4 ... 2 = distance 1) and
    swaps the complementary bit-field halves (byte-local masks, so every
    op is a full-width u32 VPU op with the lane dim untouched).
    """
    n, _, L = rows.shape
    g = rows.reshape(n, 2, 2, 2, L)
    ax = 1 + bit
    a = jax.lax.index_in_dim(g, 0, axis=ax, keepdims=False)
    b = jax.lax.index_in_dim(g, 1, axis=ax, keepdims=False)
    na = (a & np.uint32(mlo)) | ((b << sh) & np.uint32(mhi))
    nb = ((a >> sh) & np.uint32(mlo)) | (b & np.uint32(mhi))
    return jnp.stack([na, nb], axis=ax).reshape(n, 8, L)


def _transpose8_rows(rows):
    """Full 8x8 bit transpose of (N, 8, L) u32 byte-plane rows (SWAR: the
    4 bytes of every u32 transpose independently).  Row kk bit t of byte
    r moves to row t bit kk of byte r."""
    rows = _swar_level(rows, 0, 4, 0x0F0F0F0F, 0xF0F0F0F0)
    rows = _swar_level(rows, 1, 2, 0x33333333, 0xCCCCCCCC)
    return _swar_level(rows, 2, 1, 0x55555555, 0xAAAAAAAA)


def untranspose_planes_to_wide(planes32, elem_size: int):
    """u32-word planes -> WIDE elements (one per u32), flat order.

    planes32: (n_blocks, 8 * elem_size * L) u32 — the plane buffer
    VIEWED as little-endian u32 words (a free host-side ``view``; never
    upload u8 planes and bitcast on device: the TPU's sublane-packed u8
    tiling makes that bitcast a ~1 ms/frame relayout).
    Returns (n_blocks, block_elem) u32 with each element's value in the
    low bits — the form ops/frame_assemble.frames_from_flat_wide and a
    final narrowing convert consume.
    """
    n_blocks, nw = planes32.shape
    S = elem_size
    L = nw // (8 * S)
    P = planes32.reshape(n_blocks, 8 * S, L)
    # slice/stack levels measured FASTER than the roll+select form at
    # Eiger batch scale (0.92 vs 1.70 ms/frame — the rolls did not fuse)
    Pr = P.reshape(n_blocks, S, 8, L)
    qs = [_transpose8_rows(Pr[:, s]) for s in range(S)]
    parts = []
    for r in range(4):

        def byte(t, s):
            return (qs[s][:, t] >> np.uint32(8 * r)) & np.uint32(0xFF)

        for_r = []
        for t in range(8):
            v = byte(t, 0)
            for s in range(1, S):
                v = v | (byte(t, s) << np.uint32(8 * s))
            for_r.append(v)
        parts.append(jnp.stack(for_r, axis=-1))  # (N, L, 8t)
    o32 = jnp.stack(parts, axis=-2)  # (N, L, 4r, 8t)
    # Barrier at the per-block shape: letting XLA see through the
    # (N, 4096) -> (B, N*4096) merge that callers do next entangles this
    # producer with the frame-assembly kernel's input copy and the
    # composed program runs 3x slower than the sum of its parts (8.5 vs
    # 2.9 ms/frame, Eiger batch).  Must sit BEFORE any caller reshape.
    return jax.lax.optimization_barrier(o32.reshape(n_blocks, L * 32))


def untranspose_planes_swar(planes, elem_size: int, out_dtype=None):
    """Inverse bitshuffle via the SWAR array-level butterfly.

    Keeps the data as u32 words end-to-end: the plane buffer is bitcast
    to (N, n_planes=8*S, L) u32 words (lane dim = words of 4 consecutive
    element-groups), the 8x8 bit transpose runs as three delta-swap
    levels over full-width u32 rows (_transpose8_rows), and the final
    element interleave is byte shifts + one (jw, r, g) reshape.  No u8
    intermediates, no per-(byte,bit) passes.

    Bit-identical to untranspose_planes_ref (tests).
    """
    if out_dtype is None:
        out_dtype = {1: jnp.uint8, 2: jnp.uint16, 4: jnp.uint32}[elem_size]
    n_blocks, block_bytes = planes.shape
    if block_bytes % (32 * elem_size):
        # SWAR path needs whole u32 words per plane (m % 4 == 0)
        return untranspose_planes(planes, elem_size, out_dtype)
    m = block_bytes // (8 * elem_size)  # bytes per plane
    L = m // 4  # u32 words per plane
    S = elem_size
    w = jax.lax.bitcast_convert_type(
        planes.reshape(n_blocks, 8 * S * L, 4), jnp.uint32
    )  # little-endian word assembly of 4 consecutive plane bytes
    P = w.reshape(n_blocks, S, 8, L)
    qs = [
        _transpose8_rows(P[:, s])  # (N, 8=t, L) rows of transposed bytes
        for s in range(S)
    ]
    # assemble element words: output u32 word index = jw*(4*S) + r*S + s2
    # where s2 indexes S/2-element... for S=2: word w = 16*jw + 4*r + g,
    # bytes [q0[2g], q1[2g], q0[2g+1], q1[2g+1]] (elements 8m+2g, 8m+2g+1)
    # Assembly: element e = 8*(4*jw + r) + t = 32*jw + 8*r + t.  Emit ONE
    # full u32 per element and truncate with a plain convert: packing two
    # elements per u32 and bitcasting to u16 forces a (…, 2)-minor-dim
    # relayout that tiles to 128 lanes (observed: an 18.5 GB allocation
    # at Eiger batch scale); the unpacked form keeps every materialised
    # tensor at full lane width and the u32->u16 convert is elementwise.
    parts = []
    for r in range(4):

        def byte(q, t):
            return (q[:, t] >> np.uint32(8 * r)) & np.uint32(0xFF)

        for_r = []
        for t in range(8):
            v = byte(qs[0], t)
            for s in range(1, S):
                v = v | (byte(qs[s], t) << np.uint32(8 * s))
            for_r.append(v)
        parts.append(jnp.stack(for_r, axis=-1))  # (N, L, 8t)
    o32 = jnp.stack(parts, axis=-2)  # (N, L, 4r, 8t)
    return o32.reshape(n_blocks, L * 32).astype(out_dtype)


@lru_cache(maxsize=8)
def _jit_untranspose(elem_size: int, dtype_name: str):
    dt = jnp.dtype(dtype_name)
    return jax.jit(lambda pl: untranspose_planes(pl, elem_size, dt))


def decode_blocks(planes: np.ndarray, elem_size: int, out_dtype=None):
    """Host-convenience wrapper: jit-cached device untranspose of a
    (n_blocks, block_bytes) uint8 plane matrix -> (n_blocks, block_elem)
    typed elements (still on device)."""
    if out_dtype is None:
        out_dtype = {1: np.uint8, 2: np.uint16, 4: np.uint32}[elem_size]
    fn = _jit_untranspose(int(elem_size), np.dtype(out_dtype).name)
    return fn(planes)


def planes_to_frame_host(
    planes: np.ndarray, n_elem: int, elem_size: int
) -> np.ndarray:
    """Host untranspose of a (n_blocks, block_bytes) plane matrix (the
    mixed-batch CLI fallback): NumPy bit decode per padded block, sliced
    to n_elem elements.  Returns the flat uint8 element buffer."""
    from ..io.compression import bitshuffle_decode_np

    n_blocks, block_bytes = planes.shape
    block_elem = block_bytes // elem_size
    out = np.empty(n_elem * elem_size, dtype=np.uint8)
    for b in range(n_blocks):
        lo = b * block_elem * elem_size
        hi = min((b + 1) * block_elem * elem_size, n_elem * elem_size)
        if hi <= lo:
            break
        dec = bitshuffle_decode_np(planes[b], block_elem, elem_size)
        out[lo:hi] = dec[: hi - lo]
    return out


def bshuf_lz4_decompress_device(
    chunk: bytes, n_elem: int, elem_size: int, skip_header: bool = True
) -> np.ndarray:
    """Full chunk decode with the untranspose on device: host LZ4 per
    block (io/compression.bshuf_lz4_planes), device bit untranspose,
    raw tail appended.  Returns a host uint8 buffer bit-identical to
    io/compression.bshuf_lz4_decompress."""
    from ..io.compression import bshuf_lz4_planes

    planes, tail, block_elem, n_shuf = bshuf_lz4_planes(
        chunk, n_elem, elem_size, skip_header=skip_header
    )
    out = np.empty(n_elem * elem_size, dtype=np.uint8)
    if n_shuf:
        elems = np.asarray(decode_blocks(planes, elem_size))
        out[: n_shuf * elem_size] = (
            elems.reshape(-1)[:n_shuf].view(np.uint8)
            if elem_size > 1
            else elems.reshape(-1)[:n_shuf]
        )
    if len(tail):
        out[n_shuf * elem_size :] = np.frombuffer(tail, np.uint8)
    return out
