"""Pallas TPU window gather: fixed-size 2D windows at arbitrary offsets.

The integrator's hot primitive is "gather A shoebox windows of (bh, bw)
pixels from a frame at per-reflection (y0, x0)".  XLA lowers the natural
``vmap(dynamic_slice)`` to a per-element gather priced at ~60-95 ns per
ROW on v5e (tools/measure_gather_windows.py) — 2.1 us per 32-row window,
which alone caps the integrator at ~0.5x of its real-time baseline.

This kernel instead issues one double-buffered 2D DMA per window (dynamic
sublane offset, 128-lane-aligned lane offset — both legal Mosaic DMAs),
covers the arbitrary lane start with a 256-lane tile, and aligns it with
an in-register dynamic lane rotate (``pltpu.roll``), the Pallas analogue
of the reference's coalesced shoebox loads (reference: kabsch.cu:455-530
thread-strided global reads).

Contract: ``window_gather(img, y0, x0, bh)`` returns (A, bh, 128) int32
(f32 for float inputs; input must be >= 32-bit) where ``out[a, r, c] = img[y0[a]+r, x0[a]+c]`` for
c < 128; callers slice [:, :, :bw].  Requirements: img (Hp, Wp) with Wp a
multiple of 128 and Hp >= y0+bh; bh a multiple of 8; 0 <= x0 < Wp-128
(STRICT upper bound: x0 == Wp-128 exactly would clamp to shift == 128,
whose correctness rests on pltpu.roll(t, -128) being a modular no-op —
validated only in Mosaic interpret mode, never on v5e hardware, per the
repo rule that interpret-clean is not hardware-clean.  Every production
canvas pads at least one spare 128-lane block past the maximum x0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_R = 8  # windows per grid program (DMA batch)


def _gather_planes_kernel(
    y0_ref,
    xblk_ref,
    shift_ref,
    img_hbm,  # (P, Hp, Wp//128, 128) ANY
    out_ref,  # (R, P, bh, 128) block
    tiles,  # scratch (2, R, P, bh, 2, 128)
    sems,  # DMA sems (2, R)
    *,
    p: int,
    bh: int,
    out_dtype,
):
    # Multi-plane variant: ONE DMA per window covers all P planes (e.g.
    # the 4 frames of a resident frame block, or the 6 hi/lo corner-field
    # planes), amortising the per-DMA latency that dominates the
    # single-plane kernel (~1.26 us/window at A=2048 on v5e).
    i = pl.program_id(0)
    n = pl.num_programs(0)

    zero = jnp.asarray(0, jnp.int32)

    def start_dmas(slot, prog):
        for r in range(_R):
            a = prog * _R + r
            # r must be an explicit i32 constant: under jax_enable_x64 a
            # bare Python int lowers to an i64 memref_slice operand, which
            # Mosaic rejects
            ri = jnp.asarray(r, jnp.int32)
            pltpu.make_async_copy(
                img_hbm.at[
                    pl.ds(zero, img_hbm.shape[0]),
                    pl.ds(y0_ref[a], bh),
                    pl.ds(xblk_ref[a], 2),
                    pl.ds(zero, 128),
                ],
                tiles.at[slot, ri],
                sems.at[slot, ri],
            ).start()

    slot = jax.lax.rem(i, jnp.asarray(2, i.dtype))
    next_slot = jax.lax.rem(i + 1, jnp.asarray(2, i.dtype))

    @pl.when(i == 0)
    def _():
        start_dmas(slot, i)

    @pl.when(i + 1 < n)
    def _():
        start_dmas(next_slot, i + 1)

    lane = jax.lax.broadcasted_iota(jnp.int32, (bh, 128), 1)
    for r in range(_R):
        a = i * _R + r
        ri = jnp.asarray(r, jnp.int32)
        pltpu.make_async_copy(
            img_hbm.at[
                pl.ds(zero, img_hbm.shape[0]),
                pl.ds(y0_ref[a], bh),
                pl.ds(xblk_ref[a], 2),
                pl.ds(zero, 128),
            ],
            tiles.at[slot, ri],
            sems.at[slot, ri],
        ).wait()
        sh = shift_ref[a]
        sel = lane < 128 - sh
        for q in range(p):
            qi = jnp.asarray(q, jnp.int32)
            t0 = tiles[slot, ri, qi, :, zero, :]
            t1 = tiles[slot, ri, qi, :, jnp.asarray(1, jnp.int32), :]
            r0 = pltpu.roll(t0, -sh, 1)
            r1 = pltpu.roll(t1, -sh, 1)
            out_ref[r, q] = jnp.where(sel, r0, r1).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("bh", "interpret"))
def window_gather_planes(
    img: jnp.ndarray,
    y0: jnp.ndarray,
    x0: jnp.ndarray,
    *,
    bh: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Gather (A, P, bh, 128) windows from a (P, Hp, Wp) plane stack, one
    DMA per window across all planes.  Same contract as
    :func:`window_gather` otherwise."""
    p, hp, wp = img.shape
    assert wp % 128 == 0 and bh % 8 == 0
    # the kernel DMAs a 2-block (256-lane) window span, so the plane must
    # be at least 256 lanes wide (else xblk = min(x0>>7, wp//128 - 2)
    # would go negative and read out of range); pad narrower planes up
    assert wp >= 256, f"plane width {wp} < 256 lanes; pad the plane"
    assert img.dtype.itemsize >= 4
    a = y0.shape[0]
    ap = ((a + _R - 1) // _R) * _R
    y0p = jnp.pad(y0.astype(jnp.int32), (0, ap - a))
    x0p = jnp.pad(x0.astype(jnp.int32), (0, ap - a))
    xblk = jnp.minimum(x0p >> 7, wp // 128 - 2)
    shift = x0p - (xblk << 7)
    out_dtype = (
        jnp.float32
        if jnp.issubdtype(img.dtype, jnp.floating)
        else jnp.int32
    )
    out = pl.pallas_call(
        functools.partial(
            _gather_planes_kernel, p=p, bh=bh, out_dtype=out_dtype
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(ap // _R,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                # literal 0s must be i32: under x64 they lower as i64
                # block indices, which Mosaic fails to legalize
                (_R, p, bh, 128),
                lambda i, *_: (i,) + (jnp.asarray(0, jnp.int32),) * 3,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, _R, p, bh, 2, 128), img.dtype),
                pltpu.SemaphoreType.DMA((2, _R)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((ap, p, bh, 128), out_dtype),
        interpret=interpret,
    )(y0p, xblk, shift, img.reshape(p, hp, wp // 128, 128))
    return out[:a]


def _gather_planes_packed_kernel(
    y0_ref,
    xblk_ref,
    shift_ref,
    img_hbm,  # (P, Hp, Wp//128, 128) ANY
    out_ref,  # (R//4, P, bh, 128) block — 4 windows per row, 32 lanes each
    tiles,  # scratch (2, R, P, bh, 2, 128)
    sems,  # DMA sems (2, R)
    *,
    p: int,
    bh: int,
    out_dtype,
):
    # Lane-packed variant of _gather_planes_kernel: window 4i+g lands on
    # lanes 32g..32g+31 of output row i (only lanes 0..31 of each window
    # are kept — the integrator's packed classification path masks
    # everything past the bbox width <= 31).  Output HBM writes shrink 4x
    # and the XLA-side relayout pass disappears.
    i = pl.program_id(0)
    n = pl.num_programs(0)

    zero = jnp.asarray(0, jnp.int32)

    def start_dmas(slot, prog):
        for r in range(_R):
            a = prog * _R + r
            ri = jnp.asarray(r, jnp.int32)
            pltpu.make_async_copy(
                img_hbm.at[
                    pl.ds(zero, img_hbm.shape[0]),
                    pl.ds(y0_ref[a], bh),
                    pl.ds(xblk_ref[a], 2),
                    pl.ds(zero, 128),
                ],
                tiles.at[slot, ri],
                sems.at[slot, ri],
            ).start()

    slot = jax.lax.rem(i, jnp.asarray(2, i.dtype))
    next_slot = jax.lax.rem(i + 1, jnp.asarray(2, i.dtype))

    @pl.when(i == 0)
    def _():
        start_dmas(slot, i)

    @pl.when(i + 1 < n)
    def _():
        start_dmas(next_slot, i + 1)

    lane = jax.lax.broadcasted_iota(jnp.int32, (bh, 128), 1)
    one = jnp.asarray(1, jnp.int32)
    for quad in range(_R // 4):
        for g in range(4):
            r = quad * 4 + g
            pltpu.make_async_copy(
                img_hbm.at[
                    pl.ds(zero, img_hbm.shape[0]),
                    pl.ds(y0_ref[i * _R + r], bh),
                    pl.ds(xblk_ref[i * _R + r], 2),
                    pl.ds(zero, 128),
                ],
                tiles.at[slot, jnp.asarray(r, jnp.int32)],
                sems.at[slot, jnp.asarray(r, jnp.int32)],
            ).wait()
        for q in range(p):
            qi = jnp.asarray(q, jnp.int32)
            packed = None
            for g in range(4):
                a = i * _R + quad * 4 + g
                ri = jnp.asarray(quad * 4 + g, jnp.int32)
                sh = shift_ref[a]
                sel = lane < 128 - sh
                t0 = tiles[slot, ri, qi, :, zero, :]
                t1 = tiles[slot, ri, qi, :, one, :]
                w = jnp.where(
                    sel, pltpu.roll(t0, -sh, 1), pltpu.roll(t1, -sh, 1)
                )
                # static roll puts window lanes 0..31 onto 32g..32g+31
                # (i32 constant: a bare Python int lowers as i64 under
                # jax_enable_x64, which tpu.dynamic_rotate rejects)
                pv = (
                    pltpu.roll(w, jnp.asarray(32 * g, jnp.int32), 1)
                    if g
                    else w
                )
                if packed is None:
                    packed = pv
                else:
                    packed = jnp.where(lane < 32 * g, packed, pv)
            out_ref[quad, q] = packed.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("bh", "interpret"))
def window_gather_planes_packed(
    img: jnp.ndarray,
    y0: jnp.ndarray,
    x0: jnp.ndarray,
    *,
    bh: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Lane-packed :func:`window_gather_planes`: returns (A//4, P, bh,
    128) where output row i's lanes 32g..32g+31 hold window (4i+g)'s
    lanes 0..31 — i.e. exactly

        window_gather_planes(img, y0, x0, bh)[..., :32]
            .reshape(A//4, 4, P, bh, 32).transpose(0, 2, 3, 1, 4)
            .reshape(A//4, P, bh, 128)

    produced directly by the kernel (4x smaller HBM output, no XLA
    relayout).  Requires ``len(y0) % 4 == 0``.

    MEASURED SLOWER than the plain kernel + XLA relayout on v5e (3.81 vs
    3.54 ms/step in the integrator at A=2048/F=4/bh=24,
    tools/measure_int_variants.py): the in-kernel 4-way roll/select
    combine costs more VPU time than the smaller output saves.  Kept as
    the measured record; production packs at the XLA level
    (kabsch._finish_block_step_packed)."""
    p, hp, wp = img.shape
    assert wp % 128 == 0 and bh % 8 == 0
    assert wp >= 256, f"plane width {wp} < 256 lanes; pad the plane"
    assert img.dtype.itemsize >= 4
    a = y0.shape[0]
    assert a % 4 == 0, "packed gather needs a multiple of 4 windows"
    ap = ((a + _R - 1) // _R) * _R
    y0p = jnp.pad(y0.astype(jnp.int32), (0, ap - a))
    x0p = jnp.pad(x0.astype(jnp.int32), (0, ap - a))
    xblk = jnp.minimum(x0p >> 7, wp // 128 - 2)
    shift = x0p - (xblk << 7)
    out_dtype = (
        jnp.float32
        if jnp.issubdtype(img.dtype, jnp.floating)
        else jnp.int32
    )
    out = pl.pallas_call(
        functools.partial(
            _gather_planes_packed_kernel, p=p, bh=bh, out_dtype=out_dtype
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(ap // _R,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (_R // 4, p, bh, 128),
                lambda i, *_: (i,) + (jnp.asarray(0, jnp.int32),) * 3,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, _R, p, bh, 2, 128), img.dtype),
                pltpu.SemaphoreType.DMA((2, _R)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((ap // 4, p, bh, 128), out_dtype),
        interpret=interpret,
    )(y0p, xblk, shift, img.reshape(p, hp, wp // 128, 128))
    return out[: a // 4]


def _gather_planes_pl_kernel(
    y0_ref,
    xblk_ref,
    shift_ref,
    img_hbm,  # (Hp, Wp//128, P, 128) ANY — plane-LAST layout
    out_ref,  # (R, P, bh, 128) block
    tiles,  # scratch (2, R, bh, 2, P, 128)
    sems,  # DMA sems (2, R)
    *,
    p: int,
    bh: int,
    out_dtype,
):
    # Plane-last variant of _gather_planes_kernel: with planes as the
    # second-minor dim, each window ROW's (2-block, P, 128) slice is one
    # CONTIGUOUS run of 2*P*128 elements, so the per-window DMA is bh
    # descriptors of 2*P*512 bytes instead of P*bh descriptors of 1 KB.
    # MEASURED NEUTRAL on v5e (tools/measure_window_gather.py: 1.557 ms
    # pf vs 1.563 pl_pre at A=2048/F=4/bh=24) — the gather is neither
    # descriptor- nor bytes-bound (a single-block probe moving HALF the
    # bytes was no faster); it sits at an issue/latency floor.  Kept as
    # the measured record + harness target; production stays plane-first.
    i = pl.program_id(0)
    n = pl.num_programs(0)

    zero = jnp.asarray(0, jnp.int32)

    def start_dmas(slot, prog):
        for r in range(_R):
            a = prog * _R + r
            ri = jnp.asarray(r, jnp.int32)
            pltpu.make_async_copy(
                img_hbm.at[
                    pl.ds(y0_ref[a], bh),
                    pl.ds(xblk_ref[a], 2),
                    pl.ds(zero, p),
                    pl.ds(zero, 128),
                ],
                tiles.at[slot, ri],
                sems.at[slot, ri],
            ).start()

    slot = jax.lax.rem(i, jnp.asarray(2, i.dtype))
    next_slot = jax.lax.rem(i + 1, jnp.asarray(2, i.dtype))

    @pl.when(i == 0)
    def _():
        start_dmas(slot, i)

    @pl.when(i + 1 < n)
    def _():
        start_dmas(next_slot, i + 1)

    lane = jax.lax.broadcasted_iota(jnp.int32, (bh, 128), 1)
    one = jnp.asarray(1, jnp.int32)
    for r in range(_R):
        a = i * _R + r
        ri = jnp.asarray(r, jnp.int32)
        pltpu.make_async_copy(
            img_hbm.at[
                pl.ds(y0_ref[a], bh),
                pl.ds(xblk_ref[a], 2),
                pl.ds(zero, p),
                pl.ds(zero, 128),
            ],
            tiles.at[slot, ri],
            sems.at[slot, ri],
        ).wait()
        sh = shift_ref[a]
        sel = lane < 128 - sh
        for q in range(p):
            qi = jnp.asarray(q, jnp.int32)
            t0 = tiles[slot, ri, :, zero, qi, :]
            t1 = tiles[slot, ri, :, one, qi, :]
            r0 = pltpu.roll(t0, -sh, 1)
            r1 = pltpu.roll(t1, -sh, 1)
            out_ref[r, q] = jnp.where(sel, r0, r1).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("bh", "interpret"))
def window_gather_planes_pl(
    img: jnp.ndarray,
    y0: jnp.ndarray,
    x0: jnp.ndarray,
    *,
    bh: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Plane-last :func:`window_gather_planes`: ``img`` is (Hp, Wp//128,
    P, 128) — e.g. ``frames.reshape(F, Hp, Wp//128, 128).transpose(1, 2,
    0, 3)`` — and the result is identical: (A, P, bh, 128) windows with
    ``out[a, q, r, c] = img[y0[a]+r, (x0[a]+c)//128, q, (x0[a]+c)%128]``.
    One transpose per resident frame block buys contiguous window rows
    (see the kernel note)."""
    hp, wb, p, _ = img.shape
    wp = wb * 128
    assert bh % 8 == 0
    assert wp >= 256, f"plane width {wp} < 256 lanes; pad the plane"
    assert img.dtype.itemsize >= 4
    a = y0.shape[0]
    ap = ((a + _R - 1) // _R) * _R
    y0p = jnp.pad(y0.astype(jnp.int32), (0, ap - a))
    x0p = jnp.pad(x0.astype(jnp.int32), (0, ap - a))
    xblk = jnp.minimum(x0p >> 7, wb - 2)
    shift = x0p - (xblk << 7)
    out_dtype = (
        jnp.float32
        if jnp.issubdtype(img.dtype, jnp.floating)
        else jnp.int32
    )
    out = pl.pallas_call(
        functools.partial(
            _gather_planes_pl_kernel, p=p, bh=bh, out_dtype=out_dtype
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(ap // _R,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (_R, p, bh, 128),
                lambda i, *_: (i,) + (jnp.asarray(0, jnp.int32),) * 3,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, _R, bh, 2, p, 128), img.dtype),
                pltpu.SemaphoreType.DMA((2, _R)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((ap, p, bh, 128), out_dtype),
        interpret=interpret,
    )(y0p, xblk, shift, img)
    return out[:a]


def _gather_kernel(
    y0_ref,  # scalar-prefetch (A,)
    xblk_ref,  # scalar-prefetch (A,) 128-lane block index
    shift_ref,  # scalar-prefetch (A,) in-block lane offset 0..127
    img_hbm,  # (Hp, Wp//128, 128) ANY — lane dim full/static
    out_ref,  # (R, bh, 128) block
    tiles,  # scratch (2, R, bh, 2, 128)
    sems,  # DMA sems (2, R)
    *,
    bh: int,
    out_dtype,
):
    # The HBM slice keeps the (tiled) lane dimension full and takes the
    # dynamic window through the leading dims: dynamic sublane offsets are
    # legal, dynamic LANE offsets are not — even value-aligned ones
    # (Mosaic rejects the (bh, 256) at-dynamic-lane form).  The 256-lane
    # coverage therefore arrives as two 128-lane blocks, aligned by a
    # per-block dynamic rotate and a lane select.
    i = pl.program_id(0)
    n = pl.num_programs(0)

    zero = jnp.asarray(0, jnp.int32)

    def start_dmas(slot, prog):
        for r in range(_R):
            a = prog * _R + r
            # explicit i32 for every slice start / scratch index: bare
            # Python ints lower to i64 under jax_enable_x64 and Mosaic
            # rejects i64 memref_slice operands
            ri = jnp.asarray(r, jnp.int32)
            pltpu.make_async_copy(
                img_hbm.at[
                    pl.ds(y0_ref[a], bh),
                    pl.ds(xblk_ref[a], 2),
                    pl.ds(zero, 128),
                ],
                tiles.at[slot, ri],
                sems.at[slot, ri],
            ).start()

    slot = jax.lax.rem(i, jnp.asarray(2, i.dtype))
    next_slot = jax.lax.rem(i + 1, jnp.asarray(2, i.dtype))

    @pl.when(i == 0)
    def _():
        start_dmas(slot, i)

    @pl.when(i + 1 < n)
    def _():
        start_dmas(next_slot, i + 1)

    lane = jax.lax.broadcasted_iota(jnp.int32, (bh, 128), 1)
    for r in range(_R):
        a = i * _R + r
        ri = jnp.asarray(r, jnp.int32)
        pltpu.make_async_copy(
            img_hbm.at[
                pl.ds(y0_ref[a], bh),
                pl.ds(xblk_ref[a], 2),
                pl.ds(zero, 128),
            ],
            tiles.at[slot, ri],
            sems.at[slot, ri],
        ).wait()
        t0 = tiles[slot, ri, :, zero, :]
        t1 = tiles[slot, ri, :, jnp.asarray(1, jnp.int32), :]
        sh = shift_ref[a]
        r0 = pltpu.roll(t0, -sh, 1)
        r1 = pltpu.roll(t1, -sh, 1)
        win = jnp.where(lane < 128 - sh, r0, r1)
        out_ref[r] = win.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("bh", "interpret"))
def window_gather(
    img: jnp.ndarray,
    y0: jnp.ndarray,
    x0: jnp.ndarray,
    *,
    bh: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Gather (A, bh, 128) windows ``img[y0[a]:y0[a]+bh, x0[a]:x0[a]+128]``.

    Integer inputs return int32 windows; float inputs keep their dtype.
    ``A`` is padded internally to a multiple of the DMA batch; padded rows
    gather window (0, 0) and are discarded.
    """
    hp, wp = img.shape
    assert wp % 128 == 0 and bh % 8 == 0
    # 2-block (256-lane) DMA span: see window_gather_planes
    assert wp >= 256, f"image width {wp} < 256 lanes; pad the image"
    assert img.dtype.itemsize >= 4, (
        "window_gather needs a >=32-bit image (16-bit HBM refs pack two "
        "sublanes per tile row, which forbids dynamic row offsets) — "
        "widen once per frame on device"
    )
    a = y0.shape[0]
    ap = ((a + _R - 1) // _R) * _R
    y0p = jnp.pad(y0.astype(jnp.int32), (0, ap - a))
    x0p = jnp.pad(x0.astype(jnp.int32), (0, ap - a))
    xblk = jnp.minimum(x0p >> 7, wp // 128 - 2)
    shift = x0p - (xblk << 7)

    out_dtype = (
        jnp.float32
        if jnp.issubdtype(img.dtype, jnp.floating)
        else jnp.int32
    )
    # scalar-prefetch form: indices must be available before the grid runs
    out = pl.pallas_call(
        functools.partial(_gather_kernel, bh=bh, out_dtype=out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(ap // _R,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (_R, bh, 128),
                lambda i, *_: (i,) + (jnp.asarray(0, jnp.int32),) * 2,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, _R, bh, 2, 128), img.dtype),
                pltpu.SemaphoreType.DMA((2, _R)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((ap, bh, 128), out_dtype),
        interpret=interpret,
    )(y0p, xblk, shift, img.reshape(hp, wp // 128, 128))
    return out[:a]
