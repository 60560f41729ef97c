"""Fused Pallas TPU kernel for dispersion thresholding.

One pass over the frame computes, per row-strip held in VMEM:
  * the DIALS dispersion (or extended first-pass) predicate in the boxed
    form — the same arithmetic as ops/dispersion.py at float32 (matching the
    reference GPU kernel's precision, thresholding.cu:104-124);
  * the within-row inclusive prefix count of strong pixels (``rowcum``),
    which the gather-based compaction (ops/compact.py) uses to locate the
    k-th strong pixel with two binary searches — no full-frame cumsum,
    scatter, or sort anywhere in the hot path.

The halo problem (each output row needs +-R neighbour rows/cols) is solved
by zero-padding the inputs once in XLA and loading overlapping strips:
image strips stream through a double-buffered manual DMA (strip i+1 loads
while strip i computes — the Pallas analogue of the reference's per-thread
stream overlap, SURVEY.md P2); the frame-invariant mask is pre-cut into
strips once per collection and auto-pipelined as a blocked input.  This is
the Pallas equivalent of the reference's shared-memory halo tiles
(reference: spotfinder/kernels/thresholding.cu:169-206,
include/device_common.cuh:190-277).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import (
    DEFAULT_MIN_COUNT,
    DEFAULT_NSIG_B,
    DEFAULT_NSIG_S,
    KERNEL_RADIUS,
)

DEFAULT_STRIP = 64
# packed kernel: 128-row strips measured fastest on v5e (tools/measure_stages)
DEFAULT_STRIP_PACKED = 128


def _f32(v):
    """Widen a kernel register to f32 for the window sums.

    Sub-32-bit inputs hop through i32 (Mosaic cannot cast them to f32
    directly); 32-bit inputs convert directly — an i32 hop on the
    wrappers' u32-pre-cast f32 input would truncate and re-wrap, and one
    on raw u32 wraps values >= 2^31 negative, sneaking them past the
    trusted_max gate and into every neighbour's window sums.
    """
    if v.dtype.itemsize < 4:
        v = v.astype(jnp.int32)
    if v.dtype != jnp.float32:
        v = v.astype(jnp.float32)
    return v


def _u32_pre_cast(image: jnp.ndarray) -> jnp.ndarray:
    """u32 frames convert to f32 at the XLA level before entering a
    kernel: the in-kernel widening cannot go through i32 for them (wrap),
    and a direct u32->f32 Mosaic cast is unvalidated on hardware.  The
    f32 conversion matches the jnp oracle (ops/dispersion.py
    image.astype(f32)) bit-for-bit, saturated sentinels included."""
    if image.dtype == jnp.uint32:
        return image.astype(jnp.float32)
    return image


def _row_halo(radius: int) -> int:
    # Row halo rounded up to the TPU sublane tiling (8) so DMA slices stay
    # aligned; the extra rows are simply ignored by the compute slices.
    return ((radius + 7) // 8) * 8


def mask_box_count(mask: jnp.ndarray, radius: int = KERNEL_RADIUS) -> jnp.ndarray:
    """Per-pixel count of valid mask pixels in the (2r+1)^2 window, as u16.

    The mask is fixed for a whole collection, so this is computed ONCE and
    passed to :func:`dispersion_fused` as ``mbox`` — the kernel then skips
    re-summing the mask grid on every frame (14 of ~50 full-grid adds).
    Call eagerly (outside jit) so the result is cached, not re-derived
    per frame.  u16 (not u8): Mosaic's u8 -> i32 conversion recurses under
    x64, while the u16 -> i32 -> f32 widening is the image path's
    known-good pattern.
    """
    from .dispersion import box_sum

    return box_sum((mask != 0).astype(jnp.int32), radius).astype(jnp.uint16)


def _vtree7(src, s2, s4, n, src_row0=0):
    """7-wide vertical window sums in the canonical subsum-tree order
    (ops/dispersion._tree_window_axis): W[i] = (s4[i] + s2[i+4]) + s1[i+6]
    with s2[i] = s1[i] + s1[i+1], s4[i] = s2[i] + s2[i+2].

    Reads ``src`` rows src_row0..src_row0+n+5, writes scratch ``s2`` rows
    0..n+3 and ``s4`` rows 0..n-1 (all lanes), returns the SSA result for
    rows 0..n-1.  This association order is the float-parity contract with
    the jnp oracle — do not "simplify" it.
    """
    o = src_row0
    s2[0 : n + 4] = src[o : o + n + 4] + src[o + 1 : o + n + 5]
    s4[0:n] = s2[0:n] + s2[2 : n + 2]
    return (s4[0:n] + s2[4 : n + 4]) + src[o + 6 : o + n + 6]


def _htree7(v, s2, s4, n_rows, width, lane0=0):
    """7-wide horizontal window sums, canonical tree order (see _vtree7).

    ``v`` holds vertical sums on rows 0..n_rows-1 with valid lanes
    lane0..lane0+width+5; scratch ``s2``/``s4`` are written on lanes
    0..width+3 / 0..width-1; returns the SSA (n_rows, width) result.
    """
    s2[0:n_rows, pl.ds(0, width + 4)] = (
        v[0:n_rows, pl.ds(lane0, width + 4)]
        + v[0:n_rows, pl.ds(lane0 + 1, width + 4)]
    )
    s4[0:n_rows, pl.ds(0, width)] = (
        s2[0:n_rows, pl.ds(0, width)] + s2[0:n_rows, pl.ds(2, width)]
    )
    return (
        s4[0:n_rows, pl.ds(0, width)] + s2[0:n_rows, pl.ds(4, width)]
    ) + v[0:n_rows, pl.ds(lane0 + 6, width)]


def _rollm(x, k: int, axis: int):
    """jnp.roll(x, -k, axis) via pltpu.roll (which requires shift >= 0)."""
    return pltpu.roll(x, x.shape[axis] - k, axis)


def _dispersion_predicate_roll(
    img_v,
    slot,
    mask_strips,
    mboxc_strips,
    imf,
    imsq,
    vsum,
    *,
    strip: int,
    radius: int,
    halo: int,
    trusted_max: float,
    min_count: int,
    nsig_b: float,
    nsig_s: float,
    signal_test: bool,
):
    """Full-register roll formulation of the dispersion predicate.

    Same float addition order as :func:`_vtree7`/:func:`_htree7` element
    for element (bit-identical outputs); the 1/2/4/6 window shifts ride
    ``pltpu.roll`` over whole (rows, wp) registers instead of misaligned
    sub-width slices with masked partial stores.  Requires:

    * the CENTRE-MASKED mask box count ``mboxc = where(mask != 0, mbox, 0)``
      — the centre-validity test then folds into the ``m > 1`` /
      ``min_count`` conditions (identical predicate: a masked centre gives
      m = 0, failing ``m > 1``), and its zero padding lanes force the
      predicate false wherever the rolls wrapped garbage in;
    * ``wp - (w + 2r) >= 0`` lanes of zero mbox padding beyond the image
      (always true: mbox is padded to the 128-aligned wp).

    The returned ``ok`` covers the full (strip, wp) register, lane j =
    image column j, so the caller stores it with one aligned full-width
    write and no concat padding.
    """
    r = radius
    assert r == 3, "7-wide tree specialisation"
    n = strip
    off = halo - r
    imf[...] = jnp.where(
        mask_strips[0, off : off + strip + 2 * r] != 0,
        _f32(img_v[slot, off : off + strip + 2 * r]),
        0.0,
    )
    m = _f32(mboxc_strips[0])

    def vroll(srcref):
        sv = srcref[...]
        s2 = sv + _rollm(sv, 1, 0)
        s4 = s2 + _rollm(s2, 2, 0)
        return (s4 + _rollm(s2, 4, 0))[0:n] + _rollm(sv, 6, 0)[0:n]

    def hroll(vref):
        v = vref[...]
        s2 = v + _rollm(v, 1, 1)
        s4 = s2 + _rollm(s2, 2, 1)
        return (s4 + _rollm(s2, 4, 1)) + _rollm(v, 6, 1)

    # x = window(I): integer-valued f32, exact at any order
    vsum[0] = vroll(imf)
    x = hroll(vsum.at[0])
    # y = window(I^2): rounding-sensitive; same canonical tree order
    imsq[...] = imf[...] * imf[...]
    vsum[1] = vroll(imsq)
    y = hroll(vsum.at[1])

    # centre pixels, lane-aligned to their column (lane j = column j)
    src = _rollm(imf[r : r + strip], r, 1)
    a = m * y - x * x - x * (m - 1.0)
    c = x * nsig_b * jnp.sqrt(jnp.maximum(2.0 * (m - 1.0), 0.0))
    ok = (src <= trusted_max) & (m >= min_count) & (m > 1)
    ok &= a > c
    if signal_test:
        ok &= (m * src - x) > (nsig_s * jnp.sqrt(x * m))
    return ok


def _dispersion_predicate(
    img_v,
    slot,
    mask_strips,
    mbox_strips,
    imf,
    mkf,
    imsq,
    vsum,
    *,
    strip: int,
    radius: int,
    width: int,
    halo: int,
    trusted_max: float,
    min_count: int,
    nsig_b: float,
    nsig_s: float,
    signal_test: bool,
    has_mbox: bool,
):
    """Shared strip-level dispersion predicate for the dense and packed
    kernels: f32 conversion, canonical-tree window sums, boxed-form tests.

    All window sums use the shared-subsum tree (:func:`_vtree7` /
    :func:`_htree7`) — the same float addition order as the jnp oracle's
    box_sum, so f32 kernel <-> oracle parity is bit-exact.  The m and x
    grids are integer-valued (every partial sum < 2^24, exact at any
    order); the y = window(I^2) grid rounds, and the tree order is the
    contract.
    """
    r = radius
    assert r == 3, "7-wide tree specialisation"
    off = halo - r
    if has_mbox:
        # mask box counts arrive precomputed, so the f32 mask grid is never
        # summed — mask the intensities with a select on the raw u8 strip
        # instead of materialising mkf (saves two convert passes + a
        # multiply over the (strip+2r, wp) grid every strip).
        imf[...] = jnp.where(
            mask_strips[0, off : off + strip + 2 * r] != 0,
            _f32(img_v[slot, off : off + strip + 2 * r]),
            0.0,
        )
        m = _f32(mbox_strips[0, :, pl.ds(0, width)])
    else:
        imf[...] = _f32(img_v[slot, off : off + strip + 2 * r])
        mkf[...] = _f32(mask_strips[0, off : off + strip + 2 * r])
        imf[...] *= mkf[...]
        # m grid (exact integers): tree sums with imsq as the s2 temp —
        # the I^2 grid is not materialised yet
        vsum[0] = _vtree7(mkf, imsq, vsum.at[2], strip)
        m = _htree7(vsum.at[0], imsq, vsum.at[2], strip, width)

    # x = window(I): integer-valued f32 (<= 49 * 65535 < 2^24), exact
    vsum[0] = _vtree7(imf, mkf, vsum.at[2], strip)
    x = _htree7(vsum.at[0], mkf, vsum.at[2], strip, width)

    # y = window(I^2): rounding-sensitive; materialise I^2 once, then the
    # same canonical tree (two fewer full-grid passes than squaring per
    # shifted term, and ~10 fewer than sequential accumulation)
    imsq[...] = imf[...] * imf[...]
    vsum[1] = _vtree7(imsq, mkf, vsum.at[2], strip)
    y = _htree7(vsum.at[1], mkf, vsum.at[2], strip, width)

    # masked intensity == raw intensity wherever the predicate can pass
    # (mask_c != 0 is required), so reuse the f32 copy
    src = imf[r : r + strip, r : r + width]
    mask_c = mask_strips[0, halo : halo + strip, r : r + width]

    # boxed-form predicates (see ops/reference.py for the derivation)
    a = m * y - x * x - x * (m - 1.0)
    c = x * nsig_b * jnp.sqrt(jnp.maximum(2.0 * (m - 1.0), 0.0))
    ok = (mask_c != 0) & (src <= trusted_max) & (m >= min_count) & (m > 1)
    ok &= a > c
    if signal_test:
        sig_lhs = m * src - x
        sig_rhs = nsig_s * jnp.sqrt(x * m)
        ok &= sig_lhs > sig_rhs
    return ok


def _dispersion_kernel(
    *args,  # inputs, [strong_ref,] rowcum_ref, scratch (see unpack below)
    strip: int,
    radius: int,
    width: int,
    trusted_max: float,
    min_count: int,
    nsig_b: float,
    nsig_s: float,
    signal_test: bool,
    emit_strong: bool,
    has_mbox: bool,
):
    # inputs: img_hbm (full frame batch, ANY); mask_strips (1, strip+2*halo,
    # wp) blocked; with has_mbox also mbox_strips (1, strip, wp) u8 — the
    # frame-invariant mask box count precomputed once per collection.
    # scratch: img_v (2, strip+2*halo, wp) double-buffered image strips;
    # imf/mkf/imsq (strip+2r, wp) f32 masked I / tree temp / I^2; vsum
    # (3, strip, wp) f32 vertical sums + tree temp; sems DMA semaphores
    if has_mbox:
        img_hbm, mask_strips, mbox_strips, *refs = args
    else:
        img_hbm, mask_strips, *refs = args
        mbox_strips = None
    if emit_strong:
        strong_ref, rowcum_ref, img_v, imf, mkf, imsq, vsum, sems = refs
    else:
        rowcum_ref, img_v, imf, mkf, imsq, vsum, sems = refs
    batch_idx = pl.program_id(0)
    i = pl.program_id(1)
    n_strips = pl.num_programs(1)
    r = radius
    halo = _row_halo(r)

    def start_dma(slot, bb, ii):
        pltpu.make_async_copy(
            img_hbm.at[bb, pl.ds(ii * strip, strip + 2 * halo), :],
            img_v.at[slot],
            sems.at[slot],
        ).start()

    # slots alternate with the GLOBAL step counter so the cross-batch
    # prefetch lands in the slot the next step will wait on
    g = batch_idx * n_strips + i
    slot = jax.lax.rem(g, jnp.asarray(2, g.dtype))
    next_slot = jax.lax.rem(g + 1, jnp.asarray(2, g.dtype))

    # Double-buffered strip loads: every step starts the *next* strip's DMA
    # before computing its own.
    @pl.when(g == 0)
    def _():
        start_dma(slot, batch_idx, i)

    @pl.when(i + 1 < n_strips)
    def _():
        start_dma(next_slot, batch_idx, i + 1)

    @pl.when((i + 1 >= n_strips) & (batch_idx + 1 < pl.num_programs(0)))
    def _():
        start_dma(next_slot, batch_idx + 1, 0)

    pltpu.make_async_copy(
        img_hbm.at[batch_idx, pl.ds(i * strip, strip + 2 * halo), :],
        img_v.at[slot],
        sems.at[slot],
    ).wait()

    ok = _dispersion_predicate(
        img_v,
        slot,
        mask_strips,
        mbox_strips,
        imf,
        mkf,
        imsq,
        vsum,
        strip=strip,
        radius=r,
        width=width,
        halo=halo,
        trusted_max=trusted_max,
        min_count=min_count,
        nsig_b=nsig_b,
        nsig_s=nsig_s,
        signal_test=signal_test,
        has_mbox=has_mbox,
    )

    if emit_strong:
        # i32 store: Mosaic's bool->u8 lowering routes through an i32->u8
        # convert that fails to compile under x64; the (non-production)
        # wrapper casts to u8 in XLA instead
        strong_ref[0] = ok.astype(jnp.int32)

    # within-row inclusive prefix sum: log-shift accumulation through the
    # output ref keeps liveness bounded
    rowcum_ref[0] = ok.astype(jnp.int32)
    shift = 1
    while shift < width:
        cur = rowcum_ref[0]
        rowcum_ref[0] = cur + jnp.pad(
            cur, ((0, 0), (shift, 0)), constant_values=cur.dtype.type(0)
        )[:, :width]
        shift *= 2


def _n_word_lanes(wp: int) -> int:
    """Packed-word lane count: ceil(wp/32) rounded up to 8 lanes.

    Kept tight (not 128-padded): the compaction slice-gathers whole
    (2*nwl)-lane rows per pixel, so every padding lane is wasted gather
    bandwidth; Mosaic pads the in-kernel tiles internally either way.
    """
    return ((wp // 32 + 7) // 8) * 8


def _pack_pcw(strong8: jnp.ndarray, nwl: int) -> jnp.ndarray:
    """XLA-side bit pack: dense 0/1 strong bytes -> combined [pc | w32] rows.

    History: three in-kernel MXU packing schemes (bf16 16-bit halves, bf16
    byte groups, full f32) all dropped the SAME specific products on real
    v5e hardware (one strong bit per 128-lane group on even sublanes, while
    an all-ones count column in the same matmul stayed exact) — a
    positional Mosaic/MXU lowering defect, not a precision issue.  The
    kernels therefore emit the plain dense mask and this verified XLA
    reduction does the packing.
    """
    import numpy as np

    b, hp, wp = strong8.shape
    need = nwl * 32
    sb = strong8
    if wp < need:
        sb = jnp.pad(sb, ((0, 0), (0, 0), (0, need - wp)))
    elif wp > need:
        sb = sb[..., :need]
    # One bf16 matmul against a 16-bit-half weight matrix: column blocks
    # [lo16 | hi16] per 32-lane word.  The power-of-two weights (2^0..2^15)
    # are exact in bf16 and every partial sum <= 65535 < 2^24, so the MXU's
    # f32 accumulation is exact.  Two columns per word instead of the
    # previous five byte-group+count columns: 2.5x less MXU work; the
    # per-word strong count comes from a popcount of the assembled word
    # instead of a dedicated matmul column.
    m = np.zeros((need, 2 * nwl), np.float32)
    l = np.arange(need)
    j, t = l // 32, l % 32
    m[l, j] = np.where(t < 16, 2.0**t, 0.0)
    m[l, nwl + j] = np.where(t >= 16, 2.0 ** (t - 16), 0.0)
    prod = jax.lax.dot_general(
        sb.reshape(b * hp, need).astype(jnp.bfloat16),
        jnp.asarray(m, dtype=jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(b, hp, 2 * nwl)
    lo = prod[..., :nwl].astype(jnp.int32)
    hi = prod[..., nwl:].astype(jnp.int32)
    w32 = lo | (hi << 16)
    pc = jnp.cumsum(jax.lax.population_count(w32), axis=-1)
    return jnp.concatenate([pc, w32], axis=-1)


def _emit_strong8(ok, strong_ref, *, strip: int, width: int, wp: int):
    """Store the strong predicate as a dense (strip, wp) i8 plane with ONE
    aligned full-width write (unaligned-offset lane-slice stores are a
    Mosaic hazard, see _pack_pcw)."""
    if wp > width:
        strong_ref[0] = jnp.concatenate(
            [ok.astype(jnp.int8), jnp.zeros((strip, wp - width), jnp.int8)],
            axis=1,
        )
    else:
        strong_ref[0] = ok.astype(jnp.int8)


def _dispersion_packed_kernel(
    *args,
    strip: int,
    radius: int,
    width: int,
    wp: int,
    trusted_max: float,
    min_count: int,
    nsig_b: float,
    nsig_s: float,
    signal_test: bool,
    has_mbox: bool,
    tree_impl: str = "slice",
):
    """dispersion predicate -> packed u32 strong words + word-prefix counts.

    Identical threshold arithmetic to :func:`_dispersion_kernel`, but instead
    of materialising a dense per-pixel rowcum (72 MB/frame at Eiger 16M, plus
    a 13-pass in-row prefix sum), the 0/1 mask is bit-packed on the MXU and
    only (H, nwl) words + prefix counts leave the kernel (~4 MB/frame).
    """
    if has_mbox:
        img_hbm, mask_strips, mbox_strips, *refs = args
    else:
        img_hbm, mask_strips, *refs = args
        mbox_strips = None
    if tree_impl == "roll":
        # roll mode needs no mkf scratch and only 2 vsum planes
        strong_ref, img_v, imf, imsq, vsum, sems = refs
        mkf = None
    else:
        strong_ref, img_v, imf, mkf, imsq, vsum, sems = refs
    batch_idx = pl.program_id(0)
    i = pl.program_id(1)
    n_strips = pl.num_programs(1)
    r = radius
    halo = _row_halo(r)

    def start_dma(slot, bb, ii):
        pltpu.make_async_copy(
            img_hbm.at[bb, pl.ds(ii * strip, strip + 2 * halo), :],
            img_v.at[slot],
            sems.at[slot],
        ).start()

    g = batch_idx * n_strips + i
    slot = jax.lax.rem(g, jnp.asarray(2, g.dtype))
    next_slot = jax.lax.rem(g + 1, jnp.asarray(2, g.dtype))

    @pl.when(g == 0)
    def _():
        start_dma(slot, batch_idx, i)

    @pl.when(i + 1 < n_strips)
    def _():
        start_dma(next_slot, batch_idx, i + 1)

    @pl.when((i + 1 >= n_strips) & (batch_idx + 1 < pl.num_programs(0)))
    def _():
        start_dma(next_slot, batch_idx + 1, 0)

    pltpu.make_async_copy(
        img_hbm.at[batch_idx, pl.ds(i * strip, strip + 2 * halo), :],
        img_v.at[slot],
        sems.at[slot],
    ).wait()

    if tree_impl == "roll":
        ok = _dispersion_predicate_roll(
            img_v,
            slot,
            mask_strips,
            mbox_strips,
            imf,
            imsq,
            vsum,
            strip=strip,
            radius=r,
            halo=halo,
            trusted_max=trusted_max,
            min_count=min_count,
            nsig_b=nsig_b,
            nsig_s=nsig_s,
            signal_test=signal_test,
        )
        # full-width ok (lane j = column j, pad lanes already false via the
        # zero mboxc padding): one aligned full-register store
        strong_ref[0] = ok.astype(jnp.int8)
        return

    ok = _dispersion_predicate(
        img_v,
        slot,
        mask_strips,
        mbox_strips,
        imf,
        mkf,
        imsq,
        vsum,
        strip=strip,
        radius=r,
        width=width,
        halo=halo,
        trusted_max=trusted_max,
        min_count=min_count,
        nsig_b=nsig_b,
        nsig_s=nsig_s,
        signal_test=signal_test,
        has_mbox=has_mbox,
    )

    _emit_strong8(ok, strong_ref, strip=strip, width=width, wp=wp)


@functools.partial(
    jax.jit,
    static_argnames=(
        "trusted_max",
        "min_count",
        "nsig_b",
        "nsig_s",
        "radius",
        "strip",
        "signal_test",
        "interpret",
    ),
)
def dispersion_packed(
    image: jnp.ndarray,
    mask: jnp.ndarray,
    trusted_max: float,
    *,
    mbox: jnp.ndarray | None = None,
    min_count: int = DEFAULT_MIN_COUNT,
    nsig_b: float = DEFAULT_NSIG_B,
    nsig_s: float = DEFAULT_NSIG_S,
    radius: int = KERNEL_RADIUS,
    strip: int = DEFAULT_STRIP_PACKED,
    signal_test: bool = True,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused dispersion threshold -> (words u32-in-i32, pc i32).

    ``words[..., h, j]`` packs strong flags for columns 32j..32j+31 (bit t =
    column 32j+t); ``pc[..., h, j]`` is the inclusive count of strong pixels
    in row h through word j.  Shapes (B?, H, nwl) where nwl is the padded
    word-lane count (:func:`_n_word_lanes`).  The two are lane-slices of one
    combined kernel output (see :func:`dispersion_packed_raw`), so using
    both costs no extra materialisation under jit.  Input contract matches
    :func:`dispersion_fused`; downstream compaction uses
    :func:`ffs_tpu.ops.compact.compact_from_words_flat`.
    """
    pcw = dispersion_packed_raw(
        image,
        mask,
        trusted_max,
        mbox=mbox,
        min_count=min_count,
        nsig_b=nsig_b,
        nsig_s=nsig_s,
        radius=radius,
        strip=strip,
        signal_test=signal_test,
        interpret=interpret,
    )
    nwl = pcw.shape[-1] // 2
    return pcw[..., nwl:], pcw[..., :nwl]


@functools.partial(
    jax.jit,
    static_argnames=(
        "trusted_max",
        "min_count",
        "nsig_b",
        "nsig_s",
        "radius",
        "strip",
        "signal_test",
        "interpret",
        "trim",
        "tree_impl",
        "pack",
    ),
)
def dispersion_packed_raw(
    image: jnp.ndarray,
    mask: jnp.ndarray,
    trusted_max: float,
    *,
    mbox: jnp.ndarray | None = None,
    min_count: int = DEFAULT_MIN_COUNT,
    nsig_b: float = DEFAULT_NSIG_B,
    nsig_s: float = DEFAULT_NSIG_S,
    radius: int = KERNEL_RADIUS,
    strip: int = DEFAULT_STRIP_PACKED,
    signal_test: bool = True,
    interpret: bool = False,
    trim: bool = True,
    tree_impl: str = "auto",
    pack: bool = True,
) -> jnp.ndarray:
    """Combined-row form: (B?, H, 2*nwl) i32 with lanes [pc | w32].

    ``pack=False`` returns the kernel's dense (B?, H, wp) i8 strong plane
    without the XLA bit-pack — measurement hook for isolating the
    _pack_pcw cost (tools/measure_bench_stages.py).

    This is the hot-path contract — compaction
    (:func:`ffs_tpu.ops.compact.compact_from_pcw_flat`) fetches each
    pixel's prefix counts AND strong words with a single row gather.

    ``trim=False`` keeps the strip-padded row count (rows beyond the image
    are all-zero: the zero-padded mask forces the predicate false there).
    The padded form matters for throughput: gathering from a SLICED view
    forces XLA's slow composite-gather path, while the whole padded array
    gathers fast; compact_from_pcw_flat handles the padded pitch natively.
    """
    image = _u32_pre_cast(image)
    squeeze = image.ndim == 2
    if squeeze:
        image = image[None]
    nb, h, w = image.shape
    n_strips = pl.cdiv(h, strip)
    hp = n_strips * strip
    r = radius
    halo = _row_halo(r)
    wp = ((w + 2 * r + 127) // 128) * 128
    nwl = _n_word_lanes(wp)
    img_p = jnp.pad(image, ((0, 0), (halo, hp - h + halo), (r, wp - w - r)))
    mask_p = jnp.pad(mask, ((halo, hp - h + halo), (r, wp - w - r)))
    strip_starts = jnp.arange(n_strips) * strip
    mask_strips = jax.vmap(
        lambda s0: jax.lax.dynamic_slice(mask_p, (s0, 0), (strip + 2 * halo, wp))
    )(strip_starts)

    has_mbox = mbox is not None
    if tree_impl == "auto":
        # roll trees measured 8.7% faster than slice trees on v5e with
        # bit-identical output (tools/measure_roll.py); they need the
        # precomputed mbox (production callers always pass it)
        tree_impl = "roll" if has_mbox else "slice"
    if tree_impl == "roll":
        if not has_mbox:
            raise ValueError("tree_impl='roll' requires a precomputed mbox")
        # centre-masked box count: folds the centre-validity test into the
        # m>1/min_count conditions (see _dispersion_predicate_roll); a
        # frame-invariant op, hoisted out of any rep/collection loop
        mbox = jnp.where(mask != 0, mbox, 0).astype(jnp.uint16)
    kernel = functools.partial(
        _dispersion_packed_kernel,
        strip=strip,
        radius=r,
        width=w,
        wp=wp,
        trusted_max=float(trusted_max),
        min_count=min_count,
        nsig_b=nsig_b,
        nsig_s=nsig_s,
        signal_test=signal_test,
        has_mbox=has_mbox,
        tree_impl=tree_impl,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(
            (1, strip + 2 * halo, wp),
            lambda b, i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    inputs = [img_p, mask_strips]
    if has_mbox:
        mbox_p = jnp.pad(mbox.astype(jnp.uint16), ((0, hp - h), (0, wp - w)))
        in_specs.append(
            pl.BlockSpec(
                (1, strip, wp), lambda b, i: (0, i, 0), memory_space=pltpu.VMEM
            )
        )
        inputs.append(mbox_p[None])
    out_spec = pl.BlockSpec(
        (1, strip, wp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    if tree_impl == "roll":
        scratch = [
            pltpu.VMEM((2, strip + 2 * halo, wp), image.dtype),
            pltpu.VMEM((strip + 2 * r, wp), jnp.float32),  # imf
            pltpu.VMEM((strip + 2 * r, wp), jnp.float32),  # imsq
            pltpu.VMEM((2, strip, wp), jnp.float32),  # vsum x/y
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        scratch = [
            pltpu.VMEM((2, strip + 2 * halo, wp), image.dtype),
            pltpu.VMEM((strip + 2 * r, wp), jnp.float32),
            pltpu.VMEM((strip + 2 * r, wp), jnp.float32),
            pltpu.VMEM((strip + 2 * r, wp), jnp.float32),
            pltpu.VMEM((3, strip, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    strong8 = pl.pallas_call(
        kernel,
        grid=(nb, n_strips),
        in_specs=in_specs,
        out_specs=[out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((nb, hp, wp), jnp.int8),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*inputs)[0]
    pcw = _pack_pcw(strong8, nwl) if pack else strong8
    if trim:
        pcw = pcw[:, :h]
    if squeeze:
        pcw = pcw[0]
    return pcw


@functools.partial(
    jax.jit,
    static_argnames=(
        "trusted_max",
        "min_count",
        "nsig_b",
        "nsig_s",
        "radius",
        "strip",
        "signal_test",
        "emit_strong",
        "interpret",
    ),
)
def dispersion_fused(
    image: jnp.ndarray,
    mask: jnp.ndarray,
    trusted_max: float,
    *,
    mbox: jnp.ndarray | None = None,
    min_count: int = DEFAULT_MIN_COUNT,
    nsig_b: float = DEFAULT_NSIG_B,
    nsig_s: float = DEFAULT_NSIG_S,
    radius: int = KERNEL_RADIUS,
    strip: int = DEFAULT_STRIP,
    signal_test: bool = True,
    emit_strong: bool = True,
    interpret: bool = False,
) -> tuple[jnp.ndarray | None, jnp.ndarray]:
    """Fused dispersion threshold -> (strong u8, rowcum i32), same shape as
    ``image`` which may be (H, W) or batched (B, H, W).

    ``signal_test=False`` gives the extended algorithm's first pass
    (background test only, thresholding.cu:253-342).  ``emit_strong=False``
    skips the dense u8 mask output entirely (the compaction path only needs
    ``rowcum``), saving one HBM output stream; returns (None, rowcum).
    ``mbox`` is the frame-invariant mask box count from
    :func:`mask_box_count`; when given, the kernel skips the mask grid's
    sliding sums.
    """
    image = _u32_pre_cast(image)
    squeeze = image.ndim == 2
    if squeeze:
        image = image[None]
    nb, h, w = image.shape
    n_strips = pl.cdiv(h, strip)
    hp = n_strips * strip
    r = radius
    halo = _row_halo(r)
    # lane-align the padded width to 128 so whole-row DMA slices are legal
    wp = ((w + 2 * r + 127) // 128) * 128
    img_p = jnp.pad(image, ((0, 0), (halo, hp - h + halo), (r, wp - w - r)))
    mask_p = jnp.pad(mask, ((halo, hp - h + halo), (r, wp - w - r)))
    # frame-invariant mask pre-cut into overlapping strips (auto-pipelined)
    strip_starts = jnp.arange(n_strips) * strip
    mask_strips = jax.vmap(
        lambda s0: jax.lax.dynamic_slice(mask_p, (s0, 0), (strip + 2 * halo, wp))
    )(strip_starts)

    has_mbox = mbox is not None
    kernel = functools.partial(
        _dispersion_kernel,
        strip=strip,
        radius=r,
        width=w,
        trusted_max=float(trusted_max),
        min_count=min_count,
        nsig_b=nsig_b,
        nsig_s=nsig_s,
        signal_test=signal_test,
        emit_strong=emit_strong,
        has_mbox=has_mbox,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(
            (1, strip + 2 * halo, wp),
            lambda b, i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    inputs = [img_p, mask_strips]
    if has_mbox:
        mbox_p = jnp.pad(mbox.astype(jnp.uint16), ((0, hp - h), (0, wp - w)))
        in_specs.append(
            pl.BlockSpec(
                (1, strip, wp), lambda b, i: (0, i, 0), memory_space=pltpu.VMEM
            )
        )
        inputs.append(mbox_p[None])
    out_spec = pl.BlockSpec(
        (1, strip, w), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    out_specs = [out_spec, out_spec] if emit_strong else [out_spec]
    out_shape = [jax.ShapeDtypeStruct((nb, hp, w), jnp.int32)]
    if emit_strong:
        out_shape.insert(0, jax.ShapeDtypeStruct((nb, hp, w), jnp.int32))
    outs = pl.pallas_call(
        kernel,
        grid=(nb, n_strips),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, strip + 2 * halo, wp), image.dtype),
            pltpu.VMEM((strip + 2 * r, wp), jnp.float32),
            pltpu.VMEM((strip + 2 * r, wp), jnp.float32),
            pltpu.VMEM((strip + 2 * r, wp), jnp.float32),
            pltpu.VMEM((3, strip, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*inputs)
    strong, rowcum = outs if emit_strong else (None, outs[0])
    rowcum = rowcum[:, :h]
    if strong is not None:
        strong = strong[:, :h].astype(jnp.uint8)
    if squeeze:
        rowcum = rowcum[0]
        if strong is not None:
            strong = strong[0]
    return strong, rowcum
