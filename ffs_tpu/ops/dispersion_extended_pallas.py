"""Fused Pallas TPU kernel for the extended (erosion) dispersion algorithm.

The reference runs three CUDA kernels per frame — dispersion first pass,
morphological erosion, second pass with an 11x11 background mean
(reference: spotfinder/spotfinder.cu:213-347, kernels/thresholding.cu:
253-491, kernels/erosion.cu:53-143).  Here all three stages fuse into one
kernel per row-strip: the first-pass mask is computed for the strip plus a
7-pixel apron (second-pass radius 5 + erosion distance 2), erosion and the
second-pass background mean then evaluate entirely in VMEM, and the kernel
emits the final strong mask plus within-row prefix counts — the same output
contract as dispersion_fused, so the compaction/CC stages are shared.

Coordinate bookkeeping: every scratch grid is annotated with the global
(row, col) of its [0, 0] element relative to the output strip's top-left
pixel; slices between grids are pure offset arithmetic on those origins.
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
    EROSION_CHEBYSHEV_DISTANCE,
    KERNEL_RADIUS,
    KERNEL_RADIUS_EXTENDED,
)

DEFAULT_STRIP = 64

_R = KERNEL_RADIUS  # 3
_RX = KERNEL_RADIUS_EXTENDED  # 5
_E = EROSION_CHEBYSHEV_DISTANCE  # 2
_APRON = _RX + _E  # 7: rows/cols needing a first-pass value
_IMG = _APRON + _R  # 10: image halo


def _row_halo() -> int:
    return ((_IMG + 7) // 8) * 8  # 16


def mask_box_count_extended(mask: jnp.ndarray, *, strip: int = DEFAULT_STRIP):
    """Frame-invariant first-pass mask box count on the padded canvas.

    Computed ONCE per collection and passed to the packed extended kernel
    as ``mbox``: the kernel then skips the mask grid's stage-1 sliding
    sums (the same trick as dispersion_pallas.mask_box_count).  The canvas
    matches the kernel's padding (halo rows, _IMG lane offset) with 128
    extra lanes so per-strip slices at the grid-1 offset stay in range.
    """
    from .dispersion import box_sum

    h, w = mask.shape
    n_strips = pl.cdiv(h, strip)
    hp = n_strips * strip
    halo = _row_halo()
    wp = ((w + 2 * _IMG + 127) // 128) * 128
    mask_p = jnp.pad(mask, ((halo, hp - h + halo), (_IMG, wp - w - _IMG + 128)))
    return box_sum((mask_p != 0).astype(jnp.int32), _R).astype(jnp.uint16)


def _ext_predicate_roll(
    imf,
    mkf,
    disp,
    surv,
    wk0,
    wk1,
    wk2,
    mboxc,
    *,
    strip: int,
    trusted_max: float,
    min_count: int,
    nsig_b: float,
    nsig_s: float,
):
    """Full-register roll formulation of all three extended stages.

    Same float semantics as the slice path (stage-1's rounding-sensitive
    y tree keeps the canonical order; every other grid is integer-exact);
    the window shifts ride pltpu.roll over whole (rows, wp) registers.
    Alignment convention: a grid produced by a (2k+1)-wide roll tree has
    its row/lane origin advanced by k, so stage-1 grids sit at origin
    -_APRON, stage-2 at -_RX, stage-3 at 0 — inter-grid reads are just
    rolls by the origin difference.  Requires the CENTRE-MASKED stage-1
    box count ``mboxc`` (folds the msk1>0 test, as in
    dispersion_pallas._dispersion_predicate_roll); all roll wrap garbage
    lands in lanes where the zero-padded mask/mbox force the predicates
    false (left pad = _IMG >= every shift used, right pad >= 10 lanes).
    """
    from .dispersion_pallas import _f32, _rollm

    n1 = strip + 2 * _APRON
    n2 = strip + 2 * _RX

    def rm2(v, k):
        return _rollm(_rollm(v, k, 0), k, 1)

    def vroll7(v):
        s2 = v + _rollm(v, 1, 0)
        s4 = s2 + _rollm(s2, 2, 0)
        return (s4 + _rollm(s2, 4, 0)) + _rollm(v, 6, 0)

    def hroll7(v):
        s2 = v + _rollm(v, 1, 1)
        s4 = s2 + _rollm(s2, 2, 1)
        return (s4 + _rollm(s2, 4, 1)) + _rollm(v, 6, 1)

    def roll5(v, ax):
        # 5-wide tree, parts [4, 1]: (s2 + s2>>2) + s1>>4
        s2 = v + _rollm(v, 1, ax)
        return (s2 + _rollm(s2, 2, ax)) + _rollm(v, 4, ax)

    def roll11(v, ax):
        # 11-wide tree, parts [8, 2, 1] with s8 = s4 + s4>>4
        s2 = v + _rollm(v, 1, ax)
        s4 = s2 + _rollm(s2, 2, ax)
        return ((s4 + _rollm(s4, 4, ax)) + _rollm(s2, 8, ax)) + _rollm(
            v, 10, ax
        )

    # ---- stage 1: first pass (grid origin -_APRON) -------------------------
    m = _f32(mboxc[0])  # (n1, wp), centre-masked
    wk1[...] = vroll7(imf[...])
    x = hroll7(wk1[...])[0:n1]
    wk2[...] = imf[...] * imf[...]
    wk0[...] = vroll7(wk2[...])
    y = hroll7(wk0[...])[0:n1]
    src1 = rm2(imf[...], _R)[0:n1]
    a = m * y - x * x - x * (m - 1.0)
    cthr = x * nsig_b * jnp.sqrt(jnp.maximum(2.0 * (m - 1.0), 0.0))
    first = (src1 <= trusted_max) & (m >= min_count) & (m > 1) & (a > cthr)
    disp[...] = first.astype(jnp.float32)

    # ---- stage 2: erosion (grid origin -_RX) --------------------------------
    msk1 = rm2(mkf[...], _R)[0:n1]
    wk1[0:n1] = msk1 * (1.0 - disp[...])
    bgnear = roll5(roll5(wk1[0:n1], 0), 1)
    centre1 = rm2(disp[...], _E)
    surv[...] = ((centre1[0:n2] > 0) & (bgnear[0:n2] == 0)).astype(
        jnp.float32
    )

    # ---- stage 3: second pass (grid origin 0) -------------------------------
    wk0[0:n2] = rm2(mkf[...], _RX)[0:n2] * (1.0 - surv[...])
    wk1[0:n2] = wk0[0:n2] * rm2(imf[...], _RX)[0:n2]
    nbg = roll11(roll11(wk0[0:n2], 0), 1)[0:strip]
    xbg = roll11(roll11(wk1[0:n2], 0), 1)[0:strip]
    src_c = rm2(imf[...], _IMG)[0:strip]
    mask_c = rm2(mkf[...], _IMG)[0:strip]
    sur_c = rm2(surv[...], _RX)[0:strip]
    # mean = x/n for n > 1 else 0 (quirk preserved from thresholding.cu:482)
    mean = jnp.where(nbg > 1, xbg / jnp.maximum(nbg, 1.0), 0.0)
    local_ok = src_c >= mean + nsig_s * jnp.sqrt(mean)
    return (
        (mask_c > 0)
        & (src_c <= trusted_max)
        & (nbg > 0)
        & (sur_c > 0)
        & (src_c > 0.0)
        & local_ok
    )


def _ext_kernel(
    *args,  # inputs, output refs, scratch (see unpack below)
    strip: int,
    width: int,
    trusted_max: float,
    min_count: int,
    nsig_b: float,
    nsig_s: float,
    emit_strong: bool,
    packed: bool = False,
    wp: int = 0,
    has_mbox: bool = False,
    tree_impl: str = "slice",
):
    # scratch: img_v (2, strip+2*row_halo, wp) raw strips (origin row
    # -row_halo); imf/mkf (strip+2*_IMG, wp) f32 masked I / mask, origin
    # (-_IMG, -_IMG); disp (strip+2*_APRON, wp) f32 first-pass mask, origin
    # (-_APRON, -_APRON); surv (strip+2*_RX, wp) f32 survived mask, origin
    # (-_RX, -_RX); w0/w1/w2 (strip+2*_IMG, wp) f32 tree scratch.  The
    # three slots are separate 2D refs, NOT one (3, rows, wp) ref: Mosaic
    # requires mid-dimension slices of >=3D refs to be 8-row aligned, and
    # strip+2*_IMG is not a multiple of 8 (plain 2D refs have no such
    # constraint).
    if packed and has_mbox:
        img_hbm, mask_strips, mbox_strips, *refs = args
        strong_ref, img_v, imf, mkf, disp, surv, wk0, wk1, wk2, sems = refs
    elif packed:
        img_hbm, mask_strips, *refs = args
        mbox_strips = None
        strong_ref, img_v, imf, mkf, disp, surv, wk0, wk1, wk2, sems = refs
    elif emit_strong:
        img_hbm, mask_strips, *refs = args
        strong_ref, rowcum_ref, img_v, imf, mkf, disp, surv, wk0, wk1, wk2, sems = refs
    else:
        img_hbm, mask_strips, *refs = args
        rowcum_ref, img_v, imf, mkf, disp, surv, wk0, wk1, wk2, sems = refs
    batch_idx = pl.program_id(0)
    i = pl.program_id(1)
    n_strips = pl.num_programs(1)
    halo = _row_halo()

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

    from .dispersion_pallas import _f32

    # imf/mkf rows cover global rows [-_IMG, strip+_IMG); img_v covers
    # [-halo, strip+halo): offset = halo - _IMG
    off = halo - _IMG
    imf[...] = _f32(img_v[slot, off : off + strip + 2 * _IMG])
    mkf[...] = _f32(mask_strips[0, off : off + strip + 2 * _IMG])
    imf[...] *= mkf[...]

    if tree_impl == "roll":
        # full-register roll path (production packed+mbox configuration);
        # mbox_strips carries the CENTRE-MASKED box count (see wrapper)
        ok = _ext_predicate_roll(
            imf,
            mkf,
            disp,
            surv,
            wk0,
            wk1,
            wk2,
            mbox_strips,
            strip=strip,
            trusted_max=trusted_max,
            min_count=min_count,
            nsig_b=nsig_b,
            nsig_s=nsig_s,
        )
        # lane j = column j; pad lanes already false via the zero-padded
        # mask, so one aligned full-register store
        strong_ref[0] = ok.astype(jnp.int8)
        return

    # All window sums below use the canonical shared-subsum tree order
    # (ops/dispersion._tree_window_axis; in-kernel helpers _vtree7/_htree7
    # for the 7-wide stage-1 windows, hand-unrolled 5-/11-wide trees for
    # stages 2/3).  Stage-1's y = window(I^2) grid rounds in f32, so its
    # tree order is the bit-parity contract with the jnp oracle; every
    # other grid is integer-valued with partial sums < 2^24 (exact under
    # any order).
    from .dispersion_pallas import _f32, _htree7, _vtree7

    # ---- stage 1: first pass on the (-_APRON..strip+_APRON) grid ----------
    # first-pass row j (global -_APRON+j) uses image rows j..j+6 of imf;
    # grid1 lane l corresponds to imf lane l + _R (global col -_APRON + l)
    n1 = strip + 2 * _APRON
    w1 = width + 2 * _APRON
    if has_mbox:
        m = _f32(mbox_strips[0, 0:n1, pl.ds(0, w1)])
    else:
        wk1[0:n1] = _vtree7(mkf, wk0, disp, n1)
        m = _htree7(wk1, wk0, disp, n1, w1)
    wk1[0:n1] = _vtree7(imf, wk0, disp, n1)
    x = _htree7(wk1, wk0, disp, n1, w1)
    wk2[...] = imf[...] * imf[...]
    wk1[0:n1] = _vtree7(wk2, wk0, disp, n1)
    ysum = _htree7(wk1, wk0, disp, n1, w1)

    src1 = imf[_R : _R + n1, pl.ds(_R, w1)]
    msk1 = mkf[_R : _R + n1, pl.ds(_R, w1)]
    a = m * ysum - x * x - x * (m - 1.0)
    cthr = x * nsig_b * jnp.sqrt(jnp.maximum(2.0 * (m - 1.0), 0.0))
    first = (
        (msk1 > 0)
        & (src1 <= trusted_max)
        & (m >= min_count)
        & (m > 1)
        & (a > cthr)
    )
    disp[:, pl.ds(0, w1)] = first.astype(jnp.float32)
    # disp grid: row j / lane l -> global (-_APRON + j, -_APRON + l)

    # ---- stage 2: erosion -> survived on the (-_RX..strip+_RX) grid -------
    # 5-wide tree (parts [4, 1]): W[i] = s4[i] + s1[i+4].  Integer counts,
    # exact.  bgf grid: valid-mask background indicator on disp rows
    # 0..n2+3 (mkf row offset 3, lane offset 3).
    n2 = strip + 2 * _RX
    w2 = width + 2 * _RX
    wb = w2 + 2 * _E
    wk1[0 : n2 + 4, pl.ds(0, wb)] = mkf[3 : 3 + n2 + 4, pl.ds(3, wb)] * (
        1.0 - disp[0 : n2 + 4, pl.ds(0, wb)]
    )
    wk0[0 : n2 + 2, pl.ds(0, wb)] = (
        wk1[0 : n2 + 2, pl.ds(0, wb)] + wk1[1 : n2 + 3, pl.ds(0, wb)]
    )
    surv[0:n2, pl.ds(0, wb)] = (
        wk0[0:n2, pl.ds(0, wb)] + wk0[2 : n2 + 2, pl.ds(0, wb)]
    )
    wk0[0:n2, pl.ds(0, wb)] = (
        surv[0:n2, pl.ds(0, wb)] + wk1[4 : n2 + 4, pl.ds(0, wb)]
    )
    wk1[0:n2, pl.ds(0, w2 + 2)] = (
        wk0[0:n2, pl.ds(0, w2 + 2)] + wk0[0:n2, pl.ds(1, w2 + 2)]
    )
    surv[0:n2, pl.ds(0, w2)] = (
        wk1[0:n2, pl.ds(0, w2)] + wk1[0:n2, pl.ds(2, w2)]
    )
    bgnear = surv[0:n2, pl.ds(0, w2)] + wk0[0:n2, pl.ds(4, w2)]
    # centre: disp row (_APRON-_RX) + j = 2 + j, lane 2 + l
    centre1 = disp[_E : _E + n2, pl.ds(_E, w2)]
    surv[:, pl.ds(0, w2)] = ((centre1 > 0) & (bgnear == 0)).astype(jnp.float32)
    # surv grid: row j / lane l -> global (-_RX + j, -_RX + l)

    # ---- stage 3: second pass on the output grid ---------------------------
    # 11-wide tree (parts [8, 2, 1]): W[i] = (s8[i] + s2[i+8]) + s1[i+10]
    # with s8 inlined as s4[i] + s4[i+4] (same association, no extra
    # scratch).  Both grids are integer-valued (counts; intensity sums
    # <= 121 * 65535 < 2^23), exact.  cn/cx: bg indicator and bg intensity
    # on the surv grid (imf/mkf row offset 5, lane offset 5).
    wk1[0:n2, pl.ds(0, w2)] = mkf[5 : 5 + n2, pl.ds(5, w2)] * (
        1.0 - surv[:, pl.ds(0, w2)]
    )
    wk2[0:n2, pl.ds(0, w2)] = (
        wk1[0:n2, pl.ds(0, w2)] * imf[5 : 5 + n2, pl.ds(5, w2)]
    )
    # cn vertical: s2 -> w0, s4 -> disp, result -> disp rows 0..strip-1
    wk0[0 : n2 - 1, pl.ds(0, w2)] = (
        wk1[0 : n2 - 1, pl.ds(0, w2)] + wk1[1:n2, pl.ds(0, w2)]
    )
    disp[0 : strip + 4, pl.ds(0, w2)] = (
        wk0[0 : strip + 4, pl.ds(0, w2)]
        + wk0[2 : strip + 6, pl.ds(0, w2)]
    )
    disp[0:strip, pl.ds(0, w2)] = (
        (disp[0:strip, pl.ds(0, w2)] + disp[4 : strip + 4, pl.ds(0, w2)])
        + wk0[8 : strip + 8, pl.ds(0, w2)]
    ) + wk1[10 : strip + 10, pl.ds(0, w2)]
    # cx vertical: s2 -> w0, s4 -> w1, result -> w2
    wk0[0 : n2 - 1, pl.ds(0, w2)] = (
        wk2[0 : n2 - 1, pl.ds(0, w2)] + wk2[1:n2, pl.ds(0, w2)]
    )
    wk1[0 : strip + 4, pl.ds(0, w2)] = (
        wk0[0 : strip + 4, pl.ds(0, w2)]
        + wk0[2 : strip + 6, pl.ds(0, w2)]
    )
    wk2[0:strip, pl.ds(0, w2)] = (
        (wk1[0:strip, pl.ds(0, w2)] + wk1[4 : strip + 4, pl.ds(0, w2)])
        + wk0[8 : strip + 8, pl.ds(0, w2)]
    ) + wk2[10 : strip + 10, pl.ds(0, w2)]
    # cn horizontal
    wk0[0:strip, pl.ds(0, width + 8)] = (
        disp[0:strip, pl.ds(0, width + 8)] + disp[0:strip, pl.ds(1, width + 8)]
    )
    wk1[0:strip, pl.ds(0, width + 4)] = (
        wk0[0:strip, pl.ds(0, width + 4)]
        + wk0[0:strip, pl.ds(2, width + 4)]
    )
    nbg = (
        (
            wk1[0:strip, pl.ds(0, width)]
            + wk1[0:strip, pl.ds(4, width)]
        )
        + wk0[0:strip, pl.ds(8, width)]
    ) + disp[0:strip, pl.ds(10, width)]
    # cx horizontal
    wk0[0:strip, pl.ds(0, width + 8)] = (
        wk2[0:strip, pl.ds(0, width + 8)]
        + wk2[0:strip, pl.ds(1, width + 8)]
    )
    wk1[0:strip, pl.ds(0, width + 4)] = (
        wk0[0:strip, pl.ds(0, width + 4)]
        + wk0[0:strip, pl.ds(2, width + 4)]
    )
    xbg = (
        (
            wk1[0:strip, pl.ds(0, width)]
            + wk1[0:strip, pl.ds(4, width)]
        )
        + wk0[0:strip, pl.ds(8, width)]
    ) + wk2[0:strip, pl.ds(10, width)]

    src_c = imf[_IMG : _IMG + strip, pl.ds(_IMG, width)]
    mask_c = mkf[_IMG : _IMG + strip, pl.ds(_IMG, width)]
    sur_c = surv[_RX : _RX + strip, pl.ds(_RX, width)]
    # mean = x/n for n > 1 else 0 (quirk preserved from thresholding.cu:482)
    mean = jnp.where(nbg > 1, xbg / jnp.maximum(nbg, 1.0), 0.0)
    local_ok = src_c >= mean + nsig_s * jnp.sqrt(mean)
    ok = (
        (mask_c > 0)
        & (src_c <= trusted_max)
        & (nbg > 0)
        & (sur_c > 0)
        & (src_c > 0.0)
        & local_ok
    )

    if packed:
        from .dispersion_pallas import _emit_strong8

        _emit_strong8(ok, strong_ref, strip=strip, width=width, wp=wp)
        return
    if emit_strong:
        # i32 store: Mosaic's bool->u8 lowering routes through an i32->u8
        # convert that fails to compile under x64; the (non-production)
        # wrapper casts to u8 in XLA instead
        strong_ref[0] = ok.astype(jnp.int32)
    rowcum_ref[0] = ok.astype(jnp.int32)
    shift = 1
    while shift < width:
        cur = rowcum_ref[0]
        rowcum_ref[0] = cur + jnp.pad(
            cur, ((0, 0), (shift, 0)), constant_values=cur.dtype.type(0)
        )[:, :width]
        shift *= 2


@functools.partial(
    jax.jit,
    static_argnames=(
        "trusted_max",
        "min_count",
        "nsig_b",
        "nsig_s",
        "strip",
        "emit_strong",
        "interpret",
    ),
)
def dispersion_extended_fused(
    image: jnp.ndarray,
    mask: jnp.ndarray,
    trusted_max: float,
    *,
    min_count: int = DEFAULT_MIN_COUNT,
    nsig_b: float = DEFAULT_NSIG_B,
    nsig_s: float = DEFAULT_NSIG_S,
    strip: int = DEFAULT_STRIP,
    emit_strong: bool = True,
    interpret: bool = False,
) -> tuple[jnp.ndarray | None, jnp.ndarray]:
    """Fused extended dispersion -> (strong u8, rowcum i32); input (H, W) or
    (B, H, W).  ``emit_strong=False`` drops the dense u8 output (compaction
    needs only ``rowcum``) and returns (None, rowcum)."""
    from .dispersion_pallas import _u32_pre_cast

    image = _u32_pre_cast(image)
    squeeze = image.ndim == 2
    if squeeze:
        image = image[None]
    nb, h, w = image.shape
    n_strips = pl.cdiv(h, strip)
    hp = n_strips * strip
    halo = _row_halo()
    wp = ((w + 2 * _IMG + 127) // 128) * 128
    img_p = jnp.pad(image, ((0, 0), (halo, hp - h + halo), (_IMG, wp - w - _IMG)))
    mask_p = jnp.pad(mask, ((halo, hp - h + halo), (_IMG, wp - w - _IMG)))
    strip_starts = jnp.arange(n_strips) * strip
    mask_strips = jax.vmap(
        lambda s0: jax.lax.dynamic_slice(mask_p, (s0, 0), (strip + 2 * halo, wp))
    )(strip_starts)

    kernel = functools.partial(
        _ext_kernel,
        strip=strip,
        width=w,
        trusted_max=float(trusted_max),
        min_count=min_count,
        nsig_b=nsig_b,
        nsig_s=nsig_s,
        emit_strong=emit_strong,
    )
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
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, strip + 2 * halo, wp),
                lambda b, i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, strip + 2 * halo, wp), image.dtype),
            pltpu.VMEM((strip + 2 * _IMG, wp), jnp.float32),
            pltpu.VMEM((strip + 2 * _IMG, wp), jnp.float32),
            pltpu.VMEM((strip + 2 * _APRON, wp), jnp.float32),
            pltpu.VMEM((strip + 2 * _RX, wp), jnp.float32),
            pltpu.VMEM((strip + 2 * _IMG, wp), jnp.float32),
            pltpu.VMEM((strip + 2 * _IMG, wp), jnp.float32),
            pltpu.VMEM((strip + 2 * _IMG, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(img_p, mask_strips)
    strong, rowcum = outs if emit_strong else (None, outs[0])
    rowcum = rowcum[:, :h]
    if strong is not None:
        strong = strong[:, :h].astype(jnp.uint8)
    if squeeze:
        rowcum = rowcum[0]
        if strong is not None:
            strong = strong[0]
    return strong, rowcum


@functools.partial(
    jax.jit,
    static_argnames=(
        "trusted_max",
        "min_count",
        "nsig_b",
        "nsig_s",
        "strip",
        "interpret",
        "tree_impl",
    ),
)
def dispersion_extended_packed(
    image: jnp.ndarray,
    mask: jnp.ndarray,
    trusted_max: float,
    *,
    min_count: int = DEFAULT_MIN_COUNT,
    nsig_b: float = DEFAULT_NSIG_B,
    nsig_s: float = DEFAULT_NSIG_S,
    strip: int = DEFAULT_STRIP,
    interpret: bool = False,
    mbox: jnp.ndarray | None = None,
    tree_impl: str = "auto",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused extended dispersion -> (packed words, word-prefix counts).

    Same output contract as
    :func:`ffs_tpu.ops.dispersion_pallas.dispersion_packed` (lane-slices of
    one combined [pc | w32] output, see dispersion_extended_packed_raw);
    downstream compaction is compact_from_words_flat / compact_from_pcw_flat.
    ``mbox``/``tree_impl`` forward to the raw form exactly like the
    non-extended sibling, so wrapper callers get the roll-tree fast path.
    """
    pcw = dispersion_extended_packed_raw(
        image, mask, trusted_max, mbox=mbox, min_count=min_count,
        nsig_b=nsig_b, nsig_s=nsig_s, strip=strip, interpret=interpret,
        tree_impl=tree_impl,
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
        "strip",
        "interpret",
        "trim",
        "tree_impl",
    ),
)
def dispersion_extended_packed_raw(
    image: jnp.ndarray,
    mask: jnp.ndarray,
    trusted_max: float,
    *,
    mbox: jnp.ndarray | None = None,
    min_count: int = DEFAULT_MIN_COUNT,
    nsig_b: float = DEFAULT_NSIG_B,
    nsig_s: float = DEFAULT_NSIG_S,
    strip: int = DEFAULT_STRIP,
    interpret: bool = False,
    trim: bool = True,
    tree_impl: str = "auto",
) -> jnp.ndarray:
    """Combined-row form: (B?, H, 2*nwl) i32 with lanes [pc | w32].

    ``mbox`` is the frame-invariant first-pass mask box count from
    :func:`mask_box_count_extended` (same ``strip``); when given, the
    kernel skips the stage-1 mask sliding sums.  ``tree_impl`` picks the
    window-sum lowering: "slice" (sub-width slices) or "roll"
    (full-register pltpu.roll, needs mbox, bit-identical output — see
    tools/measure_roll.py); "auto" = roll when mbox is given.

    ``trim=False`` keeps the strip-padded row count exactly like
    :func:`ffs_tpu.ops.dispersion_pallas.dispersion_packed_raw` (padded
    rows are all-zero: the zero-padded mask forces the predicate false) —
    the batched path gathers from the whole padded array to avoid XLA's
    slow sliced-view composite-gather lowering.
    """
    from .dispersion_pallas import (
        _n_word_lanes,
        _pack_pcw,
        _u32_pre_cast,
    )

    image = _u32_pre_cast(image)
    squeeze = image.ndim == 2
    if squeeze:
        image = image[None]
    nb, h, w = image.shape
    n_strips = pl.cdiv(h, strip)
    hp = n_strips * strip
    halo = _row_halo()
    wp = ((w + 2 * _IMG + 127) // 128) * 128
    nwl = _n_word_lanes(wp)
    img_p = jnp.pad(image, ((0, 0), (halo, hp - h + halo), (_IMG, wp - w - _IMG)))
    mask_p = jnp.pad(mask, ((halo, hp - h + halo), (_IMG, wp - w - _IMG)))
    strip_starts = jnp.arange(n_strips) * strip
    mask_strips = jax.vmap(
        lambda s0: jax.lax.dynamic_slice(mask_p, (s0, 0), (strip + 2 * halo, wp))
    )(strip_starts)

    has_mbox = mbox is not None
    if has_mbox and mbox.shape != (hp + 2 * halo, wp + 128):
        # a mismatched canvas (e.g. mbox built at a different strip) would
        # be silently CLAMPED by the per-strip dynamic_slice windows below,
        # shifting box counts in the bottom strips — fail loudly instead
        raise ValueError(
            f"mbox shape {tuple(mbox.shape)} does not match this call's "
            f"canvas {(hp + 2 * halo, wp + 128)}; build it with "
            f"mask_box_count_extended(mask, strip={strip}) at the same "
            "image geometry"
        )
    if tree_impl == "auto":
        tree_impl = "roll" if has_mbox else "slice"
    if tree_impl == "roll":
        if not has_mbox:
            raise ValueError("tree_impl='roll' requires a precomputed mbox")
        # centre-masked box count (folds the stage-1 msk1>0 test, see
        # _ext_predicate_roll); frame-invariant, hoisted out of rep loops.
        # The mbox canvas is 128 lanes wider than mask_p (see
        # mask_box_count_extended), so rebuild its mask at canvas shape.
        mask_canvas = jnp.pad(
            mask,
            (
                (halo, hp - h + halo),
                (_IMG, mbox.shape[1] - w - _IMG),
            ),
        )
        mbox = jnp.where(mask_canvas != 0, mbox, 0).astype(mbox.dtype)
    kernel = functools.partial(
        _ext_kernel,
        strip=strip,
        width=w,
        trusted_max=float(trusted_max),
        min_count=min_count,
        nsig_b=nsig_b,
        nsig_s=nsig_s,
        emit_strong=False,
        packed=True,
        wp=wp,
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
        # per-strip grid-1 windows of the precomputed box count: rows
        # [i*strip - _APRON, ...), lanes at the grid-1 offset _IMG - _APRON
        mb_starts = jnp.arange(n_strips) * strip + (halo - _APRON)
        mbox_strips = jax.vmap(
            lambda s0: jax.lax.dynamic_slice(
                mbox, (s0, _IMG - _APRON), (strip + 2 * _APRON, wp)
            )
        )(mb_starts)
        in_specs.append(
            pl.BlockSpec(
                (1, strip + 2 * _APRON, wp),
                lambda b, i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(mbox_strips)
    out_spec = pl.BlockSpec(
        (1, strip, wp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        kernel,
        grid=(nb, n_strips),
        in_specs=in_specs,
        out_specs=[out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((nb, hp, wp), jnp.int8),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, strip + 2 * halo, wp), image.dtype),
            pltpu.VMEM((strip + 2 * _IMG, wp), jnp.float32),
            pltpu.VMEM((strip + 2 * _IMG, wp), jnp.float32),
            pltpu.VMEM((strip + 2 * _APRON, wp), jnp.float32),
            pltpu.VMEM((strip + 2 * _RX, wp), jnp.float32),
            pltpu.VMEM((strip + 2 * _IMG, wp), jnp.float32),
            pltpu.VMEM((strip + 2 * _IMG, wp), jnp.float32),
            pltpu.VMEM((strip + 2 * _IMG, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*inputs)
    pcw = _pack_pcw(outs[0], nwl)
    if trim:
        pcw = pcw[:, :h]
    if squeeze:
        pcw = pcw[0]
    return pcw
