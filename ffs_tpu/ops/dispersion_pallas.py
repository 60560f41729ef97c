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


def _row_halo(radius: int) -> int:
    # Row halo rounded up to the TPU sublane tiling (8) so DMA slices stay
    # aligned; the extra rows are simply ignored by the compute slices.
    return ((radius + 7) // 8) * 8


def _dispersion_kernel(
    img_hbm,
    mask_strips,  # blocked input: (1, strip + 2*halo, wp) per grid step
    strong_ref,
    rowcum_ref,
    img_v,  # (2, strip + 2*halo, wp) double-buffered image strips
    imf,  # (strip + 2r, wp) f32 masked intensities
    mkf,  # (strip + 2r, wp) f32 mask
    imsq,  # (strip + 2r, wp) f32 masked squared intensities
    vsum,  # (3, strip, wp) f32: vertical running sums of (mask, I, I^2)
    hsum,  # (3, strip, wp) f32: horizontal box sums (only [:, :width] used)
    sems,
    *,
    strip: int,
    radius: int,
    width: int,
    trusted_max: float,
    min_count: int,
    nsig_b: float,
    nsig_s: float,
    signal_test: bool,
):
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

    # Convert the strip to f32 once (Mosaic lacks sub-32-bit -> f32 casts;
    # widen to i32 first), then the sliding sums are pure adds of slices.
    off = halo - r
    imf[...] = (
        img_v[slot, off : off + strip + 2 * r].astype(jnp.int32).astype(jnp.float32)
    )
    mkf[...] = (
        mask_strips[0, off : off + strip + 2 * r]
        .astype(jnp.int32)
        .astype(jnp.float32)
    )
    imf[...] *= mkf[...]  # masked intensities; mask is 0/1
    imsq[...] = imf[...] * imf[...]

    # Vertical sliding sums, accumulated through scratch refs so only O(1)
    # temporaries are live at once (Mosaic stack-allocates all SSA values).
    for dy in range(2 * r + 1):
        if dy == 0:
            vsum[0] = mkf[dy : dy + strip]
            vsum[1] = imf[dy : dy + strip]
            vsum[2] = imsq[dy : dy + strip]
        else:
            vsum[0] += mkf[dy : dy + strip]
            vsum[1] += imf[dy : dy + strip]
            vsum[2] += imsq[dy : dy + strip]

    # Horizontal sliding sums over the vertical sums.
    for k in range(3):
        for dx in range(2 * r + 1):
            contrib = vsum[k, :, pl.ds(dx, width)]
            if dx == 0:
                hsum[k, :, pl.ds(0, width)] = contrib
            else:
                hsum[k, :, pl.ds(0, width)] += contrib

    m = hsum[0, :, pl.ds(0, width)]
    x = hsum[1, :, pl.ds(0, width)]
    y = hsum[2, :, pl.ds(0, width)]
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

    strong_ref[0] = ok.astype(jnp.uint8)

    # within-row inclusive prefix sum: log-shift accumulation through the
    # output ref keeps liveness bounded
    rowcum_ref[0] = ok.astype(jnp.int32)
    shift = 1
    while shift < width:
        cur = rowcum_ref[0]
        rowcum_ref[0] = cur + jnp.pad(cur, ((0, 0), (shift, 0)))[:, :width]
        shift *= 2


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
def dispersion_fused(
    image: jnp.ndarray,
    mask: jnp.ndarray,
    trusted_max: float,
    *,
    min_count: int = DEFAULT_MIN_COUNT,
    nsig_b: float = DEFAULT_NSIG_B,
    nsig_s: float = DEFAULT_NSIG_S,
    radius: int = KERNEL_RADIUS,
    strip: int = DEFAULT_STRIP,
    signal_test: bool = True,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused dispersion threshold -> (strong u8, rowcum i32), same shape as
    ``image`` which may be (H, W) or batched (B, H, W).

    ``signal_test=False`` gives the extended algorithm's first pass
    (background test only, thresholding.cu:253-342).
    """
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
    )
    strong, rowcum = pl.pallas_call(
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
        out_specs=[
            pl.BlockSpec(
                (1, strip, w), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, strip, w), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, hp, w), jnp.uint8),
            jax.ShapeDtypeStruct((nb, hp, w), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, strip + 2 * halo, wp), image.dtype),
            pltpu.VMEM((strip + 2 * r, wp), jnp.float32),
            pltpu.VMEM((strip + 2 * r, wp), jnp.float32),
            pltpu.VMEM((strip + 2 * r, wp), jnp.float32),
            pltpu.VMEM((3, strip, wp), jnp.float32),
            pltpu.VMEM((3, strip, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(img_p, mask_strips)
    strong, rowcum = strong[:, :h], rowcum[:, :h]
    if squeeze:
        strong, rowcum = strong[0], rowcum[0]
    return strong, rowcum
