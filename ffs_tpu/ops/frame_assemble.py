"""Pallas TPU kernel: flat decoded pixel stream -> row-major frames.

The device bitshuffle untranspose (ops/bitshuffle_device) naturally emits
the frame as a FLAT element stream (bitshuffle blocks ignore row
boundaries).  Reassembling (B, H, W) frames from that stream is a pure
relayout, but detector widths are not lane-aligned (Eiger 4148 = 4·17·61),
so XLA lowers the reshape as a byte-granular relayout measured at
~10 GB/s — 4-5 ms per Eiger frame, 3x the entire spotfind pipeline
(tools/measure_ingest.py history).  This kernel does the relayout at VPU
speed with the one structure TPUs handle well:

  * the output strip height is chosen so every strip starts 128-lane
    aligned in the flat stream (strip = 128/gcd(W, 128) rows), making
    each in-strip row's lane shift a STATIC constant;
  * elements stay WIDE (one per u32 word) end-to-end — u16 appears only
    in the final narrowing convert, because Mosaic supports neither
    sub-32-bit lane rolls nor bitwidth-changing bitcasts;
  * each output row is one dynamic-sublane read + one static lane roll +
    one select + one convert (reference analogue: none — the reference
    decodes on the host where row assembly is free; this is the price of
    offloading decode to the accelerator, spotfinder.cc:823-855's TODO).

Output width is padded to a 128 multiple (columns >= W hold following-
stream garbage and MUST be masked off by the consumer's detector mask —
the spotfind kernels already gate every pixel through the mask).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def padded_width(w: int) -> int:
    """Output width: W rounded up to a 128-lane multiple."""
    return ((w + 127) // 128) * 128


def _strip_rows(w: int) -> int:
    """Smallest strip height whose flat span is a multiple of 8 flat ROWS
    of 128 lanes (= 1024 elements).  That makes every per-strip DMA
    offset 8-sublane-aligned AND every in-strip scratch read offset fully
    static — Mosaic requires the former and faults on dynamic unaligned
    sublane reads (observed as a TPU worker crash, not a compile error).
    Also satisfies the Mosaic output-block sublane constraint (>= 8).
    """
    return max(1024 // math.gcd(w, 1024), 8)


def _assemble_kernel(
    el_ref, out_ref, scratch, sem, *, w: int, strip: int, nrows: int
):
    b = pl.program_id(0)
    g = pl.program_id(1)
    ntiles = out_ref.shape[-1] // 128
    k = (w * strip) // 128  # flat rows consumed per strip (multiple of 8)
    r0 = k * g  # 8-aligned dynamic DMA offset

    cp = pltpu.make_async_copy(
        el_ref.at[b, pl.ds(r0, nrows), :], scratch, sem
    )
    cp.start()
    cp.wait()

    lane = jax.lax.broadcasted_iota(jnp.int32, (ntiles, 128), 1)
    for y in range(strip):
        off = w * y
        a_stat, l = off // 128, off % 128  # both STATIC per y
        src = scratch[a_stat : a_stat + ntiles + 1]
        r1 = pltpu.roll(src, 128 - l, 1) if l else src
        sel = jnp.where(
            lane < 128 - l, r1[0:ntiles], r1[1 : ntiles + 1]
        ) if l else r1[0:ntiles]
        row16 = (sel & jnp.uint32(0xFFFF)).astype(jnp.uint16)
        out_ref[0, y : y + 1] = row16.reshape(1, ntiles * 128)


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret"))
def frames_from_flat_wide(el_wide, h: int, w: int, interpret: bool = False):
    """(B, N) u32 wide-element flat stream -> (B, h, padded_width(w)) u16.

    ``el_wide`` holds one pixel per u32 word in frame raster order (the
    untranspose output before any narrowing).  N must cover the padded
    read span; the wrapper zero-pads.  Columns >= w of the output are
    garbage for every row (mask downstream).
    """
    bsz, n = el_wide.shape
    # Materialise the producer BEFORE the pallas call: without this
    # barrier XLA entangles an upstream elementwise producer (e.g. the
    # bitshuffle untranspose) with the kernel's input copy and the
    # composed program runs ~3x slower than the sum of its parts
    # (8.5 -> 2.9 ms/frame measured at Eiger batch scale).
    el_wide = jax.lax.optimization_barrier(el_wide)
    strip = _strip_rows(w)
    wp = padded_width(w)
    ntiles = wp // 128
    n_strips = (h + strip - 1) // strip
    # worst-case flat span one strip reads, plus sublane slack; rounded
    # to a whole number of 8-row DMA groups
    nrows = (w * strip) // 128 + ntiles + 1 + 8
    nrows = ((nrows + 7) // 8) * 8
    need = ((w * strip) // 128) * (n_strips - 1) + nrows
    x_rows = (n + 127) // 128
    if x_rows < need:
        el_wide = jnp.concatenate(
            [
                el_wide.reshape(bsz, -1),
                jnp.zeros((bsz, (need - x_rows) * 128 + (-n) % 128),
                          dtype=el_wide.dtype),
            ],
            axis=1,
        )
    x_rows = el_wide.shape[1] // 128
    el_v = el_wide.reshape(bsz, x_rows, 128)

    kern = functools.partial(
        _assemble_kernel, w=w, strip=strip, nrows=nrows
    )
    out = pl.pallas_call(
        kern,
        grid=(bsz, n_strips),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, strip, wp), lambda b, g: (b, g, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, n_strips * strip, wp), jnp.uint16),
        scratch_shapes=[
            pltpu.VMEM((nrows, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(el_v)
    return out[:, :h, :]
