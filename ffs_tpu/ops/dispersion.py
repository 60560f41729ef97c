"""Batched JAX dispersion-threshold ops.

TPU-first formulation of the DIALS dispersion/dispersion-extended spotfinding
thresholds (reference: spotfinder/kernels/thresholding.cu:60-491,
spotfinder/spotfinder.cu:148-347).  Instead of the reference's shared-memory
halo tiles, local window statistics are computed as separable shifted adds
over whole (batched) frames — pure VPU work that XLA fuses; the Pallas kernel
in :mod:`ffs_tpu.ops.dispersion_pallas` implements the same math tile-wise.

All predicates use the boxed-inequality form (see ops/reference.py for the
derivation): exact integer arithmetic up to the final sqrt comparisons.  The
compute dtype is configurable: float64 gives bit-parity with the DIALS CPU
implementation (the reference's default precision, CMakeLists.txt:43-48);
float32 is the fast path.

All functions operate on arrays shaped (..., H, W): any leading batch
dimensions are carried through, so sharded multi-frame batches work
unchanged under `jit`/`shard_map`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..constants import (
    DEFAULT_MIN_COUNT,
    DEFAULT_NSIG_B,
    DEFAULT_NSIG_S,
    EROSION_CHEBYSHEV_DISTANCE,
    KERNEL_RADIUS,
    KERNEL_RADIUS_EXTENDED,
)


def _pow2_parts(k: int) -> list[int]:
    """Descending power-of-two decomposition of ``k`` (7 -> [4, 2, 1])."""
    parts, p = [], 1
    while 2 * p <= k:
        p *= 2
    while k:
        if p <= k:
            parts.append(p)
            k -= p
        p //= 2
    return parts


def _tree_window_axis(p: jnp.ndarray, k: int, n: int, axis: int) -> jnp.ndarray:
    """Canonical shared-subsum tree for k-wide sliding sums along ``axis``.

    Builds pairwise levels s2[i] = s1[i] + s1[i+1], s4[i] = s2[i] + s2[i+2],
    s8[i] = s4[i] + s4[i+4], ... then combines the power-of-two parts of k
    left-associatively at increasing offsets, e.g. for k == 7:

        W[i] = (s4[i] + s2[i+4]) + s1[i+6]

    This exact association order is the REQUIRED float addition order for
    every window sum in the repo: the Pallas kernels
    (ops/dispersion_pallas.py, ops/dispersion_extended_pallas.py) hand-code
    the same tree, so kernel <-> oracle float32 parity is bit-exact.  For
    integer-valued grids any order gives the same bits; for the
    rounding-sensitive sum-of-squares grid the tree is both cheaper
    (~log passes per level instead of k-1 sequential adds) and closer to
    the exact value than the reference's sequential accumulation
    (reference: spotfinder/kernels/thresholding.cu:79-101 accumulates
    sequentially; DIALS computes in double where order is immaterial —
    baseline/spotfinder/local.h:407-447).
    """

    def sl(a: jnp.ndarray, start: int, ln: int) -> jnp.ndarray:
        idx = [slice(None)] * a.ndim
        idx[axis] = slice(start, start + ln)
        return a[tuple(idx)]

    parts = _pow2_parts(k)
    levels = {1: p}
    sz = 1
    while sz < parts[0]:
        prev = levels[sz]
        ln = prev.shape[axis] - sz
        levels[2 * sz] = sl(prev, 0, ln) + sl(prev, sz, ln)
        sz *= 2
    acc = None
    off = 0
    for part in parts:
        t = sl(levels[part], off, n)
        acc = t if acc is None else acc + t
        off += part
    return acc


def box_sum(arr: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Sum over a (2r+1)^2 window with zero padding, separable shifted adds
    in the canonical shared-subsum tree order (:func:`_tree_window_axis`).

    Exact for integer-valued inputs stored in a wide-enough dtype.
    """
    k = 2 * radius + 1
    h, w = arr.shape[-2], arr.shape[-1]
    pad = [(0, 0)] * (arr.ndim - 2) + [(radius, radius), (0, 0)]
    rows = _tree_window_axis(jnp.pad(arr, pad), k, h, arr.ndim - 2)
    pad = [(0, 0)] * (arr.ndim - 2) + [(0, 0), (radius, radius)]
    return _tree_window_axis(jnp.pad(rows, pad), k, w, arr.ndim - 1)


def _local_stats(image, mask_valid, radius, dtype):
    """Masked (count, sum, sum_sq) over the local window, in ``dtype``."""
    img = image.astype(dtype)
    v = mask_valid.astype(dtype)
    m = box_sum(v, radius)
    x = box_sum(jnp.where(mask_valid, img, 0), radius)
    y = box_sum(jnp.where(mask_valid, img * img, 0), radius)
    return m, x, y


@functools.partial(
    jax.jit, static_argnames=("min_count", "nsig_b", "nsig_s", "radius", "dtype")
)
def dispersion(
    image: jnp.ndarray,
    mask: jnp.ndarray,
    trusted_max: float | jnp.ndarray,
    *,
    min_count: int = DEFAULT_MIN_COUNT,
    nsig_b: float = DEFAULT_NSIG_B,
    nsig_s: float = DEFAULT_NSIG_S,
    radius: int = KERNEL_RADIUS,
    dtype=jnp.float64,
) -> jnp.ndarray:
    """Dispersion threshold -> bool strong-pixel mask
    (reference: thresholding.cu:145-234)."""
    mask_valid = mask != 0
    m, x, y = _local_stats(image, mask_valid, radius, dtype)
    src = image.astype(dtype)

    a = m * y - x * x - x * (m - 1)
    b = m * src - x
    c = x * nsig_b * jnp.sqrt(2 * (m - 1))
    d = nsig_s * jnp.sqrt(x * m)

    px_valid = mask_valid & (src <= trusted_max)
    n_ok = (m >= min_count) & (m > 1)
    return px_valid & n_ok & (a > c) & (b > d)


@functools.partial(
    jax.jit, static_argnames=("min_count", "nsig_b", "radius", "dtype")
)
def dispersion_first_pass(
    image,
    mask,
    trusted_max,
    *,
    min_count: int = DEFAULT_MIN_COUNT,
    nsig_b: float = DEFAULT_NSIG_B,
    radius: int = KERNEL_RADIUS,
    dtype=jnp.float64,
):
    """Extended first pass: variance (background) test only
    (reference: thresholding.cu:253-342)."""
    mask_valid = mask != 0
    m, x, y = _local_stats(image, mask_valid, radius, dtype)
    src = image.astype(dtype)
    a = m * y - x * x - x * (m - 1)
    c = x * nsig_b * jnp.sqrt(2 * (m - 1))
    px_valid = mask_valid & (src <= trusted_max)
    n_ok = (m >= min_count) & (m > 1)
    return px_valid & n_ok & (a > c)


@functools.partial(jax.jit, static_argnames=("distance",))
def erode(
    dispersion_mask: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    distance: int = EROSION_CHEBYSHEV_DISTANCE,
) -> jnp.ndarray:
    """Erosion of the first-pass mask (reference: erosion.cu:53-143).

    Returns the survived-signal mask; a signal pixel survives iff no
    valid-mask background pixel lies within Chebyshev distance ``distance``.
    """
    bg = ((mask != 0) & ~dispersion_mask).astype(jnp.int32)
    return dispersion_mask & (box_sum(bg, distance) == 0)


@functools.partial(
    jax.jit, static_argnames=("nsig_s", "threshold", "radius", "dtype")
)
def dispersion_second_pass(
    image,
    mask,
    survived,
    trusted_max,
    *,
    nsig_s: float = DEFAULT_NSIG_S,
    threshold: float = 0.0,
    radius: int = KERNEL_RADIUS_EXTENDED,
    dtype=jnp.float64,
):
    """Extended final pass (reference: thresholding.cu:360-491)."""
    img = image.astype(dtype)
    bg = (mask != 0) & ~survived
    n = box_sum(bg.astype(dtype), radius)
    x = box_sum(jnp.where(bg, img, 0), radius)

    # mean = x/n for n > 1 else 0 (quirk preserved from thresholding.cu:482)
    mean = jnp.where(n > 1, x / jnp.maximum(n, 1), 0.0)
    local_ok = img >= mean + nsig_s * jnp.sqrt(mean)

    px_valid = (mask != 0) & (img <= trusted_max)
    return px_valid & (n > 0) & survived & (img > threshold) & local_ok


@functools.partial(
    jax.jit, static_argnames=("min_count", "nsig_b", "nsig_s", "dtype")
)
def dispersion_extended(
    image,
    mask,
    trusted_max,
    *,
    min_count: int = DEFAULT_MIN_COUNT,
    nsig_b: float = DEFAULT_NSIG_B,
    nsig_s: float = DEFAULT_NSIG_S,
    dtype=jnp.float64,
):
    """Full three-stage extended algorithm
    (reference: spotfinder/spotfinder.cu:213-347)."""
    first = dispersion_first_pass(
        image, mask, trusted_max, min_count=min_count, nsig_b=nsig_b, dtype=dtype
    )
    survived = erode(first, mask)
    return dispersion_second_pass(
        image, mask, survived, trusted_max, nsig_s=nsig_s, dtype=dtype
    )
