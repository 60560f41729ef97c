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


def box_sum(arr: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Sum over a (2r+1)^2 window with zero padding, separable shifted adds.

    Exact for integer-valued inputs stored in a wide-enough dtype.
    """
    h, w = arr.shape[-2], arr.shape[-1]
    pad = [(0, 0)] * (arr.ndim - 2) + [(radius, radius), (0, 0)]
    p = jnp.pad(arr, pad)
    rows = p[..., 0:h, :]
    for dy in range(1, 2 * radius + 1):
        rows = rows + p[..., dy : dy + h, :]
    pad = [(0, 0)] * (arr.ndim - 2) + [(0, 0), (radius, radius)]
    p = jnp.pad(rows, pad)
    out = p[..., :, 0:w]
    for dx in range(1, 2 * radius + 1):
        out = out + p[..., :, dx : dx + w]
    return out


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
