"""Resolution masking (reference: spotfinder/kernels/masking.cu:27-186).

Computed once per collection on the host/device and reused for every frame,
exactly like the reference applies its kernel once to the uploaded mask.
Perpendicular-detector assumption: d = lambda / (2 sin(0.5 atan(r/D))).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("dmin", "dmax", "dtype"))
def resolution_mask(
    mask: jnp.ndarray,
    wavelength: float,
    distance: float,
    beam_center_x: float,
    beam_center_y: float,
    pixel_size_x: float,
    pixel_size_y: float,
    dmin: float = -1.0,
    dmax: float = -1.0,
    *,
    dtype=jnp.float64,
) -> jnp.ndarray:
    """Apply a [dmin, dmax] resolution filter to a validity mask in place.

    Units mirror the reference kernel: ``distance`` and pixel sizes in
    metres, wavelength in Angstroms, beam centre in pixels.  Already-masked
    pixels stay masked.  Returns a uint8 mask (1 valid, 0 masked).
    """
    h, w = mask.shape[-2], mask.shape[-1]
    ys = (jnp.arange(h, dtype=dtype) + 0.5 - beam_center_y) * pixel_size_y
    xs = (jnp.arange(w, dtype=dtype) + 0.5 - beam_center_x) * pixel_size_x
    r = jnp.sqrt(ys[:, None] ** 2 + xs[None, :] ** 2)
    theta = 0.5 * jnp.arctan(r / distance)
    d = wavelength / (2.0 * jnp.sin(theta))

    # dmin/dmax are static (per-collection constants, jitted once), so
    # disabled filters fold away at trace time
    keep = jnp.ones((h, w), dtype=bool)
    if dmin > 0:
        keep &= d >= dmin
    if dmax > 0:
        keep &= d <= dmax
    return ((mask != 0) & keep).astype(jnp.uint8)
