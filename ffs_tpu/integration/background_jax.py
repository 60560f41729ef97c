"""Device-side constant background estimation (jnp port of background.py).

Equivalent of the reference's GPU background reduction (reference:
integrator/background.cu:29-99 dispatching the single-source models in
include/integrator/background.hpp:78-465): whole reflection batches are
estimated as ONE (N, num_bins) XLA program — the Tukey/IQR model as pure
vectorised reductions, the robust-Poisson GLM as a fixed-upper-bound
``lax.while_loop`` over the IRLS update with a per-reflection convergence
mask (no data-dependent Python control flow, so the program jits once and
runs on the accelerator).

Numerics match :mod:`ffs_tpu.integration.background` (the NumPy oracle) at
1e-12 in float64, which itself matches DIALS RobustPoissonMean at ~1e-11
(tests/test_background_dials_golden.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from .background import (
    GLM_MAX_ITER,
    GLM_MIN_PIXELS,
    GLM_TOLERANCE,
    GLM_TUNING_CONSTANT,
    MAX_OVERFLOW_FRACTION,
)


@functools.partial(jax.jit, static_argnames=("dtype",))
def tukey_constant_background_jax(
    bins: jnp.ndarray, overflow: jnp.ndarray, dtype=jnp.float64
):
    """Vectorised Tukey model (reference: background.hpp:135-217).

    ``bins`` (N, num_bins) integer histograms, ``overflow`` (N,) high-tail
    counts -> (mean, weighted_sum, valid), all (N,).
    """
    bins = bins.astype(jnp.int32)
    overflow = overflow.astype(jnp.int32)
    n, num_bins = bins.shape
    total = bins.sum(axis=1) + overflow
    valid = total > 0
    valid &= overflow.astype(dtype) <= MAX_OVERFLOW_FRACTION * total.astype(dtype)

    p25 = (total + 3) // 4
    p75 = (3 * total + 1) // 4
    cum = jnp.cumsum(bins, axis=1)

    def quantile(p):
        hit = cum >= p[:, None]
        return jnp.where(hit.any(axis=1), jnp.argmax(hit, axis=1), num_bins)

    q1 = quantile(p25)
    q3 = quantile(p75)
    iqr = (q3 - q1).astype(dtype)
    lower = q1.astype(dtype) - 1.5 * iqr
    upper = q3.astype(dtype) + 1.5 * iqr
    valid &= upper < num_bins

    v = jnp.arange(num_bins, dtype=dtype)
    inlier = (v[None, :] >= lower[:, None]) & (v[None, :] <= upper[:, None])
    included = jnp.where(inlier, bins, 0)
    count = included.sum(axis=1)
    wsum = (included.astype(dtype) * v[None, :]).sum(axis=1)
    valid &= count > 0
    safe = jnp.where(count > 0, count, 1).astype(dtype)
    mean = jnp.where(valid, wsum / safe, 0.0)
    return mean, jnp.where(valid, wsum, 0.0), valid


@functools.partial(jax.jit, static_argnames=("dtype",))
def glm_constant_background_jax(
    bins: jnp.ndarray, overflow: jnp.ndarray, dtype=jnp.float64
):
    """Vectorised robust-Poisson GLM (reference: background.hpp:226-465).

    IRLS on beta = log(mu) with Huber psi (c = 1.345) and exact Poisson
    pdf/cdf expectations, iterated in a ``lax.while_loop`` until every live
    reflection converges or GLM_MAX_ITER is reached.
    """
    bins = bins.astype(jnp.int32)
    overflow = overflow.astype(jnp.int32)
    n, num_bins = bins.shape
    total = bins.sum(axis=1) + overflow
    alive0 = total >= GLM_MIN_PIXELS
    alive0 &= overflow.astype(dtype) <= MAX_OVERFLOW_FRACTION * total.astype(dtype)

    cum = jnp.cumsum(bins, axis=1)
    target = (total // 2 + 1)[:, None]
    hit = cum >= target
    median = jnp.where(hit.any(axis=1), jnp.argmax(hit, axis=1), -1).astype(dtype)
    mean0 = jnp.where(median <= 0, 1.0, median)

    c = GLM_TUNING_CONSTANT
    vgrid = jnp.arange(num_bins, dtype=dtype)
    import math

    kmax = num_bins + int(math.ceil(c * math.sqrt(num_bins))) + 8
    kgrid = jnp.arange(kmax, dtype=dtype)
    lgamma_k1 = gammaln(kgrid + 1.0)
    totf = total.astype(dtype)

    def body(state):
        it, beta, converged, alive = state
        active = alive & ~converged
        mu = jnp.exp(beta)
        dmu = mu
        svar = jnp.sqrt(mu)
        degenerate = ~((mu > 0) & (svar > 0) & jnp.isfinite(mu))
        alive = alive & ~degenerate

        logmu = jnp.log(jnp.maximum(mu, 1e-300))
        logp = (
            kgrid[None, :] * logmu[:, None]
            - mu[:, None]
            - lgamma_k1[None, :]
        )
        terms = jnp.exp(logp)  # (N, kmax)
        cdf_grid = jnp.cumsum(terms, axis=1)

        def pdf_at(j):
            jj = jnp.clip(j, -1, kmax - 1).astype(jnp.int32)
            out = jnp.take_along_axis(
                terms, jnp.maximum(jj, 0)[:, None], axis=1
            )[:, 0]
            return jnp.where(j < 0, 0.0, out)

        def cdf_at(j):
            jj = jnp.clip(j, -1, kmax - 1).astype(jnp.int32)
            out = jnp.take_along_axis(
                cdf_grid, jnp.maximum(jj, 0)[:, None], axis=1
            )[:, 0]
            return jnp.where(j < 0, 0.0, out)

        j1 = jnp.floor(mu - c * svar)
        j2 = jnp.floor(mu + c * svar)
        p1 = pdf_at(j1)
        p2 = pdf_at(j2)
        p3 = cdf_at(j1)
        p4 = pdf_at(j2 + 1)
        p5 = cdf_at(j2 + 1)
        p6 = 1.0 - p5 + p4
        p7 = pdf_at(j1 - 1)
        p8 = pdf_at(j2 - 1)
        p9 = cdf_at(j2 - 1)
        p10 = p9 - p3 + p1
        epsi1 = c * (p6 - p3) + (mu / svar) * (p1 - p2)
        epsi2 = c * (p1 + p2) + (mu**2 / svar**3) * (
            p10 / mu + p7 - p1 - p8 + p2
        )
        b = epsi2 * dmu * dmu / svar

        res = (vgrid[None, :] - mu[:, None]) / svar[:, None]
        psi = jnp.clip(res, -c, c)
        q = (psi - epsi1[:, None]) * (dmu / svar)[:, None]
        u = (bins.astype(dtype) * q).sum(axis=1)
        u = u + overflow.astype(dtype) * (c - epsi1) * dmu / svar

        denom = totf * b
        delta = jnp.where(
            active & jnp.isfinite(u / jnp.where(denom == 0, 1.0, denom)) & (denom != 0),
            u / jnp.where(denom == 0, 1.0, denom),
            0.0,
        )
        new_beta = beta + delta
        err = jnp.sqrt(delta**2 / jnp.maximum(beta**2, 1e-10))
        newly = active & (err < GLM_TOLERANCE)
        beta = jnp.where(active, new_beta, beta)
        converged = converged | newly
        return it + 1, beta, converged, alive

    def cond(state):
        it, _, converged, alive = state
        return (it < GLM_MAX_ITER) & jnp.any(alive & ~converged)

    state0 = (
        jnp.int32(0),
        jnp.log(mean0),
        jnp.zeros(n, dtype=bool),
        alive0,
    )
    _, beta, converged, alive = jax.lax.while_loop(cond, body, state0)

    valid = alive & converged & (beta > -300) & (beta < 300)
    mean = jnp.where(valid, jnp.exp(beta), 0.0)
    return mean, mean * totf, valid


def estimate_background_device(
    bins, overflow, model: str = "tukey", dtype=jnp.float64
):
    """Device dispatcher mirroring :func:`background.estimate_background`."""
    if model in ("tukey", "constant", "dials"):
        return tukey_constant_background_jax(
            jnp.asarray(bins), jnp.asarray(overflow), dtype=dtype
        )
    if model == "glm":
        return glm_constant_background_jax(
            jnp.asarray(bins), jnp.asarray(overflow), dtype=dtype
        )
    raise ValueError(f"unknown background model: {model}")
