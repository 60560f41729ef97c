"""Kabsch bounding boxes and per-reflection coordinate systems.

Equivalent of the reference's extent computation (reference:
src/integrator/extent.cc:14-198) and CoordinateSystem
(src/integrator/coordinate_system.cc:10-34), fully vectorised.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

DEFAULT_N_SIGMA = 3.0
DEFAULT_SIGMA_B_MULTIPLIER = 2.0
ZETA_TOLERANCE = 1e-10


@dataclass
class CoordinateSystems:
    """Per-reflection Kabsch frames (vectorised)."""

    e1: np.ndarray  # (N, 3)
    e2: np.ndarray  # (N, 3)
    zeta: np.ndarray  # (N,)
    s1_len: np.ndarray  # (N,)


def coordinate_systems(s0: np.ndarray, m2: np.ndarray, s1: np.ndarray) -> CoordinateSystems:
    e1 = np.cross(s1, s0)
    e1 /= np.linalg.norm(e1, axis=1, keepdims=True)
    e2 = np.cross(s1, e1)
    e2 /= np.linalg.norm(e2, axis=1, keepdims=True)
    return CoordinateSystems(
        e1=e1, e2=e2, zeta=e1 @ m2, s1_len=np.linalg.norm(s1, axis=1)
    )


def compute_kabsch_bounding_boxes(
    s0: np.ndarray,
    rot_axis: np.ndarray,
    s1: np.ndarray,
    phi: np.ndarray,  # (N,) radians (xyzcal.mm z column)
    sigma_b: float,
    sigma_m: float,
    panel,
    scan,
    n_sigma: float = DEFAULT_N_SIGMA,
    sigma_b_multiplier: float = DEFAULT_SIGMA_B_MULTIPLIER,
) -> np.ndarray:
    """Per-reflection (x_min, x_max, y_min, y_max, z_min, z_max) int array.

    delta_b = n_sigma*sigma_b*multiplier spans e1/e2; the four corner
    displacements are re-projected onto the Ewald sphere and ray-intersected
    with the panel; delta_m/zeta spans phi (extent.cc:47-192).
    """
    n = len(s1)
    cs = coordinate_systems(s0, rot_axis, s1)
    delta_b = n_sigma * sigma_b * sigma_b_multiplier
    delta_m = n_sigma * sigma_m

    osc_start, osc_width = scan.oscillation
    z0, z1 = scan.image_range

    s1_len = cs.s1_len[:, None]
    corners_xy = []
    for e1_sign, e2_sign in ((1, 1), (1, -1), (-1, 1), (-1, -1)):
        p = (
            e1_sign * delta_b * cs.e1 * s1_len
            + e2_sign * delta_b * cs.e2 * s1_len
        )
        b = cs.s1_len**2 - np.sum(p * p, axis=1)
        b = np.maximum(b, 0.0)  # degenerate: displacement beyond the sphere
        d = -(np.sum(p * s1, axis=1) / cs.s1_len) + np.sqrt(b)
        s_prime = d[:, None] * s1 / s1_len + p
        xmm, ymm = panel.get_ray_intersection(s_prime)
        x_px, y_px = panel.mm_to_px(xmm, ymm)
        corners_xy.append((x_px, y_px))

    xs = np.stack([c[0] for c in corners_xy])
    ys = np.stack([c[1] for c in corners_xy])
    x_min = np.floor(xs.min(axis=0)).astype(np.int64)
    x_max = np.ceil(xs.max(axis=0)).astype(np.int64)
    y_min = np.floor(ys.min(axis=0)).astype(np.int64)
    y_max = np.ceil(ys.max(axis=0)).astype(np.int64)

    # z extent from phi_c +- delta_m / zeta (extent.cc:157-192)
    with np.errstate(divide="ignore", invalid="ignore"):
        dphi = delta_m / cs.zeta
    phi_plus = np.degrees(phi + dphi)
    phi_minus = np.degrees(phi - dphi)
    zp = z0 - 1 + (phi_plus - osc_start) / osc_width
    zm = z0 - 1 + (phi_minus - osc_start) / osc_width
    z_min = np.clip(np.floor(np.minimum(zp, zm)), z0 - 1, z1 - 1).astype(np.int64)
    z_max = np.clip(np.ceil(np.maximum(zp, zm)), z0, z1).astype(np.int64)
    degenerate = np.abs(cs.zeta) <= ZETA_TOLERANCE
    z_min = np.where(degenerate, z0, z_min)
    z_max = np.where(degenerate, z1, z_max)

    return np.stack([x_min, x_max, y_min, y_max, z_min, z_max], axis=1)


_bbox_jit = None


def _get_bbox_jit():
    """Module-cached jitted Kabsch-bbox core (f64): the host pass is ~30
    vectorised numpy ops over the whole collection (measured 1.7 s for
    1.67M reflections on one CPU); the identical math fuses into one XLA
    program on device.  The parallax branch is traced per flag value."""
    global _bbox_jit
    if _bbox_jit is None:
        import jax
        import jax.numpy as jnp
        from functools import partial

        @partial(jax.jit, static_argnames=("parallax",))
        def core(
            s1, phi, s0, m2, fast, slow, origin, dinv_t, scalars, parallax
        ):
            (
                delta_b, delta_m, px0, px1, osc_start, osc_width, z0f, z1f,
                mu, thickness,
            ) = (scalars[i] for i in range(10))
            e1 = jnp.cross(s1, s0)
            e1 = e1 / jnp.linalg.norm(e1, axis=1, keepdims=True)
            e2 = jnp.cross(s1, e1)
            e2 = e2 / jnp.linalg.norm(e2, axis=1, keepdims=True)
            zeta = e1 @ m2
            s1_len = jnp.linalg.norm(s1, axis=1)

            def mm_to_px(xmm, ymm):
                if not parallax:
                    return xmm / px0, ymm / px1
                lab = (
                    origin
                    + xmm[:, None] * fast
                    + ymm[:, None] * slow
                )
                sh = lab / jnp.linalg.norm(lab, axis=-1, keepdims=True)
                nrm = jnp.cross(fast, slow)
                nrm = jnp.where(jnp.dot(origin, nrm) < 0, -nrm, nrm)
                cos_t = sh @ nrm
                o = (1.0 / mu) - (
                    thickness / cos_t + 1.0 / mu
                ) * jnp.exp(-mu * thickness / cos_t)
                return (
                    (xmm + (sh @ fast) * o) / px0,
                    (ymm + (sh @ slow) * o) / px1,
                )

            sl = s1_len[:, None]
            xs, ys = [], []
            for e1_sign, e2_sign in ((1, 1), (1, -1), (-1, 1), (-1, -1)):
                p = (
                    e1_sign * delta_b * e1 * sl
                    + e2_sign * delta_b * e2 * sl
                )
                b = jnp.maximum(s1_len**2 - jnp.sum(p * p, axis=1), 0.0)
                d = -(jnp.sum(p * s1, axis=1) / s1_len) + jnp.sqrt(b)
                s_prime = d[:, None] * s1 / sl + p
                v = s_prime @ dinv_t
                xmm = v[:, 0] / v[:, 2]
                ymm = v[:, 1] / v[:, 2]
                x_px, y_px = mm_to_px(xmm, ymm)
                xs.append(x_px)
                ys.append(y_px)
            xs = jnp.stack(xs)
            ys = jnp.stack(ys)
            x_min = jnp.floor(xs.min(axis=0))
            x_max = jnp.ceil(xs.max(axis=0))
            y_min = jnp.floor(ys.min(axis=0))
            y_max = jnp.ceil(ys.max(axis=0))

            dphi = delta_m / zeta
            phi_plus = jnp.degrees(phi + dphi)
            phi_minus = jnp.degrees(phi - dphi)
            zp = z0f - 1 + (phi_plus - osc_start) / osc_width
            zm = z0f - 1 + (phi_minus - osc_start) / osc_width
            z_min = jnp.clip(
                jnp.floor(jnp.minimum(zp, zm)), z0f - 1, z1f - 1
            )
            z_max = jnp.clip(jnp.ceil(jnp.maximum(zp, zm)), z0f, z1f)
            degenerate = jnp.abs(zeta) <= ZETA_TOLERANCE
            z_min = jnp.where(degenerate, z0f, z_min)
            z_max = jnp.where(degenerate, z1f, z_max)
            return jnp.stack(
                [x_min, x_max, y_min, y_max, z_min, z_max], axis=1
            )

        _bbox_jit = core
    return _bbox_jit


def compute_kabsch_bounding_boxes_device(
    s0: np.ndarray,
    rot_axis: np.ndarray,
    s1: np.ndarray,
    phi: np.ndarray,
    sigma_b: float,
    sigma_m: float,
    panel,
    scan,
    n_sigma: float = DEFAULT_N_SIGMA,
    sigma_b_multiplier: float = DEFAULT_SIGMA_B_MULTIPLIER,
) -> np.ndarray:
    """compute_kabsch_bounding_boxes evaluated as ONE fused f64 device
    program; parity pinned by
    tests/test_integration.py::test_bbox_device_matches_host.

    NaN semantics note: the host path lets a ray that misses the panel
    plane produce NaN px and propagates it through floor/min (numpy
    min propagates NaN); jnp.minimum/maximum also propagate NaN, so the
    degenerate rows come out NaN -> i64 min on both paths."""
    import jax
    import jax.numpy as jnp

    core = _get_bbox_jit()
    d_mat = np.stack([panel.fast_axis, panel.slow_axis, panel.origin], axis=1)
    dinv_t = np.linalg.inv(d_mat).T
    osc_start, osc_width = scan.oscillation
    z0, z1 = scan.image_range
    scalars = np.array(
        [
            n_sigma * sigma_b * sigma_b_multiplier,
            n_sigma * sigma_m,
            panel.pixel_size[0], panel.pixel_size[1],
            osc_start, osc_width, float(z0), float(z1),
            getattr(panel, "mu", 0.0) or 0.0,
            getattr(panel, "thickness", 0.0) or 0.0,
        ],
        dtype=np.float64,
    )
    # rot_axis passed through raw, exactly like the host path's
    # coordinate_systems (callers hand a unit axis)
    m2 = np.asarray(rot_axis, dtype=np.float64)
    out = core(
        jnp.asarray(s1, jnp.float64),
        jnp.asarray(phi, jnp.float64),
        jnp.asarray(np.asarray(s0), jnp.float64),
        jnp.asarray(m2),
        jnp.asarray(panel.fast_axis, jnp.float64),
        jnp.asarray(panel.slow_axis, jnp.float64),
        jnp.asarray(panel.origin, jnp.float64),
        jnp.asarray(dinv_t),
        jnp.asarray(scalars),
        bool(getattr(panel, "parallax", False)),
    )
    return np.asarray(jax.device_get(out)).astype(np.int64)
