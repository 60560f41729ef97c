"""High-level spotfinding: per-frame device step + rotation/still epilogues.

This is the TPU-native equivalent of the reference's per-image pipeline
(reference: spotfinder/spotfinder.cc:751-1008) and its rotation epilogue
(spotfinder.cc:1099-1258).  The per-frame step — thresholding, 2D connected
components, compaction, per-spot statistics and filters — is one jitted XLA
program; the host receives only compact per-spot/per-pixel arrays.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .constants import (
    DEFAULT_MAX_PEAK_CENTROID_SEPARATION,
    DEFAULT_MIN_COUNT,
    DEFAULT_MIN_SPOT_SIZE,
    DEFAULT_NSIG_B,
    DEFAULT_NSIG_S,
)
from .ops import cc3d
from .ops import connected_components as cc
from .ops import dispersion as dops
from .ops.masking import resolution_mask


@dataclass
class SpotfindConfig:
    algorithm: str = "dispersion"  # or "dispersion_extended"
    min_count: int = DEFAULT_MIN_COUNT
    nsig_b: float = DEFAULT_NSIG_B
    nsig_s: float = DEFAULT_NSIG_S
    min_spot_size: int = DEFAULT_MIN_SPOT_SIZE
    min_spot_size_3d: int = DEFAULT_MIN_SPOT_SIZE
    max_peak_centroid_separation: float = DEFAULT_MAX_PEAK_CENTROID_SEPARATION
    dmin: float = -1.0
    dmax: float = -1.0
    max_strong_pixels: int = 65536
    max_spots: int = 16384
    precision: str = "f64"  # "f64" (bit-parity with DIALS CPU) or "f32"
    use_pallas: bool | None = None  # None = auto (TPU + f32 + dispersion)

    @property
    def dtype(self):
        return jnp.float64 if self.precision == "f64" else jnp.float32

    def pallas_enabled(self) -> bool:
        if self.use_pallas is not None:
            return self.use_pallas
        return jax.default_backend() == "tpu" and self.precision == "f32"


@dataclass
class FrameResult:
    """Host-side result of one frame (everything the service needs)."""

    image_number: int
    n_strong_pixels: int
    n_spots: int  # after 2D min-spot-size filter (the reference's "boxes")
    n_spots_prefilter: int
    n_strong_pixels_filtered: int
    pixels: cc3d.FramePixels  # compact strong pixels for 3D merging
    # 2D centroids (min-size + separation filtered), for stills/indexing
    centers_of_mass: np.ndarray = field(default_factory=lambda: np.zeros((0, 3)))


class SpotfindProcessor:
    """Owns the jitted per-frame step for a fixed detector configuration."""

    def __init__(
        self,
        width: int,
        height: int,
        mask: np.ndarray,
        trusted_max: float,
        config: SpotfindConfig | None = None,
        wavelength: float | None = None,
        detector: Optional[dict] = None,
    ):
        self.width = width
        self.height = height
        self.config = config or SpotfindConfig()
        self.trusted_max = float(trusted_max)

        mask_dev = jnp.asarray(mask, dtype=jnp.uint8)
        cfg = self.config
        if (cfg.dmin > 0 or cfg.dmax > 0) and detector is not None:
            # detector dict: distance (m), beam_center_{x,y} (px),
            # pixel_size_{x,y} (m) — reference masking.cuh:14-70 semantics
            mask_dev = resolution_mask(
                mask_dev,
                wavelength=wavelength,
                distance=detector["distance"],
                beam_center_x=detector["beam_center_x"],
                beam_center_y=detector["beam_center_y"],
                pixel_size_x=detector["pixel_size_x"],
                pixel_size_y=detector["pixel_size_y"],
                dmin=cfg.dmin,
                dmax=cfg.dmax,
            )
        self.mask = jax.device_put(mask_dev)

        dtype = cfg.dtype

        use_pallas = cfg.pallas_enabled()

        def _step(image):
            if use_pallas:
                from .ops.compact import compact_from_rowcum
                from .ops.dispersion_extended_pallas import dispersion_extended_fused
                from .ops.dispersion_pallas import dispersion_fused

                fused = (
                    dispersion_fused
                    if cfg.algorithm == "dispersion"
                    else dispersion_extended_fused
                )
                _, rowcum = fused(
                    image,
                    self.mask,
                    self.trusted_max,
                    min_count=cfg.min_count,
                    nsig_b=cfg.nsig_b,
                    nsig_s=cfg.nsig_s,
                )
                pixels = compact_from_rowcum(
                    image, rowcum, max_pixels=cfg.max_strong_pixels
                )
            else:
                if cfg.algorithm == "dispersion":
                    strong = dops.dispersion(
                        image,
                        self.mask,
                        self.trusted_max,
                        min_count=cfg.min_count,
                        nsig_b=cfg.nsig_b,
                        nsig_s=cfg.nsig_s,
                        dtype=dtype,
                    )
                else:
                    strong = dops.dispersion_extended(
                        image,
                        self.mask,
                        self.trusted_max,
                        min_count=cfg.min_count,
                        nsig_b=cfg.nsig_b,
                        nsig_s=cfg.nsig_s,
                        dtype=dtype,
                    )
                pixels = cc.compact_strong_pixels(
                    strong, image, max_pixels=cfg.max_strong_pixels
                )
            root_slot = cc.label_compact_pixels(pixels, width=width)
            root_lin = pixels.linear_index[root_slot]
            table = cc.spot_table_from_pixels(
                pixels,
                root_slot,
                width=width,
                max_spots=cfg.max_spots,
                dtype=dtype,
            )
            size_keep, _, _ = cc.filter_spots(table, cfg.min_spot_size, -1.0)
            both_keep, _, _ = cc.filter_spots(
                table, cfg.min_spot_size, cfg.max_peak_centroid_separation
            )
            n_boxes = jnp.sum(size_keep.astype(jnp.int32))
            n_px_filtered = jnp.sum(
                jnp.where(size_keep, table.n_pixels, 0).astype(jnp.int32)
            )
            return pixels, root_lin, table, both_keep, n_boxes, n_px_filtered

        self._step = jax.jit(_step)

    def warmup(self, dtype=np.uint16) -> None:
        self._step(jnp.zeros((self.height, self.width), dtype=dtype))

    def dispatch(self, image: np.ndarray):
        """Asynchronously dispatch one frame; returns device futures."""
        return self._step(jnp.asarray(image))

    def collect(
        self, image_number: int, device_result, want_com: bool = False
    ) -> FrameResult:
        """Block on a dispatched frame and assemble the host result."""
        pixels, root_lin, table, both_keep, n_boxes, n_px_filtered = jax.device_get(
            device_result
        )
        n = int(pixels.count)
        if n > len(pixels.linear_index):
            # capacity overflow: the exact total is known (the kernel's
            # prefix counts are unbounded) but the compact arrays truncated.
            # Surface it loudly; callers can re-run at higher capacity.
            import warnings

            warnings.warn(
                f"frame {image_number}: {n} strong pixels exceed the "
                f"configured capacity {len(pixels.linear_index)}; spot "
                "results truncated — raise SpotfindConfig.max_strong_pixels",
                RuntimeWarning,
                stacklevel=2,
            )
            n = len(pixels.linear_index)
        frame_pixels = cc3d.FramePixels(
            linear_index=np.asarray(pixels.linear_index[:n]),
            intensity=np.asarray(pixels.intensity[:n]),
            root=np.asarray(root_lin[:n]),
        )
        coms = np.zeros((0, 3))
        if want_com:
            keep = np.asarray(both_keep) & np.asarray(table.valid)
            coms = np.stack(
                [
                    np.asarray(table.com_x)[keep],
                    np.asarray(table.com_y)[keep],
                    np.asarray(table.com_z)[keep],
                ],
                axis=1,
            )
        return FrameResult(
            image_number=image_number,
            n_strong_pixels=n,
            n_spots=int(n_boxes),
            n_spots_prefilter=int(table.n_spots),
            n_strong_pixels_filtered=int(n_px_filtered),
            pixels=frame_pixels,
            centers_of_mass=coms,
        )

    def process_frame(
        self, image_number: int, image: np.ndarray, want_com: bool = False
    ) -> FrameResult:
        return self.collect(image_number, self.dispatch(image), want_com)
