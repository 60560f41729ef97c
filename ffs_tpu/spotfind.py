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
    # Batched collection mode (dispatch_batch/collect_batch): per-frame
    # strong-pixel slot capacity of the SEGMENTED batch compaction.  None
    # = min(max_strong_pixels, 16384); frames past it transparently fall
    # back to the per-frame tiered path (up to max_strong_pixels).
    batch_max_px_per_frame: Optional[int] = None
    precision: str = "f64"  # "f64" (bit-parity with DIALS CPU) or "f32"
    use_pallas: bool | None = None  # None = auto (TPU + f32 + dispersion)
    # "host" labels the compact pixels on the CPU (the reference's own
    # GPU-threshold / CPU-boost-graph split; microseconds for ~3k pixels),
    # "device" runs the sparse union-find on the accelerator (needed for
    # multi-chip sharding), "auto" = host whenever the Pallas path is on.
    cc_backend: str = "auto"  # "auto" | "host" | "device"
    # "host" ends the device's job at the packed strong words: the host
    # expands set bits against its own decoded frame copy (ops/compact_host)
    # and feeds the host CC directly — no device compaction pass.  Wins on
    # locally-attached hardware (packed words are ~2-4 MB/frame, ~0.2 ms at
    # PCIe rates, and the ~0.4 ms/frame device compact stage disappears);
    # loses over the development tunnel's ~40 MB/s d2h, hence not "auto".
    # Requires the Pallas packed path and host CC.
    compact_backend: str = "device"  # "device" | "host"
    # Mosaic interpret mode: lets the Pallas packed path run on CPU in
    # tests; never set in production
    pallas_interpret: bool = False

    @property
    def dtype(self):
        return jnp.float64 if self.precision == "f64" else jnp.float32

    def pallas_enabled(self) -> bool:
        if self.use_pallas is not None:
            return self.use_pallas
        return jax.default_backend() == "tpu" and self.precision == "f32"

    def host_cc_enabled(self) -> bool:
        if self.cc_backend == "host":
            return True
        if self.cc_backend == "device":
            return False
        return self.pallas_enabled()

    def host_compact_enabled(self) -> bool:
        """Host compaction needs the packed words (Pallas path) and makes
        sense only feeding the host CC; falls back to device compaction
        otherwise (the processor validates contradictory explicit configs)."""
        return (
            self.compact_backend == "host"
            and self.pallas_enabled()
            and self.host_cc_enabled()
        )


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
        self.host_cc = cfg.host_cc_enabled()
        self.host_compact = cfg.host_compact_enabled()
        if cfg.compact_backend == "host" and not use_pallas:
            raise ValueError(
                "compact_backend='host' expands the Pallas packed strong "
                "words on the host; it requires the packed kernel path "
                "(f32 precision on TPU, or use_pallas=True)"
            )
        if cfg.compact_backend == "host" and use_pallas and not self.host_cc:
            raise ValueError(
                "compact_backend='host' produces host arrays; it cannot feed "
                "cc_backend='device' — use cc_backend 'host' or 'auto'"
            )

        # Mosaic does not compile under jax_enable_x64 (i64 scalars leak
        # into the kernel and fail lowering), so the Pallas f32 step is
        # traced and executed under a local x64-off scope even when the
        # process enables x64 globally for the DIALS f64 parity paths.
        self._x64_off = use_pallas

        # frame-invariant mask box count, computed ONCE per collection so
        # the fused kernel skips the mask grid's sliding sums every frame
        self.mbox = None
        if use_pallas and cfg.algorithm == "dispersion":
            from .ops.dispersion_pallas import mask_box_count

            with jax.enable_x64(False):
                self.mbox = jax.block_until_ready(mask_box_count(self.mask))
        elif use_pallas:
            from .ops.dispersion_extended_pallas import mask_box_count_extended

            with jax.enable_x64(False):
                self.mbox = jax.block_until_ready(
                    mask_box_count_extended(self.mask)
                )

        def _fused_pcw(image, trim: bool = True):
            """Packed-words kernel step -> combined [pc | w32] rows
            (the 72 MB/frame dense rowcum era is over — see
            ops/dispersion_pallas.dispersion_packed_raw).

            ``trim=False`` (batched path) keeps the strip-padded row count:
            downstream gathers from the whole padded array avoid XLA's slow
            sliced-view composite-gather lowering (see the packed-raw
            docstring; bench.py measures this form)."""
            from .ops.dispersion_extended_pallas import (
                dispersion_extended_packed_raw,
            )
            from .ops.dispersion_pallas import dispersion_packed_raw

            kwargs = dict(
                min_count=cfg.min_count,
                nsig_b=cfg.nsig_b,
                nsig_s=cfg.nsig_s,
            )
            if cfg.algorithm == "dispersion":
                return dispersion_packed_raw(
                    image,
                    self.mask,
                    self.trusted_max,
                    mbox=self.mbox,
                    interpret=cfg.pallas_interpret,
                    trim=trim,
                    **kwargs,
                )
            return dispersion_extended_packed_raw(
                image,
                self.mask,
                self.trusted_max,
                mbox=self.mbox,
                interpret=cfg.pallas_interpret,
                trim=trim,
                **kwargs,
            )

        # Adaptive compaction capacity (host-CC path): compaction cost
        # scales with the static capacity K, so the kernel step first
        # returns the exact strong-pixel total and the host picks the
        # smallest tier that fits — typical frames (~3k strong px) run at
        # K=4096 instead of paying for the 65536 worst-case every frame.
        self._capacity_tiers = sorted(
            {
                t
                for t in (4096, 16384, cfg.max_strong_pixels)
                if t <= cfg.max_strong_pixels
            }
        )

        @jax.jit
        def _rowcum_step(image):
            pcw = _fused_pcw(image)
            nwl = pcw.shape[-1] // 2
            return pcw, jnp.sum(pcw[:, nwl - 1])

        def _compact_step(image, pcw, max_pixels):
            from .ops.compact import compact_from_pcw

            return compact_from_pcw(image, pcw, max_pixels=max_pixels)

        self._rowcum_step = _rowcum_step
        self._compact_step = jax.jit(
            _compact_step, static_argnames=("max_pixels",)
        )

        def _step(image):
            neighbors = None
            if use_pallas:
                from .ops.compact import compact_from_pcw

                pcw = _fused_pcw(image)
                pixels, nbu, nbd = compact_from_pcw(
                    image,
                    pcw,
                    max_pixels=cfg.max_strong_pixels,
                    with_neighbors=True,
                )
                neighbors = (nbu, nbd)
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
            if self.host_cc:
                # host backend: the device's job ends at compaction; CC,
                # statistics and filters run on the CPU from the ~64 KB
                # compact arrays (reference architecture split)
                return (pixels,)
            root_slot = cc.label_compact_pixels(
                pixels, width=width, neighbors=neighbors
            )
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

        # --- batched collection mode (all-device segmented pipeline) ------
        # The throughput configuration bench.py measures, exposed as a
        # production path: one jitted step per (B, H, W) frame batch —
        # packed kernel, SEGMENTED per-frame compaction, sparse CC over
        # the whole batch, one multi-frame spot table.  Amortises the
        # per-dispatch overhead the per-frame path pays B times.  Only
        # meaningful on the Pallas packed path (batch hot path == bench).
        self._batch_kf = cfg.batch_max_px_per_frame or min(
            cfg.max_strong_pixels, 16384
        )

        def _batch_step(images, kf: int):
            from .ops.compact import compact_from_pcw_segmented

            pcw = _fused_pcw(images, trim=False)
            hp = pcw.shape[1]  # per-frame kernel rows (tall pitch hp+1)
            if self.host_cc:
                pixels, counts = compact_from_pcw_segmented(
                    images, pcw, max_pixels_per_frame=kf
                )
                return pixels, counts, jnp.int32(hp)
            pixels, nbu, nbd, counts = compact_from_pcw_segmented(
                images, pcw, max_pixels_per_frame=kf, with_neighbors=True
            )
            root_slot = cc.label_compact_pixels(
                pixels, width=width, neighbors=(nbu, nbd)
            )
            root_lin = pixels.linear_index[root_slot]
            # peak-key fold needs intensities < 2^16 (see
            # spot_table_from_pixels); 32-bit data takes the two-op path
            peak_slots = kf if images.dtype == jnp.uint16 else None
            table = cc.spot_table_from_pixels(
                pixels,
                root_slot,
                width=width,
                max_spots=cfg.max_spots,
                dtype=jnp.float32,
                frame_rows=hp,
                peak_key_slots=peak_slots,
            )
            size_keep, _, _ = cc.filter_spots(table, cfg.min_spot_size, -1.0)
            both_keep, _, _ = cc.filter_spots(
                table, cfg.min_spot_size, cfg.max_peak_centroid_separation
            )
            return pixels, counts, jnp.int32(hp), root_lin, table, size_keep, both_keep

        self._batch_step = (
            jax.jit(_batch_step, static_argnames=("kf",)) if use_pallas else None
        )

        # --- device-decode variant: bitshuffled planes in, same outputs --
        # The untranspose (ops/bitshuffle_device.py) runs INSIDE the batch
        # program, so the host uploads the LZ4-decoded plane bytes (same
        # byte count as the frame) and skips the scalar bit transpose —
        # the decompression-offload split the reference flags as a TODO
        # (spotfinder.cc:823-842).
        def _batch_step_planes(planes, kf: int, dtype_name: str):
            from .ops.bitshuffle_device import untranspose_planes

            dt = jnp.dtype(dtype_name)
            b, n_blocks, block_bytes = planes.shape
            elems = untranspose_planes(
                planes.reshape(b * n_blocks, block_bytes), dt.itemsize, dt
            )
            frames = (
                elems.reshape(b, -1)[:, : height * width]
                .reshape(b, height, width)
            )
            return _batch_step(frames, kf)

        self._batch_step_planes = (
            jax.jit(_batch_step_planes, static_argnames=("kf", "dtype_name"))
            if use_pallas
            else None
        )

    def batch_supported(self) -> bool:
        """Batched collection needs the Pallas packed path (the dense jnp
        path has no packed-word compaction to segment)."""
        return self._batch_step is not None

    def dispatch_batch(self, images: np.ndarray):
        """Asynchronously dispatch a (B, H, W) frame batch.

        The batched analogue of :meth:`dispatch`: the whole batch runs as
        ONE device program (the exact pipeline bench.py's throughput
        metrics measure), so the per-dispatch overhead amortises over B
        frames.  Pair with :meth:`collect_batch`.
        """
        if self._batch_step is None:
            raise ValueError(
                "batched collection requires the Pallas packed path "
                "(SpotfindConfig.use_pallas / precision='f32' on TPU)"
            )
        with jax.enable_x64(False):
            return self._batch_step(jnp.asarray(images), kf=self._batch_kf)

    def dispatch_batch_planes(self, planes: np.ndarray, dtype=np.uint16):
        """Asynchronously dispatch a batch as LZ4-decoded bitshuffle planes.

        ``planes``: (B, n_blocks, block_elem * elem_size) uint8 — each
        frame's stacked block plane matrix from
        :func:`ffs_tpu.io.compression.bshuf_lz4_planes` (padded final
        partial block, no raw tail: the frame's pixel count must be a
        multiple of 8, true of every supported detector).  The bit
        untranspose runs on device inside the same program as the packed
        kernel; results are bit-identical to :meth:`dispatch_batch` of
        the decoded frames.  Pair with :meth:`collect_batch`.
        """
        if self._batch_step_planes is None:
            raise ValueError(
                "batched collection requires the Pallas packed path "
                "(SpotfindConfig.use_pallas / precision='f32' on TPU)"
            )
        dt = np.dtype(dtype)
        n_px = self.height * self.width
        if n_px % 8:
            raise ValueError(
                f"device decode needs a multiple-of-8 pixel count, got {n_px}"
            )
        if planes.shape[1] * (planes.shape[2] // dt.itemsize) < n_px:
            raise ValueError(
                f"planes hold {planes.shape[1] * (planes.shape[2] // dt.itemsize)}"
                f" elements < frame size {n_px}"
            )
        with jax.enable_x64(False):
            return self._batch_step_planes(
                jnp.asarray(planes), kf=self._batch_kf, dtype_name=dt.name
            )

    def collect_batch(
        self,
        image_numbers,
        device_result,
        images=None,
        want_com: bool = False,
    ) -> list[FrameResult]:
        """Block on a dispatched batch and split it into per-frame results.

        ``images`` (the host frames, any sequence indexable by batch
        position) enables the transparent per-frame fallback when a frame
        overflows the batched per-frame capacity; without it such frames
        raise.  Results are bit-identical to the per-frame path: the
        segmented layout keeps each frame's pixels in its own slot
        segment, and spots never bridge frames (gap row), so per-frame
        slices of the batch table ARE the per-frame tables.
        """
        cfg = self.config
        kf = self._batch_kf
        host = jax.device_get(device_result)
        if self.host_cc:
            pixels, counts, hp = host
            table = size_keep = both_keep = root_lin = None
        else:
            pixels, counts, hp, root_lin, table, size_keep, both_keep = host
            if int(table.n_spots) > cfg.max_spots:
                raise RuntimeError(
                    f"batch produced {int(table.n_spots)} spots, exceeding "
                    f"max_spots={cfg.max_spots}; raise SpotfindConfig."
                    "max_spots or lower the batch size"
                )
        pitch = (int(hp) + 1) * self.width
        results: list[FrameResult] = []
        for b, num in enumerate(image_numbers):
            n = int(counts[b])
            if n > kf:
                # transparent fallback: the per-frame tiered path holds up
                # to max_strong_pixels and hard-fails loudly past that
                if images is None:
                    raise RuntimeError(
                        f"frame {num}: {n} strong pixels exceed the batched "
                        f"per-frame capacity {kf} and no host frames were "
                        "provided for the per-frame fallback"
                    )
                results.append(self.process_frame(num, images[b], want_com))
                continue
            sl = slice(b * kf, b * kf + n)
            lin_f = np.asarray(pixels.linear_index[sl]) - b * pitch
            inten = np.asarray(pixels.intensity[sl])
            if self.host_cc:
                cp = cc.CompactPixels(
                    linear_index=lin_f, intensity=inten, count=np.int32(n)
                )
                results.append(self._collect_host(num, cp, want_com))
                continue
            root_f = np.asarray(root_lin[sl]) - b * pitch
            mine = np.asarray(table.valid) & (np.asarray(table.z_min) == b)
            keep_sz = mine & np.asarray(size_keep)
            coms = np.zeros((0, 3))
            if want_com:
                kb = mine & np.asarray(both_keep)
                coms = np.stack(
                    [
                        np.asarray(table.com_x)[kb],
                        np.asarray(table.com_y)[kb],
                        np.asarray(table.com_z)[kb] - b,
                    ],
                    axis=1,
                )
            results.append(
                FrameResult(
                    image_number=num,
                    n_strong_pixels=n,
                    n_spots=int(keep_sz.sum()),
                    n_spots_prefilter=int(mine.sum()),
                    n_strong_pixels_filtered=int(
                        np.asarray(table.n_pixels)[keep_sz].sum()
                    ),
                    pixels=cc3d.FramePixels(
                        linear_index=lin_f, intensity=inten, root=root_f
                    ),
                    centers_of_mass=coms,
                )
            )
        return results

    def warmup(self, dtype=np.uint16) -> None:
        """Trace + compile the full dispatch->collect path on a zero frame
        (kernel, the smallest compaction tier, and the host/device CC
        backend) so the first real frame doesn't pay the XLA compile
        stall (the tunnelled compile service can take minutes)."""
        self.process_frame(-1, np.zeros((self.height, self.width), dtype=dtype))

    def dispatch(self, image: np.ndarray):
        """Asynchronously dispatch one frame; returns device futures."""
        if self._x64_off:
            with jax.enable_x64(False):
                if self.host_compact:
                    # host-compaction path: the device's job ends at the
                    # packed words; keep the host frame for the bit scan
                    pcw, count = self._rowcum_step(jnp.asarray(image))
                    return ("hostcompact", image, pcw, count)
                if self.host_cc:
                    # tiered path: kernel now, compaction sized in collect()
                    img_dev = jnp.asarray(image)
                    rowcum, count = self._rowcum_step(img_dev)
                    return ("tiered", img_dev, rowcum, count)
                return self._step(jnp.asarray(image))
        return self._step(jnp.asarray(image))

    def collect(
        self, image_number: int, device_result, want_com: bool = False
    ) -> FrameResult:
        """Block on a dispatched frame and assemble the host result."""
        if isinstance(device_result, tuple) and (
            len(device_result) == 4 and device_result[0] == "hostcompact"
        ):
            _, img_host, pcw, count = device_result
            return self._collect_hostcompact(
                image_number, img_host, pcw, int(count), want_com
            )
        if isinstance(device_result, tuple) and (
            len(device_result) == 4 and device_result[0] == "tiered"
        ):
            _, img_dev, rowcum, count = device_result
            n = int(count)
            tier = next((t for t in self._capacity_tiers if n <= t), None)
            if tier is None:
                # past the top tier: hard-fail like the reference's
                # saturation conditions (integrator.cc:1073-1096 analogue;
                # the i32 sort-key guard already fails loudly) instead of
                # silently truncating the spot list
                raise RuntimeError(
                    f"frame {image_number}: {n} strong pixels exceed the "
                    f"maximum capacity {self._capacity_tiers[-1]}; raise "
                    "SpotfindConfig.max_strong_pixels"
                )
            with jax.enable_x64(False):
                pixels = self._compact_step(img_dev, rowcum, max_pixels=tier)
            return self._collect_host(
                image_number, jax.device_get(pixels), want_com
            )
        if self.host_cc:
            (pixels,) = jax.device_get(device_result)
            return self._collect_host(image_number, pixels, want_com)
        pixels, root_lin, table, both_keep, n_boxes, n_px_filtered = jax.device_get(
            device_result
        )
        n = int(pixels.count)
        if n > len(pixels.linear_index):
            # capacity overflow: the exact total is known (the kernel's
            # prefix counts are unbounded) but the compact arrays truncated.
            # The one-shot device path is already sized at the configured
            # maximum, so this is a hard failure (reference analogue: the
            # integrator's histogram-saturation error, integrator.cc:
            # 1073-1096), not a warning a service log could swallow.
            raise RuntimeError(
                f"frame {image_number}: {n} strong pixels exceed the "
                f"configured capacity {len(pixels.linear_index)}; raise "
                "SpotfindConfig.max_strong_pixels"
            )
        if int(table.n_spots) > self.config.max_spots:
            # same fail-loudly contract as collect_batch: spot ids past
            # max_spots fall in the dropped overflow segment, so the
            # table would be silently wrong
            raise RuntimeError(
                f"frame {image_number}: {int(table.n_spots)} spots exceed "
                f"max_spots={self.config.max_spots}; raise "
                "SpotfindConfig.max_spots"
            )
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

    def _collect_hostcompact(
        self,
        image_number: int,
        img_host: np.ndarray,
        pcw,
        n: int,
        want_com: bool,
        timings: dict | None = None,
    ) -> FrameResult:
        """Host-compaction epilogue: d2h the packed words, expand the set
        bits against the host frame copy, label + tabulate on the host.
        ``timings`` (profiled path) receives 'compact' and 'post' ms."""
        import time

        if n > self.config.max_strong_pixels:
            # same hard failure as the device paths: never silently
            # truncate past the configured capacity
            raise RuntimeError(
                f"frame {image_number}: {n} strong pixels exceed the "
                f"configured capacity {self.config.max_strong_pixels}; "
                "raise SpotfindConfig.max_strong_pixels"
            )
        from .ops.compact_host import compact_pcw_host

        t0 = time.perf_counter()
        lin, inten = compact_pcw_host(np.asarray(pcw), img_host, self.width)
        t1 = time.perf_counter()
        result = self._collect_host(
            image_number,
            cc.CompactPixels(linear_index=lin, intensity=inten, count=n),
            want_com,
        )
        if timings is not None:
            timings["compact"] = (t1 - t0) * 1e3  # d2h + host bit scan
            timings["post"] = (time.perf_counter() - t1) * 1e3
        return result

    def _collect_host(
        self, image_number: int, pixels, want_com: bool
    ) -> FrameResult:
        """Label + tabulate on the host (C++ union-find over ~3k pixels)."""
        from .ops.cc2d_host import cc2d, filter_spots_host

        cfg = self.config
        n = int(pixels.count)
        if n > len(pixels.linear_index):
            # see collect(): past-capacity frames hard-fail rather than
            # silently truncating the spot list
            raise RuntimeError(
                f"frame {image_number}: {n} strong pixels exceed the "
                f"configured capacity {len(pixels.linear_index)}; raise "
                "SpotfindConfig.max_strong_pixels"
            )
        lin = np.asarray(pixels.linear_index[:n])
        inten = np.asarray(pixels.intensity[:n])
        table = cc2d(lin, inten, self.width)
        size_keep, _, _ = filter_spots_host(table, cfg.min_spot_size, -1.0)
        both_keep, _, _ = filter_spots_host(
            table, cfg.min_spot_size, cfg.max_peak_centroid_separation
        )
        coms = np.zeros((0, 3))
        if want_com:
            coms = np.stack(
                [
                    table.com_x[both_keep],
                    table.com_y[both_keep],
                    table.com_z[both_keep],
                ],
                axis=1,
            )
        return FrameResult(
            image_number=image_number,
            n_strong_pixels=n,
            n_spots=int(size_keep.sum()),
            n_spots_prefilter=table.n_spots,
            n_strong_pixels_filtered=int(table.n_pixels[size_keep].sum()),
            pixels=cc3d.FramePixels(
                linear_index=lin, intensity=inten, root=table.root_lin
            ),
            centers_of_mass=coms,
        )

    def process_frame(
        self, image_number: int, image: np.ndarray, want_com: bool = False
    ) -> FrameResult:
        return self.collect(image_number, self.dispatch(image), want_com)

    def process_frame_profiled(
        self, image_number: int, image: np.ndarray, want_com: bool = False
    ) -> tuple[FrameResult, dict]:
        """Synchronous per-stage timing of one frame.

        Equivalent of the reference's per-image CUDA-event breakdown
        (reference: spotfinder/spotfinder.cc:1054-1087); each stage blocks
        before the next is timed, so the numbers are wall-clock per stage —
        slower in aggregate than the pipelined dispatch/collect path, which
        is why this only runs under --profile.
        Stages: upload (host->device copy), kernel (threshold + prefix
        counts), compact (stream compaction), post (CC + table + filters,
        device or host C++ according to cc_backend).
        """
        import time

        timings: dict[str, float] = {}

        def tick(name, fn):
            t0 = time.perf_counter()
            out = fn()
            timings[name] = (time.perf_counter() - t0) * 1e3
            return out

        if self._x64_off:
            ctx = jax.enable_x64(False)
        else:
            import contextlib

            ctx = contextlib.nullcontext()
        with ctx:
            img_dev = tick(
                "upload",
                lambda: jax.block_until_ready(jnp.asarray(image)),
            )
            # the tiered kernel/compact split exists only on the Pallas
            # path — host-CC WITHOUT Pallas (e.g. precision="f64") takes
            # the fused dense step below, exactly as dispatch() does
            if self.host_compact and self._x64_off:
                pcw, count = tick(
                    "kernel",
                    lambda: jax.block_until_ready(self._rowcum_step(img_dev)),
                )
                result = self._collect_hostcompact(
                    image_number, image, pcw, int(count), want_com,
                    timings=timings,
                )
                return result, timings
            if self.host_cc and self._x64_off:
                rowcum, count = tick(
                    "kernel",
                    lambda: jax.block_until_ready(self._rowcum_step(img_dev)),
                )
                n = int(count)
                tier = next(
                    (t for t in self._capacity_tiers if n <= t), None
                )
                if tier is None:
                    # same hard failure as collect(): never silently
                    # truncate past the top capacity tier
                    raise RuntimeError(
                        f"frame {image_number}: {n} strong pixels exceed "
                        f"the maximum capacity {self._capacity_tiers[-1]}; "
                        "raise SpotfindConfig.max_strong_pixels"
                    )
                pixels = tick(
                    "compact",
                    lambda: jax.block_until_ready(
                        self._compact_step(img_dev, rowcum, max_pixels=tier)
                    ),
                )
                result = tick(
                    "post",
                    lambda: self._collect_host(
                        image_number, jax.device_get(pixels), want_com
                    ),
                )
                return result, timings
            device_result = tick(
                "kernel+compact+post (fused device step)",
                lambda: jax.block_until_ready(self._step(img_dev)),
            )
        result = tick(
            "collect", lambda: self.collect(image_number, device_result, want_com)
        )
        return result, timings
