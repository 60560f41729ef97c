"""Kabsch-frame foreground/background classification and accumulation.

Equivalent of the reference's GPU Kabsch kernel (reference:
integrator/kabsch.cu:60-675): for every (reflection, frame) pair, each
shoebox pixel's four voxel corners are mapped to scattered wavevectors and
tested against the Kabsch-space ellipsoid

    eps1^2/delta_b^2 + eps2^2/delta_b^2 + eps3^2/delta_m^2 <= 1

("ellipsoid" evaluates the low/high/centre phi slices; "dials" a single 2D
ellipse ignoring eps3).  Foreground pixels accumulate intensity sums and
centroid moments; background pixels accumulate a bounded 256-bin histogram
plus overflow count.

TPU formulation: the reference's block-per-shoebox + shared-memory corner
tile + global atomics (SURVEY.md P4) becomes one jitted step per frame over
a padded (MAX_ACTIVE, BOX_H, BOX_W) gather of shoebox windows; the atomics
become masked reductions.  Everything is static-shape so the step compiles
once for the whole collection.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .background import NUM_BG_BINS


def _weighted_index_dot(vals_i32, n: int):
    """Exact ``sum_j vals[:, j] * j`` for i32 ``vals < 2**26``, in f64.

    f64 dot_general lowers catastrophically on TPU (software-emulated
    mantissa arithmetic; ~10 ms for an (512, 3, h, w) contraction,
    tools/measure_kabsch.py) — but these moment dots are pure integer
    arithmetic, so a 13-bit hi/lo split keeps every partial dot exactly
    representable in native i32: hi, lo < 2**13 and the weighted sums are
    bounded by 2**13 * n*(n-1)/2 < 2**31 for n <= 512.  The recombined
    f64 value is bit-identical to the f64 dot it replaces.
    """
    import jax.numpy as jnp

    assert n <= 512, "i32 split dot bound needs n <= 512"
    w = jnp.arange(n, dtype=jnp.int32)
    hi_dot = jnp.sum((vals_i32 >> 13) * w, axis=1)
    lo_dot = jnp.sum((vals_i32 & 8191) * w, axis=1)
    return hi_dot.astype(jnp.float64) * 8192.0 + lo_dot.astype(jnp.float64)


@dataclass
class FrameWork:
    """Per-frame work unit: which reflections are active and their windows."""

    refl_idx: np.ndarray  # (A,) indices into the global reflection arrays
    x0: np.ndarray  # (A,) window origins (pixels)
    y0: np.ndarray


@dataclass
class Accumulators:
    """Global per-reflection accumulators (host resident)."""

    fg_sum: np.ndarray
    fg_count: np.ndarray
    sum_ix: np.ndarray  # sum I * (x + 0.5)
    sum_iy: np.ndarray
    sum_iz: np.ndarray
    bg_hist: np.ndarray  # (N, NUM_BG_BINS)
    bg_overflow: np.ndarray
    bg_count: np.ndarray

    @classmethod
    def zeros(cls, n: int) -> "Accumulators":
        return cls(
            fg_sum=np.zeros(n),
            fg_count=np.zeros(n, dtype=np.int64),
            sum_ix=np.zeros(n),
            sum_iy=np.zeros(n),
            sum_iz=np.zeros(n),
            bg_hist=np.zeros((n, NUM_BG_BINS), dtype=np.int64),
            bg_overflow=np.zeros(n, dtype=np.int64),
            bg_count=np.zeros(n, dtype=np.int64),
        )


def format_shoebox_fill_histogram(
    bboxes: np.ndarray, box_w: int, box_h: int, max_active: int
) -> str:
    """Shoebox occupancy diagnostic, the TPU analogue of the reference's
    per-block pass-count histogram (reference: integrator/integrator.cc:
    76-153, logged at debug level at startup).

    On CUDA the cost unit is GPU blocks x passes; on TPU it is the padded
    (box_h, box_w) gather window every reflection occupies in the batched
    device step, so the waste metric is the fill fraction of that static
    window.  Reflection-image slices are bucketed by fill, weighted by
    z-depth (the real per-step population), and summarised with the
    overall slot utilisation.  Returns an empty string when nothing is
    integrable.
    """
    buckets = [
        (0.75, 1.01, ">=75%"),
        (0.50, 0.75, "50-75"),
        (0.25, 0.50, "25-50"),
        (0.10, 0.25, "10-25"),
        (0.00, 0.10, " <10%"),
    ]
    counts = [0] * len(buckets)
    slot_px = box_w * box_h
    total_slices = 0
    total_px = 0
    for bbox in np.asarray(bboxes, dtype=np.int64):
        npix = int((bbox[1] - bbox[0] + 1) * (bbox[3] - bbox[2] + 1))
        # z_max is EXCLUSIVE throughout (extent.py ceil/act_f > z)
        depth = int(bbox[5] - bbox[4])
        if npix <= 0 or depth <= 0:
            continue
        fill = min(npix / slot_px, 1.0)
        for b, (lo, hi, _label) in enumerate(buckets):
            if lo <= fill < hi:
                counts[b] += depth
                break
        total_slices += depth
        total_px += npix * depth
    if total_slices == 0:
        return ""
    bar_width = 24
    peak = max(counts)
    out = (
        f"Shoebox fill over {total_slices} reflection-image slices "
        f"({box_w}x{box_h} padded windows, {max_active}/step):"
    )
    for (lo, hi, label), c in zip(buckets, counts):
        fill_n = (c * bar_width + peak - 1) // peak if peak else 0
        bar = "#" * fill_n + "." * (bar_width - fill_n)
        out += f"\n  {label}  {bar}  {100.0 * c / total_slices:5.1f}%  ({c})"
    out += (
        f"\n  avg {total_px / total_slices:.0f} px/slice, "
        f"{100.0 * total_px / (total_slices * slot_px):.0f}% window utilisation"
    )
    return out


class KabschIntegrator:
    """Owns the jitted per-frame classification step."""

    def __init__(
        self,
        *,
        panel,
        beam,
        gonio,
        scan,
        s1: np.ndarray,  # (N, 3) predicted s1 at reflection centres
        phi: np.ndarray,  # (N,) predicted phi (radians)
        bboxes: np.ndarray,  # (N, 6) x_min,x_max,y_min,y_max,z_min,z_max
        delta_b: float,
        delta_m: float,
        algorithm: str = "ellipsoid",
        # +1 (not the historical +8): the window only has to COVER the
        # bbox (rows 0..heights.max, so heights.max+1 rows before the
        # 8-multiple round-up) — everything past the bbox is masked by
        # in_bbox, so extra pad rows are pure wasted DMA + VPU work
        # (box_h 32 -> 24 at 21-px boxes cut the windows gather and the
        # fg grids by 25%, bit-exact)
        box_pad: int = 1,
        max_active: int = 512,  # reflections per device step (padded chunk)
        # pack 4 reflections' 32-lane windows into each 128-lane vreg row
        # of the per-frame VPU grids when the boxes fit (see
        # _finish_block_step_packed); False forces the classic full-lane
        # path (parity tests)
        lane_pack: bool = True,
    ):
        import jax
        import jax.numpy as jnp

        self._jnp = jnp
        self.panel = panel
        self.scan = scan
        self.s1 = np.asarray(s1, dtype=np.float64)
        self.phi = np.asarray(phi, dtype=np.float64)
        # own copy (np.array, not asarray): the x/y clip below must never
        # mutate the caller's array
        self.bboxes = np.array(bboxes, dtype=np.int64)
        self.algorithm = algorithm
        self.max_active = max_active

        # clip x/y to the detector here, not just in the CLI: off-panel
        # extents (extent.py floors off-panel ray intersections) would
        # otherwise reach the window DMA as negative/oversized offsets and
        # gather garbage with no error (review r3)
        w_img, h_img = int(panel.image_size[0]), int(panel.image_size[1])
        self.bboxes[:, 0] = np.clip(self.bboxes[:, 0], 0, w_img - 1)
        self.bboxes[:, 1] = np.clip(self.bboxes[:, 1], 0, w_img - 1)
        self.bboxes[:, 2] = np.clip(self.bboxes[:, 2], 0, h_img - 1)
        self.bboxes[:, 3] = np.clip(self.bboxes[:, 3], 0, h_img - 1)

        widths = self.bboxes[:, 1] - self.bboxes[:, 0]
        heights = self.bboxes[:, 3] - self.bboxes[:, 2]
        # the blocked step's pixel window is a fixed 128 lanes starting at
        # x_min, and each pixel's right corner comes from a roll that wraps
        # at lane 127 — widths past 127 would silently drop columns, so
        # fail loudly instead (review r3)
        wmax = int(widths.max(initial=0)) + 1
        if wmax > 127:
            raise ValueError(
                f"shoebox width {wmax} exceeds the blocked step's 128-lane "
                "window (pixel lanes span x_min..x_min+127 and the corner "
                "roll wraps at lane 127); shrink delta_b or the bboxes"
            )
        self.box_w = int(
            ((max(int(widths.max(initial=1)), 1) + box_pad) + 7) // 8 * 8
        )
        self.box_h = int(
            ((max(int(heights.max(initial=1)), 1) + box_pad) + 7) // 8 * 8
        )
        # exact static extents of the occupied window region (rows
        # 0..heights[a], lanes 0..widths[a]): the histogram one-hot
        # contraction slices to these — everything outside is masked by
        # in_bbox, so the slice is bit-exact
        self._hist_rows = min(int(heights.max(initial=0)) + 1, self.box_h)
        self._hist_lanes = min(int(widths.max(initial=0)) + 1, 128)
        # lane packing is exact only while every valid pixel lane l (l <=
        # widths.max) has both its corners l and l+1 inside the 32-lane
        # group: widths.max <= 30, i.e. _hist_lanes <= 31
        self._lane_group = (
            4 if lane_pack and self._hist_lanes <= 31 and max_active % 4 == 0
            else 1
        )

        # static model parameters captured in the jit closure
        self._s0 = jnp.asarray(beam.s0)
        self._m2 = jnp.asarray(
            gonio.rotation_axis / np.linalg.norm(gonio.rotation_axis)
        )
        self._wl = float(beam.wavelength)
        self._fast = jnp.asarray(panel.fast_axis)
        self._slow = jnp.asarray(panel.slow_axis)
        self._origin = jnp.asarray(panel.origin)
        self._px = float(panel.pixel_size[0])
        self._py = float(panel.pixel_size[1])
        self._parallax = bool(panel.parallax and panel.mu > 0)
        self._mu = float(panel.mu)
        self._t0 = float(panel.thickness)
        normal = np.cross(panel.fast_axis, panel.slow_axis)
        if np.dot(panel.origin, normal) < 0:
            normal = -normal
        self._normal = jnp.asarray(normal / np.linalg.norm(normal))
        self._delta_b = float(delta_b)
        self._delta_m = float(delta_m)

        self._step = jax.jit(
            self._frame_step, static_argnames=("centre_slices",)
        )
        # Pallas gathers run in Mosaic interpret mode off-TPU (CPU tests)
        self._interpret = jax.default_backend() != "tpu"
        self._field = None
        self._panel_w = int(panel.image_size[0])
        self._panel_h = int(panel.image_size[1])

    def corner_field(self):
        """Detector-wide corner scattered-wavevector field, built ONCE per
        collection: (H+box_h+1, W+box_w+1, 3) f64 of s_pixel at every pixel
        corner the shoebox windows can touch.

        The per-corner norm/parallax math dominated the per-frame step
        (~14.7 of 20.4 ms at A=512 on v5e, tools/measure_kabsch.py); it is
        frame-invariant, so the step now just gathers windows of this
        field.  Values are bit-identical to the inline computation (same
        formula, same f64 ops).
        """
        if self._field is None:
            import jax
            import jax.numpy as jnp

            w = self._panel_w + self.box_w + 1
            h = self._panel_h + self.box_h + 1

            @jax.jit
            def build():
                cx = jnp.broadcast_to(
                    jnp.arange(w, dtype=jnp.float64)[None, :], (h, w)
                )
                cy = jnp.broadcast_to(
                    jnp.arange(h, dtype=jnp.float64)[:, None], (h, w)
                )
                # plane-major (3, h, w): window slices gather three
                # lane-contiguous (bh+1, bw+1) tiles, like the image
                # windows; (h, w, 3) would put the 3-vector in lanes and
                # gather terribly
                return jnp.moveaxis(self._corner_s_pixel(cx, cy), -1, 0)

            self._field = jax.block_until_ready(build())
        return self._field

    # --- device math --------------------------------------------------------

    def _corner_s_pixel(self, cx, cy):
        """Scattered unit wavevector / wavelength at pixel corner (cx, cy)
        (reference: kabsch.cu:174-258, incl. parallax px_to_mm)."""
        jnp = self._jnp
        x1 = cx * self._px
        x2 = cy * self._py
        if self._parallax:
            lab0 = (
                self._origin
                + x1[..., None] * self._fast
                + x2[..., None] * self._slow
            )
            s1_hat = lab0 / jnp.linalg.norm(lab0, axis=-1, keepdims=True)
            cos_t = s1_hat @ self._normal
            o = (1.0 / self._mu) - (self._t0 / cos_t + 1.0 / self._mu) * jnp.exp(
                -self._mu * self._t0 / cos_t
            )
            x1 = x1 - (s1_hat @ self._fast) * o
            x2 = x2 - (s1_hat @ self._slow) * o
        lab = (
            self._origin + x1[..., None] * self._fast + x2[..., None] * self._slow
        )
        return lab / jnp.linalg.norm(lab, axis=-1, keepdims=True) / self._wl

    def _frame_step(
        self,
        field,  # (H+bh+1, W+bw+1, 3) f64 corner field (corner_field())
        image,
        det_mask,
        x0,
        y0,
        bbox,  # (A, 6)
        s1_c,  # (A, 3)
        phi_c,  # (A,)
        e1,
        e2,
        zeta,
        active,  # (A,) bool
        phi_low,
        phi_high,
        z_value,
        centre_slices: bool,
    ):
        jnp = self._jnp
        A = x0.shape[0]
        bh, bw = self.box_h, self.box_w

        # image padded by the box size on each side so window slices never
        # clamp; mask zero in the padding
        import jax

        def get_window(arr, yy, xx):
            return jax.lax.dynamic_slice(arr, (yy, xx), (bh, bw))

        # NB: legacy/tools path only.  The f32 round-trip is exact for
        # u16 frames but loses low bits of i32 values >= 2^24 — the
        # blocked production step stays in i32 throughout.
        windows = jax.vmap(lambda yy, xx: get_window(image, yy, xx))(
            y0 + bh, x0 + bw
        ).astype(jnp.float32)
        mwin = jax.vmap(lambda yy, xx: get_window(det_mask, yy, xx))(
            y0 + bh, x0 + bw
        )

        px = x0[:, None] + jnp.arange(bw)[None, :]  # (A, bw)
        py = y0[:, None] + jnp.arange(bh)[None, :]  # (A, bh)
        in_bbox = (
            (px[:, None, :] >= bbox[:, 0, None, None])
            & (px[:, None, :] <= bbox[:, 1, None, None])
            & (py[:, :, None] >= bbox[:, 2, None, None])
            & (py[:, :, None] <= bbox[:, 3, None, None])
        )
        valid_px = in_bbox & (mwin != 0) & active[:, None, None]

        # corner grid (A, 3, bh+1, bw+1): gathered windows of the
        # frame-invariant detector corner field (bit-identical values to
        # computing _corner_s_pixel inline; the norm/parallax math runs
        # once per collection, not per frame — tools/measure_kabsch.py)
        s_px = jax.vmap(
            lambda yy, xx: jax.lax.dynamic_slice(
                field, (0, yy, xx), (3, bh + 1, bw + 1)
            )
        )(y0, x0)

        # e12 is phi-independent: compute the Kabsch in-plane term ONCE and
        # evaluate each phi slice as a scalar-threshold comparison (the old
        # form re-ran the einsum per slice).  Precision split: the
        # catastrophic cancellation lives in delta = s_px - s1_c (two O(1)
        # vectors whose difference is O(delta_b)); that subtraction runs
        # elementwise in f64 (cheap), after which delta carries ~1e-10
        # absolute error when cast to f32, so the projections run as f32
        # einsums — f64 dot_general on TPU lowers catastrophically (~10 ms
        # for this contraction at A=512, tools/measure_kabsch.py) while the
        # classification boundary error of the f32 projection is ~1e-7
        # relative, far below the reference's own reduced-precision drift.
        s1_len = jnp.linalg.norm(s1_c, axis=-1)
        e1n = (e1 / s1_len[:, None]).astype(jnp.float32)
        e2n = (e2 / s1_len[:, None]).astype(jnp.float32)
        delta = (s_px - s1_c[:, :, None, None]).astype(jnp.float32)
        eps1 = jnp.einsum("akhw,ak->ahw", delta, e1n)
        eps2 = jnp.einsum("akhw,ak->ahw", delta, e2n)
        e12 = (eps1 * eps1 + eps2 * eps2) / np.float32(self._delta_b**2)

        def fg_at(phi_eval):
            if self.algorithm == "dials":
                return e12 <= 1.0
            # per-reflection scalar in f64, broadcast compare in f32
            eps3 = zeta * (phi_eval - phi_c)
            t = (1.0 - eps3 * eps3 / (self._delta_m**2)).astype(jnp.float32)
            return e12 <= t[:, None, None]

        if self.algorithm == "dials":
            corner_in = fg_at(phi_low)
        else:
            corner_in = fg_at(phi_low) | fg_at(phi_high)
            if centre_slices:
                centre_ok = (phi_c >= jnp.minimum(phi_low, phi_high)) & (
                    phi_c <= jnp.maximum(phi_low, phi_high)
                )
                corner_in = corner_in | (
                    fg_at(phi_c) & centre_ok[:, None, None]
                )

        # pixel foreground = OR of its 4 corners (kabsch.cu:336-380)
        fg = (
            corner_in[:, :-1, :-1]
            | corner_in[:, :-1, 1:]
            | corner_in[:, 1:, :-1]
            | corner_in[:, 1:, 1:]
        )
        fg = fg & valid_px
        bg = (~fg) & valid_px

        # Foreground accumulation, exact-integer decomposition.  The
        # reference uses double/u64 atomics for bit-exact run-stable sums
        # (reference: integrator.cc:785-794, kabsch.cu:585-599); here every
        # partial sum is an exact integer or half-integer, so the values
        # are IDENTICAL to the f64 big-grid reductions they replace while
        # running at native i32 VPU speed: per-window column sums of the
        # masked intensities stay < 2^26, and the (x + 0.5) / (y + 0.5)
        # moments split into (x0 + 0.5) * fg_sum + sum(I * col) with the
        # small weighted dots done exactly in split i32 (_weighted_index_dot).
        ivals = jnp.clip(windows.astype(jnp.int32), 0, None)
        mi = jnp.where(fg, ivals, 0)  # masked intensities, i32 exact
        colsum = jnp.sum(mi, axis=1)  # (A, bw) over rows; <= bh * 65535
        rowsum = jnp.sum(mi, axis=2)  # (A, bh)
        fg_sum_i = jnp.sum(colsum, axis=1)  # (A,) <= bh*bw*65535 < 2^27
        fg_sum = fg_sum_i.astype(jnp.float64)
        fg_count = jnp.sum(fg, axis=(1, 2)).astype(jnp.int32)
        sum_ix = (x0.astype(jnp.float64) + 0.5) * fg_sum + _weighted_index_dot(
            colsum, bw
        )
        sum_iy = (y0.astype(jnp.float64) + 0.5) * fg_sum + _weighted_index_dot(
            rowsum, bh
        )
        sum_iz = fg_sum * (z_value + 0.5)

        # Background histogram as a two-level one-hot MXU contraction: with
        # bin = 16*coarse + fine (coarse = val >> 4, fine = val & 15), the
        # 256-bin histogram is hist[a] = co[a]^T @ fi[a] reshaped — a
        # batched (16, px) x (px, 16) bf16 matmul with exact f32
        # accumulation (counts <= px < 2^24; one-hot entries are exact in
        # bf16).  Replaces the segment-sum formulation which cost 7.5 ms at
        # A=512 on v5e (tools/measure_kabsch.py) — data-dependent scatter
        # lowers to sorting; this is pure MXU work.
        vals = ivals  # same clipped-intensity grid as the moments above
        in_range = bg & (vals < NUM_BG_BINS)
        coarse = vals >> 4
        fine = vals & 15
        k16 = jnp.arange(16, dtype=jnp.int32)
        co = (
            in_range[..., None] & (coarse[..., None] == k16)
        ).reshape(A, bh * bw, 16)
        fi = (fine[..., None] == k16).reshape(A, bh * bw, 16)
        hist = (
            jnp.einsum(
                "apc,apf->acf",
                co.astype(jnp.bfloat16),
                fi.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            .reshape(A, NUM_BG_BINS)
            .astype(jnp.int32)
        )
        overflow = jnp.sum(bg & (vals >= NUM_BG_BINS), axis=(1, 2)).astype(
            jnp.int32
        )
        bg_count = jnp.sum(bg, axis=(1, 2)).astype(jnp.int32)

        return fg_sum, fg_count, sum_ix, sum_iy, sum_iz, hist, overflow, bg_count

    # --- blocked device step (production path) ------------------------------

    def _chunk_setup(self, chunk: np.ndarray, cs_e1, cs_e2, zeta):
        """Device-resident per-chunk constants: gathered corner-field
        windows (hi/lo split), mask windows, and parameter arrays.  Cached
        by the driver for the chunk's whole z-span (~4-6 frames), so the
        corner geometry amortises across the block steps."""
        import jax.numpy as jnp

        from ..ops.window_gather import window_gather_planes

        a = len(chunk)
        pad_n = self.max_active - a

        def padi(v, fill=0):
            return np.concatenate(
                [v, np.full((pad_n,) + v.shape[1:], fill, v.dtype)]
            )

        x0 = padi(self.bboxes[chunk, 0])
        y0 = padi(self.bboxes[chunk, 2])
        dev = {
            "x0": jnp.asarray(x0),
            "y0": jnp.asarray(y0),
            "bbox": jnp.asarray(padi(self.bboxes[chunk])),
            "s1": jnp.asarray(padi(self.s1[chunk])),
            "phi": jnp.asarray(padi(self.phi[chunk])),
            "e1": jnp.asarray(padi(cs_e1[chunk])),
            "e2": jnp.asarray(padi(cs_e2[chunk])),
            "zeta": jnp.asarray(padi(zeta[chunk])),
            "active": jnp.asarray(padi(np.ones(a, dtype=bool), False)),
        }
        # corner-field windows: one multi-plane DMA per reflection over the
        # 6 hi/lo planes; rows start at y0 (corner grid needs bh+1 rows ->
        # gather bh+8), lanes at x0 (corner lanes x0..x0+bw < x0+128).
        # The in-plane Kabsch term e12 is chunk geometry (frame-invariant),
        # so it is computed HERE, once per chunk, instead of inside every
        # (chunk, frame-block) step — the old form re-ran the delta + two
        # (A, 3, bh+8, 128) einsums 4-6 times per chunk and kept the 6-plane
        # field windows (6x the memory of e12) alive in the chunk cache.
        fieldw = window_gather_planes(
            self.corner_field_f32(),
            dev["y0"].astype(jnp.int32),
            dev["x0"].astype(jnp.int32),
            bh=self.box_h + 8,
            interpret=self._interpret,
        )
        if not hasattr(self, "_e12_jit"):
            import jax

            self._e12_jit = jax.jit(self._e12_from_fieldw)
        dev["e12"] = self._e12_jit(fieldw, dev["s1"], dev["e1"], dev["e2"])
        dev["maskw"] = self._mask_windows(dev["y0"], dev["x0"])
        if self._lane_group == 4:
            # chunk-invariant grids move to the packed lane layout HERE,
            # once per chunk (the step would otherwise relayout ~26 MB of
            # e12 every block step); also shrinks the chunk cache 4x
            if not hasattr(self, "_pack_rows_jit"):
                import jax

                self._pack_rows_jit = jax.jit(self._pack_rows)
            dev["e12"] = self._pack_rows_jit(dev["e12"])
            if dev["maskw"] is not None:
                dev["maskw"] = self._pack_rows_jit(dev["maskw"])
        return dev

    def _e12_from_fieldw(self, fieldw, s1_c, e1, e2):
        """(A, bh+1, 128) f32 in-plane Kabsch term from the hi/lo corner
        field windows.  delta = (hi - s1hi) + (lo - s1lo) is accurate to
        ~2^-24 RELATIVE to delta (the hi subtraction is exactly rounded to
        ulp(delta); the lo difference restores the truncated f64 bits), so
        the f32 projections carry f64-grade classification boundaries
        without any f64 grid math."""
        jnp = self._jnp
        s1_hi = s1_c.astype(jnp.float32)
        s1_lo = (s1_c - s1_hi.astype(jnp.float64)).astype(jnp.float32)
        delta = (fieldw[:, 0:3] - s1_hi[:, :, None, None]) + (
            fieldw[:, 3:6] - s1_lo[:, :, None, None]
        )  # (A, 3, bh+8, 128) f32
        s1_len = jnp.linalg.norm(s1_c, axis=-1)
        e1n = (e1 / s1_len[:, None]).astype(jnp.float32)
        e2n = (e2 / s1_len[:, None]).astype(jnp.float32)
        eps1 = jnp.einsum("akhw,ak->ahw", delta, e1n)
        eps2 = jnp.einsum("akhw,ak->ahw", delta, e2n)
        e12 = (eps1 * eps1 + eps2 * eps2) / np.float32(self._delta_b**2)
        return e12[:, : self.box_h + 1, :]  # corner rows 0..bh

    def corner_field_f32(self):
        """(6, Hc, Wc) f32 hi/lo split of :meth:`corner_field`, padded so
        window lane starts satisfy the gather contract."""
        if getattr(self, "_field6", None) is None:
            import jax.numpy as jnp

            # host-side split: a jitted version folds the whole field into
            # the program as a constant, writing a ~342 MB XLA cache entry
            # per shape — NumPy is instant and uploads once
            f64 = np.asarray(self.corner_field())  # (3, h, w)
            # drop the ~450 MB f64 DEVICE buffer now that the split has a
            # host copy — the blocked path only ever reads the f32 planes;
            # corner_field() rebuilds on demand (legacy/tools path only)
            self._field = None
            _, h, w = f64.shape
            # lane padding: x0 + box_w <= w - 128 must hold for the gather
            wp = ((w + self.box_w + 128 + 127) // 128) * 128
            hp = ((h + self.box_h + 8 + 7) // 8) * 8
            fp = np.pad(f64, ((0, 0), (0, hp - h), (0, wp - w)))
            hi = fp.astype(np.float32)
            lo = (fp - hi.astype(np.float64)).astype(np.float32)
            self._field6 = jnp.asarray(np.concatenate([hi, lo], axis=0))
        return self._field6

    def _mask_windows(self, y0, x0):
        """Detector-mask windows for a chunk (frame-invariant, cached)."""
        import jax.numpy as jnp

        from ..ops.window_gather import window_gather

        if getattr(self, "_mask_canvas", None) is None:
            return None  # set_mask not called: treat all pixels valid
        return window_gather(
            self._mask_canvas,
            y0.astype(jnp.int32),
            x0.astype(jnp.int32),
            bh=self.box_h,
            interpret=self._interpret,
        )

    def set_mask(self, det_mask: np.ndarray) -> None:
        """Upload the (frame-invariant) detector mask canvas once."""
        import jax.numpy as jnp

        hp = det_mask.shape[0] + self.box_h
        wp = ((det_mask.shape[1] + 255) // 128) * 128
        pad = np.zeros((hp, wp), np.int32)
        pad[: det_mask.shape[0], : det_mask.shape[1]] = det_mask.astype(
            np.int32
        )
        self._mask_canvas = jnp.asarray(pad)

    def pad_frames(self, frames: np.ndarray) -> np.ndarray:
        """Pad a (F, H, W) frame stack to the gather canvas (host side)."""
        f, h, w = frames.shape
        wp = ((w + 255) // 128) * 128
        out = np.zeros((f, h + self.box_h, wp), frames.dtype)
        out[:, :h, :w] = frames
        return out

    def _block_step_impl(
        self,
        frames,  # (F, Hp, Wp) i32 padded resident frames
        e12,  # (A, bh+1, 128) f32 chunk in-plane Kabsch term (_chunk_setup)
        maskw,  # (A, bh, 128) i32 or None
        x0,
        y0,
        bbox,
        phi_c,
        zeta,
        active,
        phi_lows,  # (F,) phi at each frame's start (radians)
        d_osc,  # oscillation width (radians)
        z_values,  # (F,) frame numbers
        frame_ok,  # (F,) bool: frame present (tail padding)
        centre_slices: bool,
    ):
        jnp = self._jnp

        # NOTE: gathering windows ALREADY packed (window_gather_planes_
        # packed) measured SLOWER than this full-lane gather + XLA
        # relayout (3.81 vs 3.54 ms/step on v5e) — the in-kernel 4-way
        # roll/select combine costs more VPU than the 4x-smaller HBM
        # output saves; the _finish_block_step packed wrapper's XLA
        # relayout stays the production route.

        from ..ops.window_gather import window_gather_planes

        windows = window_gather_planes(
            frames,
            y0.astype(jnp.int32),
            x0.astype(jnp.int32),
            bh=self.box_h,
            interpret=self._interpret,
        )  # (A, F, bh, 128) i32
        return self._finish_block_step(
            windows, e12, maskw, x0, y0, bbox, phi_c, zeta, active,
            phi_lows, d_osc, z_values, frame_ok,
            centre_slices=centre_slices,
        )

    def _finish_block_step(
        self, windows, e12, maskw, x0, y0, bbox, phi_c, zeta, active,
        phi_lows, d_osc, z_values, frame_ok, centre_slices,
    ):
        """Everything after the window gather — split out so probe
        harnesses (tools/measure_int_variants.py) can drive the exact
        production math with substitute windows."""
        if self._lane_group == 4:
            return self._finish_block_step_packed(
                windows, e12, maskw, x0, y0, bbox, phi_c, zeta, active,
                phi_lows, d_osc, z_values, frame_ok,
                centre_slices=centre_slices,
            )
        jnp = self._jnp
        A = x0.shape[0]
        bh = self.box_h
        F = windows.shape[1]

        lanes = 128
        px = x0[:, None] + jnp.arange(lanes)[None, :]  # (A, 128)
        py = y0[:, None] + jnp.arange(bh)[None, :]  # (A, bh)
        in_bbox = (
            (px[:, None, :] >= bbox[:, 0, None, None])
            & (px[:, None, :] <= bbox[:, 1, None, None])
            & (py[:, :, None] >= bbox[:, 2, None, None])
            & (py[:, :, None] <= bbox[:, 3, None, None])
        )
        if maskw is not None:
            in_bbox = in_bbox & (maskw != 0)
        # frame-invariant valid-pixel count, hoisted out of the frame loop:
        # bg_count and overflow are derived from it below instead of being
        # re-reduced over the full (A, bh, 128) grid every frame (the two
        # full-grid count reductions cost 1.29 ms of the 8.95 ms A=2048/F=4
        # block step, tools/measure_int_variants.py nocounts probe)
        in_bbox_count = jnp.sum(in_bbox, axis=(1, 2)).astype(jnp.int32)

        # e12 (the chunk's in-plane Kabsch term over the (bh+1, 128) corner
        # grid) arrives precomputed from _chunk_setup — frame-invariant
        # chunk geometry, computed once per chunk instead of per block step.

        def corner_fg(phi_eval):
            if self.algorithm == "dials":
                return e12 <= 1.0
            eps3 = zeta * (phi_eval - phi_c)
            t = (1.0 - eps3 * eps3 / (self._delta_m**2)).astype(jnp.float32)
            return e12 <= t[:, None, None]

        k16 = jnp.arange(16, dtype=jnp.int32)

        # Outputs are FRAME-SUMMED on device: the host accumulators only
        # ever add the per-frame outputs together (integrate() collect_one),
        # and every quantity is an exact integer or exact half-integer in
        # f64 (< 2^53), so summation order cannot change a single bit —
        # returning the sums quarters the device->host transfer and lets
        # the background histogram run as ONE MXU contraction over the
        # whole frame block instead of F separate passes.
        fg_sum_t = jnp.zeros(A, dtype=jnp.float64)
        fg_count_t = jnp.zeros(A, dtype=jnp.int32)
        dot_x_t = jnp.zeros(A, dtype=jnp.float64)
        dot_y_t = jnp.zeros(A, dtype=jnp.float64)
        sum_iz_t = jnp.zeros(A, dtype=jnp.float64)
        valid_count_t = jnp.zeros(A, dtype=jnp.int32)
        bg_slices = []
        for f in range(F):
            phi_low = phi_lows[f]
            phi_high = phi_lows[f] + d_osc
            if self.algorithm == "dials":
                corner_in = corner_fg(phi_low)
            else:
                # the three phi-slice tests fold into ONE grid compare
                # against the per-reflection scalar max threshold:
                # (e12<=t1)|(e12<=t2)|((e12<=t_c)&centre) == e12 <= max(
                # t1, t2, centre ? t_c : -inf), exactly (monotone compare;
                # t_c = 1.0 since eps3(phi_c) = 0) — 3 full-grid compares
                # become 1
                def t_of(phi_eval):
                    eps3 = zeta * (phi_eval - phi_c)
                    return (
                        1.0 - eps3 * eps3 / (self._delta_m**2)
                    ).astype(jnp.float32)

                t = jnp.maximum(t_of(phi_low), t_of(phi_high))
                if centre_slices:
                    centre_ok = (phi_c >= jnp.minimum(phi_low, phi_high)) & (
                        phi_c <= jnp.maximum(phi_low, phi_high)
                    )
                    t = jnp.maximum(
                        t,
                        jnp.where(
                            centre_ok, jnp.float32(1.0), -jnp.inf
                        ).astype(jnp.float32),
                    )
                corner_in = e12 <= t[:, None, None]
            fg4 = (
                corner_in[:, :-1, :]
                | corner_in[:, 1:, :]
            )
            # lane-shifted corner OR: corner c and c+1 for pixel column c
            fg = fg4 | jnp.roll(fg4, -1, axis=2)
            act_f = (
                active
                & frame_ok[f]
                & (bbox[:, 4] <= z_values[f])
                & (bbox[:, 5] > z_values[f])
            )
            valid_px = in_bbox & act_f[:, None, None]
            fg = fg & valid_px
            bg = (~fg) & valid_px

            ivals = jnp.maximum(windows[:, f], 0)
            mi = jnp.where(fg, ivals, 0)
            colsum = jnp.sum(mi, axis=1)
            rowsum = jnp.sum(mi, axis=2)
            fg_sum = jnp.sum(colsum, axis=1).astype(jnp.float64)
            fg_sum_t = fg_sum_t + fg_sum
            fg_count_t = fg_count_t + jnp.sum(fg, axis=(1, 2)).astype(
                jnp.int32
            )
            # the split-i32 weighted dots stay per frame (their < 2^26
            # operand bound is per-frame); their exact f64 results sum
            dot_x_t = dot_x_t + _weighted_index_dot(colsum, lanes)
            dot_y_t = dot_y_t + _weighted_index_dot(rowsum, bh)
            sum_iz_t = sum_iz_t + fg_sum * (z_values[f] + 0.5)
            valid_count_t = valid_count_t + jnp.where(act_f, in_bbox_count, 0)
            bg_slices.append(bg[:, : self._hist_rows, : self._hist_lanes])

        sum_ix = (x0.astype(jnp.float64) + 0.5) * fg_sum_t + dot_x_t
        sum_iy = (y0.astype(jnp.float64) + 0.5) * fg_sum_t + dot_y_t

        # Background histogram: one two-level one-hot MXU contraction over
        # the whole frame block, with operands sliced to the exact occupied
        # window extents (rows 0..heights[a] <= _hist_rows-1, lanes
        # 0..widths[a] <= _hist_lanes-1; everything outside is masked by
        # in_bbox, so the slice is bit-exact).  Counts stay < 2^24, so the
        # f32 MXU accumulation of the 0/1 bf16 products remains exact.
        hr, hl = self._hist_rows, self._hist_lanes
        bg_s = jnp.stack(bg_slices, axis=1)  # (A, F, hr, hl)
        iv_s = jnp.maximum(windows[:, :, :hr, :hl], 0)
        in_range = bg_s & (iv_s < NUM_BG_BINS)
        p_dim = F * hr * hl
        co = (
            in_range[..., None] & ((iv_s >> 4)[..., None] == k16)
        ).reshape(A, p_dim, 16)
        fi = ((iv_s & 15)[..., None] == k16).reshape(A, p_dim, 16)
        hist = (
            jnp.einsum(
                "apc,apf->acf",
                co.astype(jnp.bfloat16),
                fi.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            .reshape(A, NUM_BG_BINS)
            .astype(jnp.int32)
        )
        # derived counts (bit-exact, no extra full-grid reductions):
        # every valid pixel is fg or bg, and every in-range bg pixel
        # lands in exactly one histogram bin, so
        #   bg_count = valid_count - fg_count
        #   overflow = bg_count - sum_bins(hist)
        bg_count = valid_count_t - fg_count_t
        overflow = bg_count - jnp.sum(hist, axis=1)
        return (
            fg_sum_t,
            fg_count_t,
            sum_ix,
            sum_iy,
            sum_iz_t,
            hist,
            overflow,
            bg_count,
        )

    def _finish_block_step_packed(
        self, windows, e12, maskw, x0, y0, bbox, phi_c, zeta, active,
        phi_lows, d_osc, z_values, frame_ok, centre_slices,
    ):
        """Lane-packed :meth:`_finish_block_step`: FOUR reflections share
        each 128-lane vreg row (32 lanes apiece), so every per-frame VPU
        pass (corner compare, fg/bg masking, masked-intensity sums) runs
        on (A/4, bh, 128) grids instead of (A, bh, 128) — the window is
        128 lanes only because the DMA needs 128-lane granularity, while
        valid pixels occupy lanes 0.._hist_lanes-1 (<= 31), so ~5x of the
        full-lane grid is masked padding.

        Bit-exact by construction (guarded by _lane_group, set only when
        _hist_lanes <= 31):
        - every cross-group leak (the corner roll at packed lane 31 mod 32
          reading the next group) lands on pixel lanes > widths[a], which
          in_bbox masks to zero exactly as the full-lane path masks lanes
          32..127;
        - all reduced quantities are integer sums (order-free) or the
          exact split-i32 weighted dots of _weighted_index_dot;
        - the background histogram runs on the UNPACKED (A, F, hr, hl)
          slice with identical operands (packing would inflate its MXU
          contraction 45%: K grows from hl to 32 lanes per reflection).
        """
        A = x0.shape[0]
        bh = self.box_h
        F = windows.shape[1]
        G, GL = 4, 32
        AP = A // G

        # relayouts into packed lane space (probe/back-compat entry: the
        # production _block_step_impl gathers windows ALREADY packed via
        # window_gather_planes_packed and packs e12/maskw once per chunk
        # in _chunk_setup, then calls _finish_packed_core directly)
        wpk = (
            windows[..., :GL]
            .reshape(AP, G, F, bh, GL)
            .transpose(0, 2, 3, 1, 4)
            .reshape(AP, F, bh, G * GL)
        )
        if e12.shape[0] == A:
            e12 = self._pack_rows(e12)
        if maskw is not None and maskw.shape[0] == A:
            maskw = self._pack_rows(maskw)
        return self._finish_packed_core(
            wpk, e12, maskw, x0, y0, bbox, phi_c, zeta, active,
            phi_lows, d_osc, z_values, frame_ok,
            centre_slices=centre_slices,
        )

    def _pack_rows(self, v):
        """(A, rows, 128) -> (A//4, rows, 128) packed lane layout: row i
        lanes 32g..32g+31 = reflection 4i+g's lanes 0..31."""
        G, GL = 4, 32
        ap = v.shape[0] // G
        return (
            v[..., :GL]
            .reshape(ap, G, v.shape[1], GL)
            .transpose(0, 2, 1, 3)
            .reshape(ap, v.shape[1], G * GL)
        )

    def _finish_packed_core(
        self, wpk, e12p, mwp, x0, y0, bbox, phi_c, zeta, active,
        phi_lows, d_osc, z_values, frame_ok, centre_slices,
    ):
        """Packed-layout step body: ``wpk`` (A/4, F, bh, 128) windows,
        ``e12p``/``mwp`` (A/4, rows, 128), per-reflection vectors (A,)."""
        jnp = self._jnp
        A = x0.shape[0]
        bh = self.box_h
        F = wpk.shape[1]
        G, GL = 4, 32
        AP = A // G
        i32 = jnp.int32

        def lanes_of(s):
            # per-reflection scalar -> per-packed-lane value
            return jnp.broadcast_to(
                s.reshape(AP, G, 1), (AP, G, GL)
            ).reshape(AP, G * GL)

        def group_sum(v):
            # (AP, 128) per-lane i32 -> (A,) per-reflection sums
            return v.reshape(AP, G, GL).sum(axis=-1).reshape(A)

        loc = jnp.arange(G * GL, dtype=i32) % GL
        pxp = lanes_of(x0.astype(i32)) + loc[None, :]
        rows = jnp.arange(bh, dtype=i32)
        pyp = lanes_of(y0.astype(i32))[:, None, :] + rows[None, :, None]
        in_bbox = (
            (pxp[:, None, :] >= lanes_of(bbox[:, 0].astype(i32))[:, None, :])
            & (pxp[:, None, :] <= lanes_of(bbox[:, 1].astype(i32))[:, None, :])
            & (pyp >= lanes_of(bbox[:, 2].astype(i32))[:, None, :])
            & (pyp <= lanes_of(bbox[:, 3].astype(i32))[:, None, :])
        )
        if mwp is not None:
            in_bbox = in_bbox & (mwp != 0)
        in_bbox_count = group_sum(jnp.sum(in_bbox, axis=1)).astype(i32)

        k16 = jnp.arange(16, dtype=i32)

        fg_sum_t = jnp.zeros(A, dtype=jnp.float64)
        fg_count_t = jnp.zeros(A, dtype=i32)
        dot_x_t = jnp.zeros(A, dtype=jnp.float64)
        dot_y_t = jnp.zeros(A, dtype=jnp.float64)
        sum_iz_t = jnp.zeros(A, dtype=jnp.float64)
        valid_count_t = jnp.zeros(A, dtype=i32)
        bg_slices = []
        for f in range(F):
            phi_low = phi_lows[f]
            phi_high = phi_lows[f] + d_osc
            if self.algorithm == "dials":
                corner_in = e12p <= 1.0
            else:
                # scalar-max-threshold fold, identical to the full-lane path
                def t_of(phi_eval):
                    eps3 = zeta * (phi_eval - phi_c)
                    return (
                        1.0 - eps3 * eps3 / (self._delta_m**2)
                    ).astype(jnp.float32)

                t = jnp.maximum(t_of(phi_low), t_of(phi_high))
                if centre_slices:
                    centre_ok = (phi_c >= jnp.minimum(phi_low, phi_high)) & (
                        phi_c <= jnp.maximum(phi_low, phi_high)
                    )
                    t = jnp.maximum(
                        t,
                        jnp.where(
                            centre_ok, jnp.float32(1.0), -jnp.inf
                        ).astype(jnp.float32),
                    )
                corner_in = e12p <= lanes_of(t)[:, None, :]
            fg4 = corner_in[:, :-1, :] | corner_in[:, 1:, :]
            # the lane roll crosses a group boundary only at packed lane
            # 31 (mod 32) — a pixel lane > widths[a], masked by in_bbox
            fg = fg4 | jnp.roll(fg4, -1, axis=2)
            act_f = (
                active
                & frame_ok[f]
                & (bbox[:, 4] <= z_values[f])
                & (bbox[:, 5] > z_values[f])
            )
            valid_px = in_bbox & lanes_of(act_f)[:, None, :]
            fg = fg & valid_px
            bg = (~fg) & valid_px

            ivals = jnp.maximum(wpk[:, f], 0)
            mi = jnp.where(fg, ivals, 0)
            colsum = jnp.sum(mi, axis=1)  # (AP, 128)
            col32 = colsum.reshape(A, GL)  # per-reflection 32-lane sums
            rowsum = (
                mi.reshape(AP, bh, G, GL)
                .sum(axis=-1)
                .transpose(0, 2, 1)
                .reshape(A, bh)
            )
            fg_sum = jnp.sum(col32, axis=1).astype(jnp.float64)
            fg_sum_t = fg_sum_t + fg_sum
            fg_count_t = fg_count_t + group_sum(jnp.sum(fg, axis=1)).astype(
                i32
            )
            dot_x_t = dot_x_t + _weighted_index_dot(col32, GL)
            dot_y_t = dot_y_t + _weighted_index_dot(rowsum, bh)
            sum_iz_t = sum_iz_t + fg_sum * (z_values[f] + 0.5)
            valid_count_t = valid_count_t + jnp.where(act_f, in_bbox_count, 0)
            bg_slices.append(bg[:, : self._hist_rows, :])

        sum_ix = (x0.astype(jnp.float64) + 0.5) * fg_sum_t + dot_x_t
        sum_iy = (y0.astype(jnp.float64) + 0.5) * fg_sum_t + dot_y_t

        # histogram on the UNPACKED slice — operands identical to the
        # full-lane path (hl <= 31 < GL, so each group's first hl lanes
        # are exactly the reflection's histogram window)
        hr, hl = self._hist_rows, self._hist_lanes

        def unpack(v):
            return (
                v.reshape(AP, F, hr, G, GL)
                .transpose(0, 3, 1, 2, 4)
                .reshape(A, F, hr, GL)[..., :hl]
            )

        bg_s = unpack(jnp.stack(bg_slices, axis=1))  # (A, F, hr, hl)
        iv_s = jnp.maximum(unpack(wpk[:, :, :hr, :]), 0)
        in_range = bg_s & (iv_s < NUM_BG_BINS)
        p_dim = F * hr * hl
        co = (
            in_range[..., None] & ((iv_s >> 4)[..., None] == k16)
        ).reshape(A, p_dim, 16)
        fi = ((iv_s & 15)[..., None] == k16).reshape(A, p_dim, 16)
        hist = (
            jnp.einsum(
                "apc,apf->acf",
                co.astype(jnp.bfloat16),
                fi.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            .reshape(A, NUM_BG_BINS)
            .astype(i32)
        )
        bg_count = valid_count_t - fg_count_t
        overflow = bg_count - jnp.sum(hist, axis=1)
        return (
            fg_sum_t,
            fg_count_t,
            sum_ix,
            sum_iy,
            sum_iz_t,
            hist,
            overflow,
            bg_count,
        )

    # --- host driver ---------------------------------------------------------

    def integrate(
        self, reader, image_numbers, acc: Accumulators, depth: int = 3
    ) -> None:
        """Stream frames through the blocked classification step.

        TPU-first streaming join (replaces the reference's per-(refl,
        image) GPU blocks, kabsch.cu:455-675): reflections are statically
        chunked in z order; frames stream through device-resident blocks
        of ``frame_block``; each (chunk, frame-block) pair runs one jitted
        step whose shoebox windows arrive via one multi-plane DMA per
        reflection covering all frames of the block, and whose corner
        geometry is cached per chunk for its whole z-span.  Dispatches up
        to ``depth`` steps ahead so host decode and accumulation overlap
        the device (reference overlap: integrator.cc frame loop + CUDA
        streams).
        """
        from collections import deque

        import jax
        import jax.numpy as jnp

        osc_start, osc_width = self.scan.oscillation
        z0 = self.scan.image_range[0]
        cs_e1 = np.cross(self.s1, np.asarray(self._s0))
        cs_e1 /= np.linalg.norm(cs_e1, axis=1, keepdims=True)
        cs_e2 = np.cross(self.s1, cs_e1)
        cs_e2 /= np.linalg.norm(cs_e2, axis=1, keepdims=True)
        zeta = cs_e1 @ np.asarray(self._m2)

        # static z-ordered chunks
        order = np.argsort(self.bboxes[:, 4], kind="stable")
        chunks = [
            order[i : i + self.max_active]
            for i in range(0, len(order), self.max_active)
        ]
        # NOTE: no initial= here — min(initial=0) folds 0 into the
        # reduction, pinning every chunk's zmin to 0 so the touching
        # filter never excludes future chunks (every chunk then runs a
        # full block step on every frame block and caches its ~200 MB
        # window buffers from block 0; review r3).  Chunks are never
        # empty (they partition a non-empty argsort).
        chunk_zmin = np.array([self.bboxes[c, 4].min() for c in chunks])
        chunk_zmax = np.array([self.bboxes[c, 5].max() for c in chunks])
        cache: dict[int, dict] = {}

        if not hasattr(self, "_block_jit"):
            self._block_jit = jax.jit(
                self._block_step_impl, static_argnames=("centre_slices",)
            )

        det_mask = reader.get_mask()
        if det_mask is not None and getattr(self, "_mask_canvas", None) is None:
            self.set_mask(np.asarray(det_mask))

        image_numbers = list(image_numbers)
        F = getattr(self, "frame_block", 4)
        d_osc = float(np.deg2rad(osc_width))

        inflight: deque = deque()

        def collect_one():
            chunk, a, out = inflight.popleft()
            arrs = [np.asarray(v) for v in out]  # frame-summed on device
            acc.fg_sum[chunk] += arrs[0][:a]
            acc.fg_count[chunk] += arrs[1][:a]
            acc.sum_ix[chunk] += arrs[2][:a]
            acc.sum_iy[chunk] += arrs[3][:a]
            acc.sum_iz[chunk] += arrs[4][:a]
            acc.bg_hist[chunk] += arrs[5][:a]
            acc.bg_overflow[chunk] += arrs[6][:a]
            acc.bg_count[chunk] += arrs[7][:a]

        for b0 in range(0, len(image_numbers), F):
            blk = image_numbers[b0 : b0 + F]
            n_blk = len(blk)
            z_lo, z_hi = min(blk), max(blk)
            touching = [
                ci
                for ci in range(len(chunks))
                if chunk_zmin[ci] <= z_hi and chunk_zmax[ci] > z_lo
            ]
            if not touching:
                continue
            frames_np = np.stack(
                [np.asarray(reader.get_image(n)) for n in blk]
                + [np.zeros(self.panel.image_size[::-1], np.uint16)]
                * (F - n_blk)
            )
            if frames_np.dtype.itemsize > 2:
                # The device step's exact-integer accumulation contracts
                # (i32 fg_sum total: n_bbox_px * val < 2^31; the 13-bit
                # split _weighted_index_dot: val < 2^26) hold for any
                # 16-bit data but not arbitrary 32-bit values — and the
                # .astype(int32) below would wrap u32 >= 2^31 negative.
                # Fail loudly instead of silently corrupting intensities
                # (convention: the 128-lane width and i32 sort-key
                # guards).
                vmax = int(frames_np.max())
                limit = min(
                    2**26 - 1,
                    (2**31 - 1) // (self._hist_rows * self._hist_lanes),
                )
                if vmax > limit:
                    raise ValueError(
                        f"frame block {blk[0]}..{blk[-1]} has pixel value"
                        f" {vmax} > {limit}, beyond the integrator's"
                        " exact-i32 accumulation bound for"
                        f" {self._hist_rows}x{self._hist_lanes} shoeboxes;"
                        " mask or clip saturated pixels upstream"
                    )
            frames = jnp.asarray(self.pad_frames(frames_np)).astype(jnp.int32)
            # z/phi from the ACTUAL image numbers — image_numbers is an
            # arbitrary iterable, so gapped or reordered entries must
            # classify against their own rotation angles, not blk[0]+i
            # (review r3).  Pad entries get z past the block (masked by
            # frame_ok, and never aliasing a real frame's z).
            blk_pad = np.asarray(
                list(blk) + [z_hi + 1 + i for i in range(F - n_blk)],
                dtype=np.float64,
            )
            phi_lows = jnp.asarray(
                np.deg2rad(osc_start + (blk_pad - (z0 - 1)) * osc_width)
            )
            z_values = jnp.asarray(blk_pad)
            frame_ok = jnp.asarray(np.arange(F) < n_blk)

            for ci in touching:
                if ci not in cache:
                    cache[ci] = self._chunk_setup(chunks[ci], cs_e1, cs_e2, zeta)
                dev = cache[ci]
                out = self._block_jit(
                    frames,
                    dev["e12"],
                    dev["maskw"],
                    dev["x0"],
                    dev["y0"],
                    dev["bbox"],
                    dev["phi"],
                    dev["zeta"],
                    dev["active"],
                    phi_lows,
                    d_osc,
                    z_values,
                    frame_ok,
                    centre_slices=True,
                )
                inflight.append((chunks[ci], len(chunks[ci]), out))
                while len(inflight) > depth:
                    collect_one()
            # evict chunks whose z-span has passed
            for ci in list(cache):
                if chunk_zmax[ci] <= z_hi + 1:
                    del cache[ci]

        while inflight:
            collect_one()
