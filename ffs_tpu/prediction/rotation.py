"""Rotation-series spot prediction.

Equivalent of the reference predictor library (reference:
src/predictor/predict.cc:31-211 with the scan-varying ray predictor
ray_predictors.cc:115-201, and the Reeke loop-limit generator
include/predictor/index_generators.hpp:27-388).

TPU-first reformulation: instead of the reference's resumable per-hkl Reeke
state machine + thread pool over images (SURVEY.md P5), the full
resolution-limited hkl grid is generated once (conservative bounds
|h| <= |a|/dmin etc.) and the closed-form Ewald-crossing test for each
(hkl, image) pair is evaluated as one batched jit over hkl chunks — the
branchy early-exits become masks.  Identical mathematics, identical rays.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..models.reflection_table import PREDICTED


@dataclass
class ScanVaryingData:
    """Per-scan-point model states parsed from the expt JSON
    (reference: predict.cc:213-275)."""

    s0_at_scan_points: np.ndarray | None = None  # (n_img+1, 3)
    a_at_scan_points: np.ndarray | None = None  # (n_img+1, 3, 3)
    setting_at_scan_points: np.ndarray | None = None  # (n_img+1, 3, 3)

    def __bool__(self):
        return any(
            v is not None
            for v in (
                self.s0_at_scan_points,
                self.a_at_scan_points,
                self.setting_at_scan_points,
            )
        )


def hkl_grid(
    a_matrix: np.ndarray, dmin: float, group_ops=None
) -> np.ndarray:
    """All hkl with |h| <= |a|/dmin etc. (excluding 000), conservative
    per-axis loop bounds from the direct cell lengths.

    ``group_ops`` (models/symmetry.GroupOps) drops systematically-absent
    indices — the reference builds its generators with the crystal's
    space-group operations and filters inside the enumeration
    (predict.cc:156-157, index_generators.hpp:83,462)."""
    direct = np.linalg.inv(a_matrix)  # rows = real-space vectors
    lengths = np.linalg.norm(direct, axis=1)
    hmax = np.ceil(lengths / dmin).astype(int)
    hs = np.arange(-hmax[0], hmax[0] + 1)
    ks = np.arange(-hmax[1], hmax[1] + 1)
    ls = np.arange(-hmax[2], hmax[2] + 1)
    grid = np.stack(np.meshgrid(hs, ks, ls, indexing="ij"), axis=-1).reshape(-1, 3)
    grid = grid[~(grid == 0).all(axis=1)]
    if group_ops is not None:
        grid = grid[~group_ops.is_systematically_absent(grid)]
    return grid


def _rays_for_image(xp, hkl, a1, a2, s0_1, s0_2, dmin, phi_beg, d_osc):
    """Vectorised port of predict_ray_monochromatic_sv
    (ray_predictors.cc:115-201).  Returns (valid, s1, angle, entering)."""
    h = hkl.astype(a1.dtype)
    r1 = h @ a1.T
    r2 = h @ a2.T
    dr = r2 - r1
    s0pr1 = s0_1 + r1
    s0pr2 = s0_2 + r2

    r1_from_es = xp.linalg.norm(s0pr1, axis=1) - xp.linalg.norm(s0_1)
    r2_from_es = xp.linalg.norm(s0pr2, axis=1) - xp.linalg.norm(s0_2)
    starts_outside = r1_from_es >= 0.0
    ends_outside = r2_from_es >= 0.0
    ok = (starts_outside != ends_outside) & (
        xp.sum(r1 * r1, axis=1) <= 1.0 / (dmin * dmin)
    )

    a = xp.sum(dr * dr, axis=1)
    a_safe = xp.where(a == 0, 1.0, a)

    def root_in_01(b, c):
        d = b * b - a_safe * c
        ok_d = d >= 0
        sq = xp.sqrt(xp.maximum(d, 0.0))
        lo = (-b - sq) / a_safe
        hi = (-b + sq) / a_safe
        lo_ok = (lo >= 0.0) & (lo <= 1.0)
        hi_ok = (hi >= 0.0) & (hi <= 1.0)
        alpha = xp.where(lo_ok, lo, xp.where(hi_ok, hi, xp.nan))
        return ok_d & (lo_ok | hi_ok), alpha

    ok1, alpha1 = root_in_01(
        xp.sum(s0pr1 * dr, axis=1),
        xp.sum(r1 * r1, axis=1) + 2 * (r1 @ s0_1),
    )
    ok2, alpha2 = root_in_01(
        -xp.sum(s0pr2 * dr, axis=1),
        xp.sum(r2 * r2, axis=1) + 2 * (r2 @ s0_2),
    )
    ok = ok & ok1 & ok2 & (a > 0)

    denom = alpha1 + alpha2
    alpha = xp.where(ok, alpha1, 0.5) / xp.where(ok, denom, 1.0)
    us0_1 = s0_1 / xp.linalg.norm(s0_1)
    us0_2 = s0_2 / xp.linalg.norm(s0_2)
    us0 = alpha[:, None] * (us0_2 - us0_1) + us0_1
    wavenumber = (xp.linalg.norm(s0_1) + xp.linalg.norm(s0_2)) * 0.5
    s1 = r1 + alpha[:, None] * dr + wavenumber * us0
    angle = phi_beg + alpha * d_osc
    return ok, s1, angle, starts_outside


@dataclass
class PredictedReflections:
    hkl: np.ndarray
    s1: np.ndarray
    xyzcal_px: np.ndarray
    xyzcal_mm: np.ndarray
    panel: np.ndarray
    entering: np.ndarray
    flags: np.ndarray = field(default_factory=lambda: np.zeros(0, dtype=np.uint64))


def predict_rotation(
    experiment,
    sv_data: ScanVaryingData | None = None,
    dmin: float | None = None,
    use_device: bool = True,
    chunk: int = 1 << 17,
) -> PredictedReflections:
    """Predict all reflections over the scan (reference: predict.cc:130-211)."""
    sv = sv_data or ScanVaryingData()
    scan = experiment.scan
    beam = experiment.beam
    gonio = experiment.goniometer
    panel = experiment.panel
    crystal = experiment.crystal

    if dmin is None:
        # detector-corner resolution limit
        w, h = panel.image_size
        corners_px = np.array([[0, 0], [w, 0], [0, h], [w, h]], dtype=float)
        xmm, ymm = panel.px_to_mm(corners_px[:, 0], corners_px[:, 1])
        lab = panel.get_lab_coord(xmm, ymm)
        s1_dir = lab / np.linalg.norm(lab, axis=1, keepdims=True)
        s0 = beam.s0
        # d = 1/|rlp| at the corners, rlp = s1 - s0 (s0 already points
        # source -> sample with |s0| = 1/lambda)
        d = 1.0 / np.linalg.norm(s1_dir / beam.wavelength - s0, axis=1)
        dmin = float(d.min())

    m2 = gonio.rotation_axis / np.linalg.norm(gonio.rotation_axis)
    r_fixed = gonio.fixed_rotation
    r_setting = gonio.setting_rotation
    osc0, d_osc = scan.oscillation
    z0 = scan.image_range[0] - 1
    n_images = scan.image_range[1] - scan.image_range[0] + 1
    A = crystal.a_matrix
    s0 = beam.s0

    from ..models.symmetry import group_ops_from_symbol

    hkl = hkl_grid(
        A, dmin, group_ops=group_ops_from_symbol(crystal.space_group)
    )

    if use_device:
        return _predict_rotation_device(
            experiment, sv, hkl, dmin, d_osc, osc0, z0, n_images,
            hkl_chunk=chunk,
        )

    rays_host = lambda hkl, a1, a2, s0_1, s0_2, phi_beg: _rays_for_image(
        np, hkl, a1, a2, s0_1, s0_2, dmin, phi_beg, d_osc
    )

    def rot(angle_deg):
        t = np.deg2rad(angle_deg)
        c, s = np.cos(t), np.sin(t)
        x, y, z = m2
        K = np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]])
        return c * np.eye(3) + s * K + (1 - c) * np.outer(m2, m2)

    out_hkl, out_s1, out_px, out_mm, out_panel, out_entering = (
        [], [], [], [], [], [],
    )

    # chunk the hkl grid to bound the per-call working set (the device
    # path jits over these same static chunk shapes)
    n_pad = ((len(hkl) + chunk - 1) // chunk) * chunk
    hkl_p = np.zeros((n_pad, 3), dtype=np.int64)
    hkl_p[: len(hkl)] = hkl

    for image_index in range(n_images):
        s0_1 = s0 if sv.s0_at_scan_points is None else sv.s0_at_scan_points[image_index]
        s0_2 = (
            s0 if sv.s0_at_scan_points is None else sv.s0_at_scan_points[image_index + 1]
        )
        A1 = A if sv.a_at_scan_points is None else sv.a_at_scan_points[image_index]
        A2 = A if sv.a_at_scan_points is None else sv.a_at_scan_points[image_index + 1]
        rs1 = (
            r_setting
            if sv.setting_at_scan_points is None
            else sv.setting_at_scan_points[image_index]
        )
        rs2 = (
            r_setting
            if sv.setting_at_scan_points is None
            else sv.setting_at_scan_points[image_index + 1]
        )
        phi_beg = osc0 + image_index * d_osc
        phi_end = phi_beg + d_osc
        A1_full = rs1 @ rot(phi_beg) @ r_fixed @ A1
        A2_full = rs2 @ rot(phi_end) @ r_fixed @ A2

        for c0 in range(0, n_pad, chunk):
            hc = hkl_p[c0 : c0 + chunk]
            ok, s1, angle, entering = (
                np.asarray(v)
                for v in rays_host(
                    np.asarray(hc, dtype=np.float64),
                    np.asarray(A1_full),
                    np.asarray(A2_full),
                    np.asarray(s0_1, dtype=np.float64),
                    np.asarray(s0_2, dtype=np.float64),
                    phi_beg,
                )
            )
            ok = ok & ~(hc == 0).all(axis=1)
            idx = np.nonzero(ok)[0]
            if not len(idx):
                continue
            s1_sel = s1[idx]
            xmm, ymm = panel.get_ray_intersection(s1_sel)
            x_px, y_px = panel.mm_to_px(xmm, ymm)
            w, hh = panel.image_size
            # on-panel bounds in MM, matching the device path and dx2
            # (parallax-corrected px can land fractionally outside
            # [0, size_px) for a ray inside the physical panel)
            wmm = w * panel.pixel_size[0]
            hmm = hh * panel.pixel_size[1]
            on_panel = (xmm >= 0) & (xmm < wmm) & (ymm >= 0) & (ymm < hmm)
            idx = idx[on_panel]
            if not len(idx):
                continue
            frame = z0 + (angle[idx] - osc0) / d_osc
            out_hkl.append(hc[idx])
            out_s1.append(s1[idx])
            out_px.append(
                np.stack([x_px[on_panel], y_px[on_panel], frame], axis=1)
            )
            out_mm.append(
                np.stack(
                    [xmm[on_panel], ymm[on_panel], np.deg2rad(angle[idx])], axis=1
                )
            )
            out_panel.append(np.zeros(len(idx), dtype=np.uint64))
            out_entering.append(entering[idx])

    if not out_hkl:
        empty3 = np.zeros((0, 3))
        return PredictedReflections(
            hkl=np.zeros((0, 3), np.int64),
            s1=empty3,
            xyzcal_px=empty3,
            xyzcal_mm=empty3,
            panel=np.zeros(0, np.uint64),
            entering=np.zeros(0, bool),
            flags=np.zeros(0, np.uint64),
        )
    hkl_all = np.concatenate(out_hkl)
    return PredictedReflections(
        hkl=hkl_all,
        s1=np.concatenate(out_s1),
        xyzcal_px=np.concatenate(out_px),
        xyzcal_mm=np.concatenate(out_mm),
        panel=np.concatenate(out_panel),
        entering=np.concatenate(out_entering),
        flags=np.full(len(hkl_all), PREDICTED, dtype=np.uint64),
    )


def _compact_i32(mask, cap):
    """i32 fixed-capacity compaction of True positions (ascending).

    Replaces ``jnp.nonzero(size=cap)``: under x64 that scans INT64 index
    pairs, which the v5e emulates as u32-pair reduce-windows with a fixed
    19M scoped-VMEM stack buffer — over the 16M limit, so the whole
    program fails AOT compilation regardless of chunk size.  An explicit
    i32 cumsum + drop-scatter lowers cleanly.
    Returns (idx (cap,) i32 ascending, valid (cap,) bool)."""
    import jax.numpy as jnp

    total = mask.shape[0]
    c = jnp.cumsum(mask.astype(jnp.int32))
    # slot i holds the position of the (i+1)-th True: a cap x log(total)
    # binary-search gather — a full-length scatter here measured ~0.5 s
    # per block on v5e (TPU scatters serialise; the searchsorted form is
    # the same pattern the spotfind compaction uses)
    want = jnp.arange(1, cap + 1, dtype=jnp.int32)
    idx = jnp.searchsorted(c, want, side="left").astype(jnp.int32)
    valid = want <= c[-1]
    return jnp.where(valid, idx, total), valid


def _rays_rowwise(h, a1, a2, s0_1, s0_2, dmin_, phi_beg, d_osc_):
    """_rays_for_image with PER-ROW matrices/beams (cap, 3, 3) — the
    pass-2 exact f64 form over compacted candidates."""
    import jax.numpy as jnp

    r1 = jnp.einsum("ck,cjk->cj", h, a1)
    r2 = jnp.einsum("ck,cjk->cj", h, a2)
    dr = r2 - r1
    s0pr1 = s0_1 + r1
    s0pr2 = s0_2 + r2
    n01 = jnp.linalg.norm(s0_1, axis=1)
    n02 = jnp.linalg.norm(s0_2, axis=1)
    r1_from_es = jnp.linalg.norm(s0pr1, axis=1) - n01
    r2_from_es = jnp.linalg.norm(s0pr2, axis=1) - n02
    starts_outside = r1_from_es >= 0.0
    ends_outside = r2_from_es >= 0.0
    ok = (starts_outside != ends_outside) & (
        jnp.sum(r1 * r1, axis=1) <= 1.0 / (dmin_ * dmin_)
    )
    a = jnp.sum(dr * dr, axis=1)
    a_safe = jnp.where(a == 0, 1.0, a)

    def root_in_01(b, c):
        d = b * b - a_safe * c
        ok_d = d >= 0
        sq = jnp.sqrt(jnp.maximum(d, 0.0))
        lo = (-b - sq) / a_safe
        hi = (-b + sq) / a_safe
        lo_ok = (lo >= 0.0) & (lo <= 1.0)
        hi_ok = (hi >= 0.0) & (hi <= 1.0)
        alpha = jnp.where(lo_ok, lo, jnp.where(hi_ok, hi, jnp.nan))
        return ok_d & (lo_ok | hi_ok), alpha

    ok1, alpha1 = root_in_01(
        jnp.sum(s0pr1 * dr, axis=1),
        jnp.sum(r1 * r1, axis=1) + 2 * jnp.sum(r1 * s0_1, axis=1),
    )
    ok2_, alpha2 = root_in_01(
        -jnp.sum(s0pr2 * dr, axis=1),
        jnp.sum(r2 * r2, axis=1) + 2 * jnp.sum(r2 * s0_2, axis=1),
    )
    ok = ok & ok1 & ok2_ & (a > 0)
    denom = alpha1 + alpha2
    alpha = jnp.where(ok, alpha1, 0.5) / jnp.where(ok, denom, 1.0)
    us0_1 = s0_1 / n01[:, None]
    us0_2 = s0_2 / n02[:, None]
    us0 = alpha[:, None] * (us0_2 - us0_1) + us0_1
    wavenumber = (n01 + n02) * 0.5
    s1 = r1 + alpha[:, None] * dr + wavenumber[:, None] * us0
    angle = phi_beg + alpha * d_osc_
    return ok, s1, angle, starts_outside


_pblock_cache: dict = {}


def _default_chunk_cap(cap: int) -> int:
    return min(cap, max(4096, cap // 8))


def _get_pblock_fn(
    cap: int, ch: int, dmin: float, d_osc: float, chunk_cap: int | None = None
):
    """Module-cached jitted two-pass ray-search block.

    Cached at module level with the hkl tables as ARGUMENTS: the first
    implementation closed over them inside a per-call ``make_block_fn``,
    which (a) baked 20+ MB of constants into every program and (b) made
    each predict_rotation call a fresh jit object — a full recompile
    (~30 s on the tunnelled compile service) per CALL.

    Two-pass TPU ray search: f64 is SOFTWARE-EMULATED on the v5e (~30 s
    per 8-image block at a 600k-hkl grid — hours for a 3600-image
    collection), so the full-grid scan cannot run in double.  Pass 1
    scans every (image, hkl) pair in f32 with a WIDENED acceptance band:
    the Ewald entering/exiting sign test on the cancellation-free
    quadratic form q = 2 s0.r + |r|^2 (same sign as |s0+r| - |s0|),
    accepting sign flips OR |q| <= band.  The r = h A^T products use
    Precision.HIGHEST (the default bf16 MXU passes carry ~1e-3 error —
    measured to LOSE rays against a 1e-4 band on real v5e) and the dots
    are elementwise VPU reductions, so pass-1 error is ~1e-6; band=1e-3
    keeps three orders of margin, so the candidate set contains every
    f64-accepted ray.  Pass 2 re-evaluates ONLY the compacted candidates
    (cap rows, not ch x img_block) with the exact f64 predicate + ray
    math — membership and outputs are bitwise those of the pure-f64 path
    at ~f32 full-grid cost.
    """
    if chunk_cap is None:
        chunk_cap = _default_chunk_cap(cap)
    key = (cap, ch, dmin, d_osc, chunk_cap)
    if key in _pblock_cache:
        return _pblock_cache[key]
    if len(_pblock_cache) > 8:
        # Bounded like _hkl_dev_cache: keys carry computed dmin floats and
        # retry-doubled caps, so a long-running service would otherwise
        # accumulate jit closures + XLA executables indefinitely.
        _pblock_cache.clear()

    import jax
    import jax.numpy as jnp

    @jax.jit
    def block(packed, hkl_chunks, hkl_flat64):
        # ONE h2d per block: columns [a1(9) | a2(9) | s01(3) | s02(3) |
        # phi | live] — six separate uploads measured 185 ms/block of
        # pure per-transfer latency on the tunnel (and one PJRT call
        # beats six anywhere)
        B = packed.shape[0]
        a1b = packed[:, 0:9].reshape(B, 3, 3)
        a2b = packed[:, 9:18].reshape(B, 3, 3)
        s01b = packed[:, 18:21]
        s02b = packed[:, 21:24]
        phib = packed[:, 24]
        liveb = packed[:, 25] > 0.5
        n_chunks = hkl_chunks.shape[0]
        a1s, a2s = a1b.astype(jnp.float32), a2b.astype(jnp.float32)
        s01s, s02s = s01b.astype(jnp.float32), s02b.astype(jnp.float32)
        band = jnp.float32(1e-3)
        res_lim = jnp.float32(1.0 / (dmin * dmin) * (1.0 + 1e-5))

        # Per-chunk compaction capacity: the searchsorted compaction's
        # cost is ~queries x 22 dependent gathers, so compacting every
        # chunk at the full block cap measured 32 of the 48 ms block —
        # while real per-chunk candidate counts are ~1-2k.  A tight
        # chunk cap with its own overflow retry (max per-chunk count is
        # returned) keeps the queries proportional to the candidates.

        def per_chunk(hc):
            # hc is (3, ch): the chunk axis rides the 128 lanes (the
            # (ch, 3) layout runs elementwise ops at 3/128 occupancy)
            def one(a1, a2, s01_, s02_):
                r1 = jnp.dot(a1, hc, precision=jax.lax.Precision.HIGHEST)
                r2 = jnp.dot(a2, hc, precision=jax.lax.Precision.HIGHEST)
                q1 = jnp.sum(r1 * (2.0 * s01_[:, None] + r1), axis=0)
                q2 = jnp.sum(r2 * (2.0 * s02_[:, None] + r2), axis=0)
                flip = (q1 >= 0.0) != (q2 >= 0.0)
                near = (jnp.abs(q1) <= band) | (jnp.abs(q2) <= band)
                res = jnp.sum(r1 * r1, axis=0) <= res_lim
                nz = jnp.sum(jnp.abs(hc), axis=0) > 0  # padded rows
                return (flip | near) & res & nz

            okw = jax.vmap(one)(a1s, a2s, s01s, s02s) & liveb[:, None]
            okf = okw.reshape(-1)
            total = okf.shape[0]
            cnt = jnp.sum(okf.astype(jnp.int32))
            idx, cvalid = _compact_i32(okf, chunk_cap)
            idxc = jnp.minimum(idx, total - 1)
            return (
                (idxc // ch).astype(jnp.int32),  # image within block
                (idxc % ch).astype(jnp.int32),  # hkl within chunk
                cvalid,
                cnt,
            )

        c_img, c_hkl, c_valid, c_cnt = jax.lax.map(per_chunk, hkl_chunks)
        # merge per-chunk candidates into one cap-sized block set
        chunk_ids = jnp.repeat(
            jnp.arange(n_chunks, dtype=jnp.int32), chunk_cap
        )
        vflat = c_valid.reshape(-1)
        sel, valid = _compact_i32(vflat, cap)
        selc = jnp.minimum(sel, vflat.shape[0] - 1)
        img_i = c_img.reshape(-1)[selc]
        hkl_i = chunk_ids[selc] * ch + c_hkl.reshape(-1)[selc]

        # pass 2: exact f64 ray prediction on the candidate rows only
        h_sel = hkl_flat64[hkl_i]  # (cap, 3)
        ok2, s1, ang, ent = _rays_rowwise(
            h_sel, a1b[img_i], a2b[img_i], s01b[img_i], s02b[img_i],
            dmin, phib[img_i], d_osc,
        )
        valid = valid & ok2
        # TWO d2h arrays + a scalar (seven separate transfers measured
        # 315 ms/block of latency on the tunnel)
        meta = jnp.stack(
            [
                img_i,
                hkl_i,
                ent.astype(jnp.int32),
                valid.astype(jnp.int32),
            ],
            axis=1,
        )
        vals = jnp.concatenate([s1, ang[:, None]], axis=1)
        # wide-candidate totals: [sum over chunks, max single chunk] —
        # both >= their exact survivor counterparts, so the overflow
        # retry (global cap / per-chunk cap) stays conservative
        return meta, vals, jnp.stack([jnp.sum(c_cnt), jnp.max(c_cnt)])

    _pblock_cache[key] = block
    return block


_hkl_dev_cache: dict = {}


def _device_hkl_tables(hkl_pad: np.ndarray, n_chunks: int, ch: int):
    """Device-resident hkl tables, cached by content hash: the grid is
    identical across predict_rotation calls for the same experiment, and
    re-uploading the ~20 MB tables cost 11 s per call on the tunnel."""
    import hashlib

    import jax
    import jax.numpy as jnp

    key = (n_chunks, ch, hashlib.md5(hkl_pad.tobytes()).hexdigest())
    if key not in _hkl_dev_cache:
        if len(_hkl_dev_cache) > 4:  # a few grids at most live at once
            _hkl_dev_cache.clear()
        # pass-1 chunks are LANE-MAJOR (n_chunks, 3, ch): see per_chunk
        _hkl_dev_cache[key] = (
            jax.device_put(
                jnp.asarray(
                    np.ascontiguousarray(
                        hkl_pad.reshape(n_chunks, ch, 3).transpose(0, 2, 1)
                    ),
                    dtype=jnp.float32,
                )
            ),
            jax.device_put(jnp.asarray(hkl_pad, dtype=jnp.float64)),
        )
    return _hkl_dev_cache[key]


def _predict_rotation_device(
    experiment,
    sv: ScanVaryingData,
    hkl: np.ndarray,
    dmin: float,
    d_osc: float,
    osc0: float,
    z0: int,
    n_images: int,
    img_block: int = 32,
    # Wide-candidate capacity per image: pass-2 f64 work, the merge
    # compaction queries and the per-block D2H all scale with it, and the
    # doubling retry makes a tight default safe (thaumatin-scale wide
    # counts are ~145/image; 256 leaves 1.8x margin and measured the
    # chained block 22.9 -> 15.1 ms vs 1024)
    cap_per_image: int = 256,
    hkl_chunk: int = 1 << 17,
) -> PredictedReflections:
    """Device path: ONE dispatch per image block, not per (image, chunk).

    The hkl grid is ray-tested for ``img_block`` images in a single jitted
    program (vmap over the image axis), and the surviving (image, hkl)
    pairs are compacted ON DEVICE via a fixed-capacity ``jnp.nonzero``
    before the single per-block host transfer — at 3600 images this is
    ~450 dispatches instead of ~10^4 (r1 review weak #8).  Capacity
    overflow is detected from the exact survivor count and the block is
    re-run at doubled capacity.

    Inside each block the hkl axis runs through a sequential
    ``lax.map`` over ``hkl_chunk``-sized slices with per-chunk
    compaction: a real beamline geometry (e.g. the thaumatin golden,
    2.5M hkls at dmin 1.17 A) would otherwise materialise
    img_block x n_hkl f64 intermediates — gigabytes — where the chunked
    form peaks at ~hkl_chunk x img_block (zero-padded hkl rows are
    rejected by the Ewald entering/exiting test, so no extra mask is
    threaded through).
    """
    import jax
    import jax.numpy as jnp

    panel = experiment.panel
    gonio = experiment.goniometer
    beam = experiment.beam
    crystal = experiment.crystal
    m2 = gonio.rotation_axis / np.linalg.norm(gonio.rotation_axis)
    r_fixed = gonio.fixed_rotation
    r_setting = gonio.setting_rotation
    A = crystal.a_matrix
    s0 = beam.s0

    def rot(angle_deg):
        t = np.deg2rad(angle_deg)
        c, s = np.cos(t), np.sin(t)
        x, y, z = m2
        K = np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]])
        return c * np.eye(3) + s * K + (1 - c) * np.outer(m2, m2)

    # host-side per-image model states (cheap 3x3 algebra)
    nblk = (n_images + img_block - 1) // img_block
    n_pad_img = nblk * img_block
    A1f = np.tile(np.eye(3), (n_pad_img, 1, 1))
    A2f = np.tile(np.eye(3), (n_pad_img, 1, 1))
    s01 = np.tile(s0, (n_pad_img, 1))
    s02 = np.tile(s0, (n_pad_img, 1))
    phis = np.zeros(n_pad_img)
    live = np.zeros(n_pad_img, dtype=bool)
    for i in range(n_images):
        s01[i] = s0 if sv.s0_at_scan_points is None else sv.s0_at_scan_points[i]
        s02[i] = s0 if sv.s0_at_scan_points is None else sv.s0_at_scan_points[i + 1]
        Ai1 = A if sv.a_at_scan_points is None else sv.a_at_scan_points[i]
        Ai2 = A if sv.a_at_scan_points is None else sv.a_at_scan_points[i + 1]
        rs1 = (
            r_setting
            if sv.setting_at_scan_points is None
            else sv.setting_at_scan_points[i]
        )
        rs2 = (
            r_setting
            if sv.setting_at_scan_points is None
            else sv.setting_at_scan_points[i + 1]
        )
        phis[i] = osc0 + i * d_osc
        A1f[i] = rs1 @ rot(phis[i]) @ r_fixed @ Ai1
        A2f[i] = rs2 @ rot(phis[i] + d_osc) @ r_fixed @ Ai2
        live[i] = True

    img_block = max(1, min(img_block, n_images))
    nblk = (n_images + img_block - 1) // img_block
    n_pad_img = nblk * img_block
    A1f, A2f = A1f[:n_pad_img], A2f[:n_pad_img]
    s01, s02 = s01[:n_pad_img], s02[:n_pad_img]
    phis, live = phis[:n_pad_img], live[:n_pad_img]

    n_hkl = len(hkl)
    ch = min(hkl_chunk, n_hkl)
    n_chunks = (n_hkl + ch - 1) // ch
    hkl_pad = np.zeros((n_chunks * ch, 3), hkl.dtype)
    hkl_pad[:n_hkl] = hkl
    # f32 chunks drive the wide-band candidate scan (pass 1); the flat f64
    # copy feeds the exact re-evaluation of the few survivors (pass 2)
    hkl_chunks, hkl_flat64 = _device_hkl_tables(hkl_pad, n_chunks, ch)

    cap = img_block * cap_per_image
    chunk_cap = _default_chunk_cap(cap)
    block_fn = _get_pblock_fn(cap, ch, float(dmin), float(d_osc), chunk_cap)

    out_hkl, out_s1, out_px, out_mm, out_panel, out_entering = (
        [], [], [], [], [], [],
    )
    w, hh = panel.image_size
    import os as _os
    import sys as _sys
    import time as _time

    _dbg = bool(_os.environ.get("FFS_PREDICT_DEBUG"))
    packed_all = np.concatenate(
        [
            A1f.reshape(-1, 9),
            A2f.reshape(-1, 9),
            s01,
            s02,
            phis[:, None],
            live[:, None].astype(np.float64),
        ],
        axis=1,
    )

    def _run_block(fn, packed_dev):
        meta, vals, counts = fn(packed_dev, hkl_chunks, hkl_flat64)
        meta, vals, counts = np.asarray(meta), np.asarray(vals), np.asarray(counts)
        return (
            meta[:, 0], meta[:, 1], vals[:, :3], vals[:, 3],
            meta[:, 2].astype(bool), meta[:, 3].astype(bool), counts,
        )

    def _overflowed(counts, cap, chunk_cap):
        return int(counts[0]) > cap or int(counts[1]) > chunk_cap

    for b0 in range(0, n_pad_img, img_block):
        packed_dev = jnp.asarray(packed_all[b0 : b0 + img_block])
        _t0 = _time.perf_counter()
        img_i, hkl_i, s1c, angc, entc, valid, count = _run_block(
            block_fn, packed_dev
        )
        if _dbg:
            print(
                f"predict block {b0 // img_block}: wide={int(count[0])} "
                f"valid={int(valid.sum())} cap={cap} "
                f"{(_time.perf_counter() - _t0) * 1e3:.1f} ms",
                file=_sys.stderr,
            )
        while _overflowed(count, cap, chunk_cap):
            # Grow only the capacity that actually overflowed: a per-chunk
            # overflow with the global cap fine used to double cap up to
            # three times (each a full hkl-grid re-scan) before chunk_cap
            # = max(4096, cap//8) even moved (ADVICE r4).
            if int(count[0]) > cap:
                cap *= 2
            chunk_cap = min(cap, max(chunk_cap, _default_chunk_cap(cap)))
            if int(count[1]) > chunk_cap:
                chunk_cap = min(cap, chunk_cap * 2)
            block_fn = _get_pblock_fn(
                cap, ch, float(dmin), float(d_osc), chunk_cap
            )
            img_i, hkl_i, s1c, angc, entc, valid, count = _run_block(
                block_fn, packed_dev
            )
        keep = valid
        if not keep.any():
            continue
        img_i, hkl_i = img_i[keep], hkl_i[keep]
        s1c, angc, entc = s1c[keep], angc[keep], entc[keep]

        xmm, ymm = panel.get_ray_intersection(s1c)
        x_px, y_px = panel.mm_to_px(xmm, ymm)
        # on-panel bounds in MM, matching dx2 Panel::get_ray_intersection's
        # optional (the parallax-corrected px coords can land fractionally
        # outside [0, size_px) for a ray inside the physical panel —
        # reference: predict.cc:106 drops only rays with no mm intersection)
        wmm = w * panel.pixel_size[0]
        hmm = hh * panel.pixel_size[1]
        on_panel = (xmm >= 0) & (xmm < wmm) & (ymm >= 0) & (ymm < hmm)
        if not on_panel.any():
            continue
        sel = np.nonzero(on_panel)[0]
        frame = z0 + (angc[sel] - osc0) / d_osc
        out_hkl.append(hkl[hkl_i[sel]])
        out_s1.append(s1c[sel])
        out_px.append(np.stack([x_px[sel], y_px[sel], frame], axis=1))
        out_mm.append(
            np.stack([xmm[sel], ymm[sel], np.deg2rad(angc[sel])], axis=1)
        )
        out_panel.append((b0 + img_i[sel]) * 0)  # single panel
        out_entering.append(entc[sel].astype(bool))

    if not out_hkl:
        empty3 = np.zeros((0, 3))
        return PredictedReflections(
            hkl=np.zeros((0, 3), np.int64),
            s1=empty3,
            xyzcal_px=empty3,
            xyzcal_mm=empty3,
            panel=np.zeros(0, np.uint64),
            entering=np.zeros(0, bool),
            flags=np.zeros(0, np.uint64),
        )
    hkl_all = np.concatenate(out_hkl)
    return PredictedReflections(
        hkl=hkl_all.astype(np.int64),
        s1=np.concatenate(out_s1),
        xyzcal_px=np.concatenate(out_px),
        xyzcal_mm=np.concatenate(out_mm),
        panel=np.concatenate(out_panel).astype(np.uint64),
        entering=np.concatenate(out_entering),
        flags=np.full(len(hkl_all), PREDICTED, dtype=np.uint64),
    )


def parse_scan_varying(elist: dict, n_images: int) -> ScanVaryingData:
    """Extract scan-varying model arrays from an expt JSON
    (reference: predict.cc:213-275)."""
    sv = ScanVaryingData()
    crystal = (elist.get("crystal") or [{}])[0]
    if "A_at_scan_points" in crystal:
        arr = np.asarray(crystal["A_at_scan_points"], dtype=float)
        if len(arr) == n_images + 1:
            sv.a_at_scan_points = arr.reshape(-1, 3, 3)
    beam = (elist.get("beam") or [{}])[0]
    if "s0_at_scan_points" in beam:
        arr = np.asarray(beam["s0_at_scan_points"], dtype=float)
        if len(arr) == n_images + 1:
            sv.s0_at_scan_points = arr.reshape(-1, 3)
    gonio = (elist.get("goniometer") or [{}])[0]
    if "setting_rotation_at_scan_points" in gonio:
        arr = np.asarray(gonio["setting_rotation_at_scan_points"], dtype=float)
        if len(arr) == n_images + 1:
            sv.setting_at_scan_points = arr.reshape(-1, 3, 3)
    return sv
