"""On-device connected components and spot statistics.

TPU-native replacement for the reference's host-side Boost-graph connected
components (reference: spotfinder/connected_components/connected_components.cc
:17-139, :238-266).  The design exploits the sparsity of strong pixels
(~10^3 of ~10^7 per frame):

  1. **Gather-based stream compaction** — an inclusive prefix sum over the
     strong mask, then a vectorised binary search finds the linear index of
     the k-th strong pixel.  No scatter ops (XLA TPU scatters over the full
     frame serialize); everything after this step is K-sized (K = the static
     strong-pixel capacity), so its cost is independent of frame size.
  2. **Sparse union-find** — 4-neighbour slots located once via binary
     search over the sorted compact indices; labels converge by iterated
     min-propagation + pointer jumping in O(log diameter) rounds of K-sized
     gathers.
  3. **Spot tables** — dense spot ids from a prefix sum over roots (raster
     order, matching the reference's sorted-map component ordering), then
     masked segment reductions for counts/centroids/bounding boxes and the
     deterministic (z, y, x) peak tie-break.

Everything is fixed-shape so the whole per-frame step jits once and never
recompiles in the streaming hot loop.  Public functions take a single frame;
batch with `jax.vmap`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

BIG = 2**30  # plain int: a module-level device-array constant forces
# a cross-program dependency inside loops (measured 17 ms per use on TPU)

DEFAULT_MAX_SPOTS = 8192


class CompactPixels(NamedTuple):
    """Strong pixels, compacted in raster order (fixed size K).

    Two slot layouts share this container:

    * dense (single-frame / flat-batch): the first ``count`` slots are
      valid, everything after holds linear_index == BIG (sorted
      sentinel) — ``linear_index[:count]`` is safe.
    * segmented (:func:`ffs_tpu.ops.compact.compact_from_pcw_segmented`):
      frame b owns slots [b*Kf, (b+1)*Kf) with BIG padding INSIDE each
      segment; ``count`` is the batch total, so ``[:count]`` slicing is
      WRONG there — consumers must re-slice per frame (see
      spotfind._collect_batch) or filter on linear_index < BIG.
    """

    linear_index: jnp.ndarray  # (K,) int32, BIG padding
    intensity: jnp.ndarray  # (K,) int32, 0 padding
    count: jnp.ndarray  # () int32 number of strong pixels


def _searchsorted(sorted_vals: jnp.ndarray, queries: jnp.ndarray) -> jnp.ndarray:
    """First index with sorted_vals[i] >= q (side='left'), as an unrolled
    binary search — straight-line gathers lower far better on TPU than
    jnp.searchsorted's scan."""
    n = sorted_vals.shape[0]
    lo = jnp.zeros_like(queries, dtype=jnp.int32)
    hi = jnp.full_like(queries, n, dtype=jnp.int32)
    for _ in range(max(1, n.bit_length() + 1)):
        mid = (lo + hi) // 2
        v = sorted_vals[jnp.clip(mid, 0, n - 1)]
        go_right = v < queries
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return lo


@functools.partial(jax.jit, static_argnames=("max_pixels",))
def compact_strong_pixels(
    strong: jnp.ndarray,
    image: jnp.ndarray,
    *,
    max_pixels: int = 32768,
) -> CompactPixels:
    """Stream-compact strong pixels (raster order) with gathers only."""
    h, w = strong.shape
    flat = strong.reshape(-1)
    cs = jnp.cumsum(flat.astype(jnp.int32))  # inclusive prefix sum
    count = cs[-1]
    # position of the k-th strong pixel = first index with cs >= k+1
    ks = jnp.arange(1, max_pixels + 1, dtype=jnp.int32)
    pos = _searchsorted(cs, ks)
    valid = ks <= count
    lin = jnp.where(valid, pos, BIG).astype(jnp.int32)
    inten = jnp.where(
        valid, image.reshape(-1)[jnp.clip(pos, 0, h * w - 1)].astype(jnp.int32), 0
    )
    return CompactPixels(lin, inten, count)


def _segmented_run_min(vals: jnp.ndarray, is_start: jnp.ndarray) -> jnp.ndarray:
    """Min of ``vals`` over each run (runs delimited by ``is_start`` flags,
    consecutive elements), via two segmented scans — no gathers."""

    def combine(a, b):
        av, astart = a
        bv, bstart = b
        return jnp.where(bstart, bv, jnp.minimum(av, bv)), astart | bstart

    fwd, _ = jax.lax.associative_scan(combine, (vals, is_start))
    # backward pass: run *ends* are the starts of the reversed sequence
    is_end = jnp.concatenate([is_start[1:], jnp.ones(1, dtype=bool)])
    bwd, _ = jax.lax.associative_scan(
        combine, (vals[::-1], is_end[::-1])
    )
    return jnp.minimum(fwd, bwd[::-1])


@functools.partial(jax.jit, static_argnames=("width",))
def label_compact_pixels(
    pixels: CompactPixels,
    *,
    width: int,
    neighbors: tuple[jnp.ndarray, jnp.ndarray] | None = None,
) -> jnp.ndarray:
    """4-connected component roots over compacted pixels.

    Returns (K,) int32: the *slot* of each pixel's component root (the
    component's minimum linear index — deterministic raster-order labels);
    slot of itself for padding entries.

    Gather ops on TPU cost ~10 ns/element while sorts and scans are ~10x
    cheaper, so the neighbour discovery avoids per-neighbour binary search:

      * horizontal neighbours are *consecutive slots* in the raster-ordered
        compact array, so whole runs collapse to their start slot with two
        segmented scans — no gathers at all;
      * vertical neighbours come from ONE 3K sort-merge: pixels (tag 0) and
        up/down "requests" at lin -/+ width (tags 1/2) sort together; a
        request that lands right of its target value resolves via two
        monotone forward fills (cummax), then two segment-mins route the
        matched slot back to the requesting pixel.

    The min-propagation loop then needs only 3 gathers per round (labels at
    the two vertical neighbours + one pointer jump); run uniformity is
    restored each round by the segmented scans.
    """
    lin = pixels.linear_index
    k = lin.shape[0]
    slots = jnp.arange(k, dtype=jnp.int32)
    in_spot = lin < BIG

    # --- horizontal runs: consecutive slots with consecutive lin, same row
    col = lin % width
    same_run = jnp.concatenate(
        [
            jnp.zeros(1, dtype=bool),
            (lin[1:] == lin[:-1] + 1) & (col[1:] != 0) & in_spot[1:],
        ]
    )
    is_start = ~same_run
    # run-start slot by forward fill (slots ascend, so cummax == last start)
    lbl0 = jax.lax.cummax(jnp.where(is_start, slots, -1))

    if neighbors is not None:
        # vertical neighbour slots precomputed from the packed words
        # (ops/compact.compact_from_pcw_flat with_neighbors=True): skips
        # the whole 3K sort-merge below
        nbu, nbd = neighbors
    else:
        # --- vertical edges via one sort-merge -----------------------------
        # i32-safe sentinel for padding entries (key = val * 4 + tag must
        # not overflow; real lin +/- width stays far below this)
        padv = (2**31 - 8) // 4
        up_req = jnp.where(in_spot & (lin >= width), lin - width, padv)
        down_req = jnp.where(in_spot, lin + width, padv)
        vals = jnp.concatenate([jnp.where(in_spot, lin, padv), up_req, down_req])
        tags = jnp.concatenate(
            [
                jnp.zeros(k, jnp.int32),
                jnp.ones(k, jnp.int32),
                jnp.full(k, 2, jnp.int32),
            ]
        )
        pay = jnp.concatenate([slots, slots, slots])
        skey, spay = jax.lax.sort(
            (vals * 4 + tags, pay), dimension=0, num_keys=1
        )
        sval = skey // 4
        stag = skey - sval * 4
        is_a = stag == 0
        # forward fill of the most recent pixel (tag 0): compact slots
        # ascend with lin, so cummax gives the *latest* value and slot
        fill_val = jax.lax.cummax(jnp.where(is_a, sval, -1))
        fill_slot = jax.lax.cummax(jnp.where(is_a, spay, -1))
        matched = (fill_val == sval) & (sval < padv) & ~is_a
        # route matched neighbour slots back to the requesting slot
        seg_up = jnp.where(matched & (stag == 1), spay, k)
        seg_down = jnp.where(matched & (stag == 2), spay, k)
        nbu = jax.ops.segment_min(
            jnp.where(matched, fill_slot, BIG), seg_up, num_segments=k + 1
        )[:k]
        nbd = jax.ops.segment_min(
            jnp.where(matched, fill_slot, BIG), seg_down, num_segments=k + 1
        )[:k]
        nbu = jnp.where(nbu < BIG, nbu, slots).astype(jnp.int32)
        nbd = jnp.where(nbd < BIG, nbd, slots).astype(jnp.int32)

    # both neighbour lookups ride one gather (per-op overhead amortises;
    # 2K indices is still below the superlinear-gather regime)
    nb2 = jnp.concatenate([nbu, nbd])

    def body(state):
        lbl, _ = state
        v = lbl[nb2]
        prop = jnp.minimum(lbl, jnp.minimum(v[:k], v[k:]))
        prop = _segmented_run_min(prop, is_start)
        jumped = prop[prop]  # pointer jumping
        new = jnp.minimum(prop, jumped)
        return new, jnp.any(new != lbl)

    # (A/B'd on hardware: unrolling rounds ahead of the loop and a
    # sorted segment_min + gather run-restore both measured worse than
    # the convergence-gated loop with the two associative scans.)
    lbl, _ = jax.lax.while_loop(
        lambda s: s[1], body, (lbl0, jnp.bool_(True))
    )
    return lbl


class SpotTable(NamedTuple):
    """Fixed-size (S,) per-spot statistics; rows beyond ``n_spots`` invalid."""

    n_spots: jnp.ndarray  # () int32
    valid: jnp.ndarray  # (S,) bool
    n_pixels: jnp.ndarray  # (S,) int32
    sum_intensity: jnp.ndarray  # (S,)
    com_x: jnp.ndarray  # (S,) intensity-weighted centre (+0.5 px convention)
    com_y: jnp.ndarray
    com_z: jnp.ndarray
    x_min: jnp.ndarray  # (S,) int32 bounding boxes (inclusive)
    x_max: jnp.ndarray
    y_min: jnp.ndarray
    y_max: jnp.ndarray
    z_min: jnp.ndarray
    z_max: jnp.ndarray
    peak_x: jnp.ndarray  # (S,) int32 peak pixel (deterministic tie-break)
    peak_y: jnp.ndarray
    peak_z: jnp.ndarray


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "max_spots", "dtype", "frame_rows", "peak_key_slots"
    ),
)
def spot_table_from_pixels(
    pixels: CompactPixels,
    root_slot: jnp.ndarray,
    *,
    width: int,
    max_spots: int = DEFAULT_MAX_SPOTS,
    dtype=jnp.float32,
    frame_rows: int | None = None,
    peak_key_slots: int | None = None,
) -> SpotTable:
    """Per-spot statistics from compacted, labelled pixels.

    Single-frame form (``frame_rows=None``): z = 0 for every pixel.
    Flat-batch form (``frame_rows=H``): linear indices are TALL indices
    from :func:`ffs_tpu.ops.compact.compact_from_rowcum_flat` — y is
    recovered modulo the (H + 1)-row virtual frame pitch and the frame
    index becomes z, so one call tabulates a whole batch (spots never
    span frames thanks to the gap row, and the raster tie-break order is
    exactly the (z, y, x) order the reference uses).

    ``peak_key_slots`` (opt-in fast path, bit-identical result): the
    per-frame slot capacity Kf of a SEGMENTED compaction layout (frame b
    owns slots [b*Kf, (b+1)*Kf)), or the total capacity K for flat /
    single-frame layouts (K == the pixel array length — the slot
    reconstruction branches on that equality, so a flat batch MUST pass
    the full K, never a smaller divisor).  Folds the peak tie-break into the bounding-box
    segment_max via the exact composite key
    ``intensity * 2^m + (2^m - 1 - frame-local slot)`` (m =
    ceil_log2(peak_key_slots)) — valid because within-frame slot order is
    linear-index order, so max key = max intensity with ties resolved to
    the smallest linear index, exactly the reference's (z, y, x) ordering
    (connected_components.cc:143-157).  Drops the dedicated peak
    segment_min and the K-wide peak-intensity broadcast gather (measured
    -0.31 ms/batch on the Eiger bench pipeline,
    tools/measure_cc_variants.py).  Requires intensities < 2^16 (u16
    detectors) so the key fits i32; callers with 32-bit pixel data must
    leave it None.
    """
    lin = pixels.linear_index
    k = lin.shape[0]
    slots = jnp.arange(k, dtype=jnp.int32)
    in_spot = lin < BIG

    # dense spot ids in raster order of component roots
    is_root = in_spot & (root_slot == slots)
    spot_seq = jnp.cumsum(is_root.astype(jnp.int32)) - is_root.astype(jnp.int32)
    n_spots = jnp.sum(is_root.astype(jnp.int32))
    spot_id = spot_seq[root_slot]

    px_x = jnp.where(in_spot, lin % width, 0)
    row_t = lin // width
    if frame_rows is not None:
        ht = frame_rows + 1
        px_z = jnp.where(in_spot, row_t // ht, 0)
        px_y = jnp.where(in_spot, row_t - px_z * ht, 0)
    else:
        px_y = jnp.where(in_spot, row_t, 0)
        px_z = jnp.zeros_like(px_x)

    sid = jnp.where(in_spot, jnp.minimum(spot_id, max_spots), max_spots)

    # Segment reductions are latency-bound on TPU (~70 us apiece regardless
    # of payload width), so the twelve per-spot statistics are packed into
    # four batched segment ops: one f32 sum (counts + three weighted sums),
    # one i32 min, one i32 max, and the peak tie-break min.
    inten = pixels.intensity.astype(dtype)
    fsum = jax.ops.segment_sum(
        jnp.where(
            in_spot[:, None],
            jnp.stack(
                [
                    jnp.ones_like(inten),
                    inten,
                    inten * px_x.astype(dtype),
                    inten * px_y.astype(dtype),
                ],
                axis=1,
            ),
            0,
        ),
        sid,
        num_segments=max_spots + 1,
    )[:max_spots]
    n_pixels = fsum[:, 0].astype(jnp.int32)
    sum_i, sum_ix, sum_iy = fsum[:, 1], fsum[:, 2], fsum[:, 3]

    # mins ride the SAME segment_max as negated columns (exact for
    # integers; segment ops are latency-bound regardless of payload
    # width, so one 6-column op beats a min + a max).  Peak intensity
    # (or the composite peak KEY) rides along; z is constant within a
    # spot (frames never bridge), so z_max == z_min — no extra reduction.
    if peak_key_slots is not None:
        mlog = max(1, (peak_key_slots - 1).bit_length())
        if mlog + 16 > 31:
            raise ValueError(
                f"peak_key_slots={peak_key_slots} needs {mlog} low bits; "
                "intensity * 2^m must fit i32 (max 32768 slots per frame)"
            )
        mcap = jnp.int32((1 << mlog) - 1)
        col2 = (pixels.intensity << mlog) + (
            mcap - (slots % peak_key_slots)
        )
        pad2 = -BIG
    else:
        col2 = pixels.intensity
        pad2 = -1
    pad6 = jnp.array([-1, -1, pad2, -BIG, -BIG, -BIG], jnp.int32)
    imaxs = jax.ops.segment_max(
        jnp.where(
            in_spot[:, None],
            jnp.stack([px_x, px_y, col2, -px_x, -px_y, -px_z], axis=1),
            pad6,
        ),
        sid,
        num_segments=max_spots + 1,
    )[:max_spots]
    x_max, y_max = imaxs[:, 0], imaxs[:, 1]
    x_min, y_min, z_min = -imaxs[:, 3], -imaxs[:, 4], -imaxs[:, 5]
    z_max = jnp.where(n_pixels > 0, z_min, -1)
    z_min = jnp.where(n_pixels > 0, z_min, BIG)

    # Peak pixel: max intensity, ties -> smallest (z, y, x); the (tall)
    # raster linear index is the exact tie-break order
    # (reference: connected_components.cc:143-157)
    if peak_key_slots is not None:
        peak_local = mcap - (imaxs[:, 2] & mcap)
        if peak_key_slots == k:
            # global-slot modulus (flat / single-frame layouts): the key's
            # low bits ARE the slot — adding z*K here would index padding
            peak_slot = peak_local
        else:
            # segmented layout: frame b owns slots [b*Kf, (b+1)*Kf), so
            # the segment base is z * Kf
            peak_slot = (
                jnp.where(n_pixels > 0, z_max, 0) * peak_key_slots
                + peak_local
            )
        # empty rows take segment_min's identity (i32 max) so the padding
        # values match the two-op path bit-for-bit
        peak_lin = jnp.where(
            n_pixels > 0,
            lin[jnp.clip(peak_slot, 0, k - 1)],
            jnp.int32(2**31 - 1),
        )
    else:
        peak_i = imaxs[:, 2]
        is_peak = in_spot & (
            pixels.intensity == peak_i[jnp.clip(sid, 0, max_spots - 1)]
        )
        peak_lin = jax.ops.segment_min(
            jnp.where(is_peak, lin, BIG), sid, num_segments=max_spots + 1
        )[:max_spots]
    peak_x = peak_lin % width
    peak_row_t = jnp.where(peak_lin < BIG, peak_lin // width, BIG)
    if frame_rows is not None:
        peak_z = jnp.where(peak_lin < BIG, peak_row_t // (frame_rows + 1), 0)
        peak_y = jnp.where(
            peak_lin < BIG, peak_row_t - peak_z * (frame_rows + 1), BIG
        )
    else:
        peak_y = peak_row_t
        peak_z = jnp.zeros_like(peak_x)

    safe_sum = jnp.where(sum_i > 0, sum_i, 1)
    valid = jnp.arange(max_spots, dtype=jnp.int32) < jnp.minimum(n_spots, max_spots)
    return SpotTable(
        n_spots=n_spots,
        valid=valid,
        n_pixels=n_pixels,
        sum_intensity=sum_i,
        com_x=sum_ix / safe_sum + 0.5,
        com_y=sum_iy / safe_sum + 0.5,
        # z is constant within a spot, so the weighted mean is z + 0.5
        com_z=jnp.where(n_pixels > 0, z_min, 0).astype(dtype) + 0.5,
        x_min=x_min,
        x_max=x_max,
        y_min=y_min,
        y_max=y_max,
        z_min=z_min,
        z_max=z_max,
        peak_x=peak_x,
        peak_y=peak_y,
        peak_z=peak_z,
    )


def peak_centroid_distance(table: SpotTable) -> jnp.ndarray:
    """Euclidean distance between the peak pixel centre and the centroid
    (reference: connected_components.hpp:111-206)."""
    dx = table.peak_x + 0.5 - table.com_x
    dy = table.peak_y + 0.5 - table.com_y
    dz = table.peak_z + 0.5 - table.com_z
    return jnp.sqrt(dx * dx + dy * dy + dz * dz)


@jax.jit
def filter_spots(
    table: SpotTable,
    min_spot_size: jnp.ndarray | int,
    max_peak_centroid_separation: jnp.ndarray | float,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Spot filters (reference: connected_components.cc:207-236).

    Returns (keep_mask, n_filtered_by_size, n_filtered_by_separation).
    A filter is disabled when its parameter is <= 0, as in the reference.
    """
    size_ok = jnp.where(min_spot_size > 0, table.n_pixels >= min_spot_size, True)
    sep = peak_centroid_distance(table)
    sep_ok = jnp.where(
        max_peak_centroid_separation > 0,
        sep <= max_peak_centroid_separation,
        True,
    )
    n_size = jnp.sum((table.valid & ~size_ok).astype(jnp.int32))
    # the reference applies the separation filter after the size filter
    n_sep = jnp.sum((table.valid & size_ok & ~sep_ok).astype(jnp.int32))
    return table.valid & size_ok & sep_ok, n_size, n_sep


# ---------------------------------------------------------------------------
# Dense labelling (reference/testing path; the production pipeline uses the
# sparse compaction + label_compact_pixels route above)
# ---------------------------------------------------------------------------


def _neighbor_min(lbl: jnp.ndarray) -> jnp.ndarray:
    """Min over the 4-neighbourhood (and self), BIG-padded at the borders."""
    up = jnp.concatenate([lbl[1:], jnp.full_like(lbl[:1], BIG)], axis=0)
    down = jnp.concatenate([jnp.full_like(lbl[:1], BIG), lbl[:-1]], axis=0)
    left = jnp.concatenate([lbl[:, 1:], jnp.full_like(lbl[:, :1], BIG)], axis=1)
    right = jnp.concatenate([jnp.full_like(lbl[:, :1], BIG), lbl[:, :-1]], axis=1)
    return jnp.minimum(
        jnp.minimum(jnp.minimum(up, down), jnp.minimum(left, right)), lbl
    )


@jax.jit
def label_components_2d(strong: jnp.ndarray) -> jnp.ndarray:
    """Dense 4-connected labels for a bool (H, W) mask (testing/reference).

    Returns int32 (H, W): for strong pixels, the linear index of the
    component's root (its minimum linear index); BIG elsewhere.
    """
    h, w = strong.shape
    lin = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    lbl0 = jnp.where(strong, lin, BIG)

    def body(state):
        lbl, _ = state
        prop = jnp.where(strong, _neighbor_min(lbl), BIG)
        flat = prop.reshape(-1)
        jumped = flat[jnp.clip(prop, 0, h * w - 1)]
        new = jnp.where(strong, jnp.minimum(prop, jumped), BIG)
        return new, jnp.any(new != lbl)

    lbl, _ = jax.lax.while_loop(lambda s: s[1], body, (lbl0, jnp.bool_(True)))
    return lbl
