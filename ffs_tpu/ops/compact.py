"""Gather-only stream compaction from per-row prefix counts.

Given the ``rowcum`` output of the fused dispersion kernel (within-row
inclusive strong-pixel counts), the k-th strong pixel of the frame is found
with two vectorised binary searches — one over the per-row offsets, one
within the row — so compaction costs O(K log HW) gathers and touches no
full-frame temporaries.  This replaces both the reference's host-side pixel
scan (connected_components.cc:24-31) and any XLA scatter/cumsum over the
frame.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .connected_components import BIG, CompactPixels


def _bsearch(gather, n: int, targets: jnp.ndarray) -> jnp.ndarray:
    """First index i in [0, n) with value(i) >= target, for monotone values
    provided through ``gather(idx) -> value``; unrolled binary search."""
    lo = jnp.zeros_like(targets)
    hi = jnp.full_like(targets, n)
    steps = max(1, n.bit_length() + 1)
    for _ in range(steps):
        mid = (lo + hi) // 2
        v = gather(jnp.clip(mid, 0, n - 1))
        go_right = v < targets
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return lo


def _widened_flat(images: jnp.ndarray) -> jnp.ndarray:
    """Flattened i32 view of the frame batch for intensity gathers.

    Cost-model note (r2 correction, CLAUDE.md): gather speed is set by
    whether the TABLE is VMEM-stageable (~6.5 ns/index) or HBM-resident
    (~200 ns/index) — dtype alone made NO difference at the 288 MB batch
    scale, and widening the WHOLE batch there measured worse.  This
    helper therefore only pays off on tables that stay within the ~34 MB
    staging budget (the pooled per-frame-group tables of
    compact_from_pcw_flat / _segmented); the legacy whole-batch flat
    paths below keep it for bit-parity with their original baselines but
    are not the production configuration.
    """
    flat = images.reshape(-1)
    if flat.dtype.itemsize < 4:
        flat = jax.lax.optimization_barrier(flat.astype(jnp.int32))
    elif flat.dtype != jnp.int32:
        flat = flat.astype(jnp.int32)
    return flat


@functools.partial(jax.jit, static_argnames=("max_pixels",))
def compact_from_rowcum(
    image: jnp.ndarray,
    rowcum: jnp.ndarray,
    *,
    max_pixels: int = 32768,
) -> CompactPixels:
    """Compact strong pixels (raster order) from within-row prefix counts."""
    h, w = rowcum.shape
    row_counts = rowcum[:, -1]
    row_end = jnp.cumsum(row_counts)  # inclusive: strong pixels through row r
    count = row_end[-1]

    ks = jnp.arange(1, max_pixels + 1, dtype=jnp.int32)  # 1-based ranks
    valid = ks <= count

    # row of the k-th strong pixel = #rows with row_end < k.  The queries
    # are the consecutive integers 1..K, so instead of K binary searches
    # (14 latency-bound gather steps) invert the monotone row_end with one
    # histogram + prefix sum: D[j] = #rows with row_end == j, and
    # row(k) = sum_{j<k} D[j] (zero-count rows duplicate their
    # predecessor's row_end and drop out naturally).
    dhist = jnp.zeros(max_pixels + 1, jnp.int32).at[
        jnp.clip(row_end, 0, max_pixels)
    ].add(1)
    row = jnp.cumsum(dhist)[:max_pixels]
    row_c = jnp.clip(row, 0, h - 1)
    prev_end = jnp.where(row_c > 0, row_end[jnp.clip(row_c - 1, 0, h - 1)], 0)
    rank_in_row = ks - prev_end  # 1-based within the row

    # column: first col with rowcum[row, col] >= rank.  The plain unrolled
    # binary search is the measured optimum.  Measured dead ends (all
    # end-to-end, honest harness): k-ary probing (gather cost scales with
    # total index count, so extra probes cost more than the steps saved),
    # two-level block tables (small-table gathers hit the same ~70 us
    # per-op floor), anchored search with a bracketed while_loop refinement
    # (per-op floor on the K/8 anchor gathers + loop overhead), and
    # top_k/sort over the dense frame (~50 ms at 16M px).
    col = _bsearch(lambda j: rowcum[row_c, jnp.clip(j, 0, w - 1)], w, rank_in_row)
    col_c = jnp.clip(col, 0, w - 1)

    lin = jnp.where(valid, row_c * w + col_c, BIG).astype(jnp.int32)
    inten = jnp.where(valid, _widened_flat(image)[row_c * w + col_c], 0)
    return CompactPixels(lin, inten, count)


def _check_i32_sort_keys(B: int, ht: int, w: int) -> None:
    """Downstream label_compact_pixels builds int32 sort keys lin*4 + tag;
    the largest tall linear index must leave that headroom or the
    sort-merge silently corrupts — fail loudly instead (ADVICE r1)."""
    if B * ht * w * 4 >= 2**31:
        raise ValueError(
            f"flat batch too tall for i32 CC sort keys: B*{ht}*{w}*4 = "
            f"{B * ht * w * 4} >= 2^31; split the batch (max "
            f"{(2**31 // (4 * ht * w))} frames at this geometry)"
        )


def _invert_tall_rows(row_counts: jnp.ndarray, B: int, h: int, k: int):
    """Tall-row histogram inversion shared by the flat compactions.

    ``row_counts``: (B, h) per-row strong-pixel totals.  Treats the batch
    as one tall frame of B*(h+1) rows (one virtual gap row per frame) and
    locates the k-th strong pixel's row for k = 1..K with one histogram +
    prefix sum (see compact_from_rowcum; gap rows duplicate their
    predecessor's row_end and drop out like any zero-count row; they are
    never selected for valid ks, and the y clamp only affects padding
    slots).  Returns (count, ks, valid, rank_in_row, prev_end, row_tc,
    b_idx, y_idx) — row_tc is the clipped TALL row (the linear-index
    row), b_idx/y_idx its frame/row split for physical gathers, and
    prev_end the strong-pixel total BEFORE that row (the row's first
    slot index, used by the neighbour-slot derivation).
    """
    ht = h + 1
    flat_counts = jnp.pad(row_counts, ((0, 0), (0, 1))).reshape(-1)
    row_end = jnp.cumsum(flat_counts)  # (B*ht,) inclusive
    count = row_end[-1]

    ks = jnp.arange(1, k + 1, dtype=jnp.int32)
    valid = ks <= count

    dhist = jnp.zeros(k + 1, jnp.int32).at[jnp.clip(row_end, 0, k)].add(1)
    row_t = jnp.cumsum(dhist)[:k]
    row_tc = jnp.clip(row_t, 0, B * ht - 1)
    prev_end = jnp.where(
        row_tc > 0, row_end[jnp.clip(row_tc - 1, 0, B * ht - 1)], 0
    )
    rank_in_row = ks - prev_end  # 1-based within the row

    b_idx = row_tc // ht
    y_idx = jnp.minimum(row_tc - b_idx * ht, h - 1)
    return count, ks, valid, rank_in_row, prev_end, row_tc, b_idx, y_idx


@functools.partial(jax.jit, static_argnames=("max_pixels_total",))
def compact_from_rowcum_flat(
    images: jnp.ndarray,
    rowcum: jnp.ndarray,
    *,
    max_pixels_total: int = 65536,
) -> CompactPixels:
    """Compact a whole BATCH of frames into ONE pixel list (tall-frame form).

    Perf note (measured on v5e): this is NOT faster than per-frame
    lax.map for throughput — TPU gather cost grows superlinearly past
    ~8k indices per op, so one 64k-index op costs MORE than eight
    8k-index ops.  The flat form exists for its semantics: shared
    capacity across a batch, and a single spot table covering all frames
    (``spot_table_from_pixels(..., frame_rows=H)`` yields per-frame
    (x, y, frame) coordinates), which is the building block for on-device
    multi-frame analyses.

    The batch is treated as a single tall frame of ``B * (H + 1)`` rows:
    one virtual empty row separates consecutive frames so 4-connected
    components can never bridge a frame boundary.  Returned
    ``linear_index`` values are TALL indices ``row_tall * W + x`` with
    ``row_tall = b * (H + 1) + y``; downstream CC works on them unchanged
    (vertical neighbours are still +-W), and
    ``spot_table_from_pixels(..., frame_rows=H)`` recovers per-frame
    (x, y, frame) coordinates.  Capacity is shared across the batch.
    """
    B, h, w = rowcum.shape
    ht = h + 1  # +1 virtual gap row per frame
    _check_i32_sort_keys(B, ht, w)
    k = max_pixels_total
    count, ks, valid, rank_in_row, _, row_tc, b_idx, y_idx = (
        _invert_tall_rows(rowcum[:, :, -1], B, h, k)
    )
    src_row_base = (b_idx * h + y_idx) * w  # flat offset into rowcum/images

    flat_rc = rowcum.reshape(-1)
    col = _bsearch(
        lambda j: flat_rc[src_row_base + jnp.clip(j, 0, w - 1)], w, rank_in_row
    )
    col_c = jnp.clip(col, 0, w - 1)

    lin = jnp.where(valid, row_tc * w + col_c, BIG).astype(jnp.int32)
    inten = jnp.where(valid, _widened_flat(images)[src_row_base + col_c], 0)
    return CompactPixels(lin, inten, count)


def _select_bit(word: jnp.ndarray, rank: jnp.ndarray) -> jnp.ndarray:
    """Position (0-based) of the ``rank``-th (1-based) set bit of each u32
    word — 5 elementwise popcount steps, no gathers."""
    pos = jnp.zeros_like(rank)
    for b in (16, 8, 4, 2, 1):
        width = pos + b
        mask = jnp.where(
            width >= 32,
            jnp.int32(-1),
            (jnp.int32(1) << jnp.minimum(width, 31)) - 1,
        )
        c = jax.lax.population_count(word & mask)
        pos = jnp.where(c < rank, width, pos)
    return pos


@functools.partial(jax.jit, static_argnames=("max_pixels_total",))
def compact_from_words_flat(
    images: jnp.ndarray,
    words: jnp.ndarray,
    pc: jnp.ndarray,
    *,
    max_pixels_total: int = 24576,
) -> CompactPixels:
    """Compact a whole batch from packed strong-pixel words (tall-frame form).

    Inputs come from :func:`ffs_tpu.ops.dispersion_pallas.dispersion_packed`:
    ``words`` (B, H, nwl) packs strong flags (bit t of word j = column
    32j + t), ``pc`` (B, H, nwl) is the inclusive per-row word-level count
    prefix.  Compared to :func:`compact_from_rowcum_flat` this replaces the
    dense per-pixel rowcum (72 MB/frame at Eiger 16M) with ~4 MB/frame of
    words, and the 14-step in-row binary search with an 8-step word search
    plus 5 gather-free popcount steps — the whole batch shares ONE set of
    sparse ops (reference throughput architecture: spotfinder.cc:751-1008;
    here redesigned around the TPU cost model in tools/measure_ops.py).

    Returns tall linear indices with the (H + 1)-row virtual gap pitch of
    :func:`compact_from_rowcum_flat` (CC-safe across frames); with B == 1
    the indices coincide with plain single-frame raster indices.
    """
    B, h, nwl = pc.shape
    w = images.shape[-1]
    ht = h + 1
    _check_i32_sort_keys(B, ht, w)
    k = max_pixels_total
    count, ks, valid, rank_in_row, _, row_tc, b_idx, y_idx = (
        _invert_tall_rows(pc[:, :, -1], B, h, k)
    )
    prow = b_idx * h + y_idx  # physical row into words/pc/images

    # word: first j with pc[prow, j] >= rank (8 gather steps over nwl lanes)
    pcf = pc.reshape(-1)
    base = prow * nwl
    jw = _bsearch(lambda j: pcf[base + jnp.clip(j, 0, nwl - 1)], nwl, rank_in_row)
    jw_c = jnp.clip(jw, 0, nwl - 1)
    word = words.reshape(-1)[base + jw_c]
    before = jnp.where(jw_c > 0, pcf[base + jnp.clip(jw_c - 1, 0, nwl - 1)], 0)
    bit = _select_bit(word, rank_in_row - before)
    col = jnp.clip(jw_c * 32 + bit, 0, w - 1)

    lin = jnp.where(valid, row_tc * w + col, BIG).astype(jnp.int32)
    inten = jnp.where(valid, _widened_flat(images)[prow * w + col], 0)
    return CompactPixels(lin, inten, count)


@functools.partial(jax.jit, static_argnames=("max_pixels",))
def compact_from_words(
    image: jnp.ndarray,
    words: jnp.ndarray,
    pc: jnp.ndarray,
    *,
    max_pixels: int = 32768,
) -> CompactPixels:
    """Single-frame word-based compaction (plain raster linear indices)."""
    h, w = image.shape
    p = compact_from_words_flat(
        image[None], words[None], pc[None], max_pixels_total=max_pixels
    )
    # B == 1: tall pitch (h+1) never hosts pixels in the gap row, and
    # row_t * w + col == row * w + col for rows < h, so indices are already
    # plain raster indices.
    return p


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_pixels_total",
        "with_neighbors",
        "gather_group_frames",
        "gather_group_rows",
    ),
)
def compact_from_pcw_flat(
    images: jnp.ndarray,
    pcw: jnp.ndarray,
    *,
    max_pixels_total: int = 24576,
    with_neighbors: bool = False,
    gather_group_frames: int | None = None,
    gather_group_rows: int | None = None,
):
    """Batch compaction from the combined [pc | w32] kernel rows.

    Hot-path variant of :func:`compact_from_words_flat`: each pixel fetches
    its row's prefix counts AND packed words with ONE (K, 2*nwl) row
    gather, then the word index, preceding count, and word value all fall
    out of dense lane-wise reductions — no dependent point-gather chain at
    all (measured ~2x faster than the 9-step binary search on v5e for
    fresh kernel outputs; see tools/measure_compact.py).

    ``with_neighbors=True`` additionally returns each pixel's vertical
    neighbour SLOTS (up, down; own slot when absent), derived here from the
    packed words with one fused point-gather — this feeds
    ``label_compact_pixels(..., neighbors=...)`` and replaces its 3K
    sort-merge edge discovery.
    """
    B, h, nwl2 = pcw.shape  # h = pcw row count, possibly strip-padded
    nwl = nwl2 // 2
    h_img, w = images.shape[-2], images.shape[-1]
    ht = h + 1
    _check_i32_sort_keys(B, ht, w)
    k = max_pixels_total
    count, ks, valid, rank, prev_end, row_tc, b_idx, y_idx = (
        _invert_tall_rows(pcw[:, :, nwl - 1], B, h, k)
    )
    prow = b_idx * h + y_idx  # row into pcw
    # image rows may be fewer than (strip-padded) pcw rows; padded rows
    # never host pixels, so the clamp below only affects padding slots
    prow_img = b_idx * h_img + jnp.minimum(y_idx, h_img - 1)

    # Whole-batch single row gather.  Unlike the image-intensity gather
    # below, do NOT chunk this per frame: pcw is small enough to stage
    # (~38 MB at Eiger B=8) and per-frame chunking measured +0.86
    # ms/frame on v5e (B gathers of K rows each multiply the index
    # count; tools/measure_bench_stages.py).
    rows = pcw.reshape(-1, nwl2)[prow]  # (K, 2*nwl) single row gather
    pc_rows = rows[:, :nwl]
    w_rows = rows[:, nwl:]
    below = pc_rows < rank[:, None]
    jw = jnp.sum(below.astype(jnp.int32), axis=1)
    jw_c = jnp.clip(jw, 0, nwl - 1)
    before = jnp.max(jnp.where(below, pc_rows, 0), axis=1)
    onehot = jnp.arange(nwl, dtype=jnp.int32)[None, :] == jw_c[:, None]
    word = jnp.sum(jnp.where(onehot, w_rows, 0), axis=1)
    bit = _select_bit(word, rank - before)
    col = jnp.clip(jw_c * 32 + bit, 0, w - 1)

    lin = jnp.where(valid, row_tc * w + col, BIG).astype(jnp.int32)
    # Intensity gather, chunked by VMEM-sized frame GROUPS: gathers into
    # fresh arrays are fast only while the table is VMEM-stageable
    # (~6.5 ns/index into a 34 MB table vs ~200 ns/index into the 288 MB
    # Eiger batch, measured in tools/measure_compact.py) — so fetch from
    # barrier'd tables of up to ~32 MB of frames at a time.  Eiger 16M
    # (36 MB/frame) chunks per frame exactly as before; small detectors
    # pool many frames per table (Jungfrau 1M: 15 per group), keeping the
    # loop short — at batch 112 the old per-frame loop's 112 gather+select
    # rounds were pure op-latency overhead.
    frame_elems = h_img * w
    if gather_group_rows is not None:
        # Row-band grouping: chunk the FLAT (B*h_img, w) row space into
        # bands of gather_group_rows rows (bands may span frame
        # boundaries — prow_img is already flat).  Measurement hook only:
        # the theory that Eiger's 36.2 MB frames were past the ~34 MB
        # VMEM-stage limit was DISPROVED on v5e (tools/
        # measure_gather_bands.py: whole frames 12.6 ms/batch, ~33.5 MB
        # bands 15.2, ~8 MB bands 19.8 — per-frame tables stage fine and
        # every extra gather round costs ~0.19 ms of pure op overhead).
        gb = gather_group_rows
        imgf = images.reshape(-1, w)
        g_idx = prow_img // gb
        local = (prow_img - g_idx * gb) * w + col
        inten = jnp.zeros(k, jnp.int32)
        for g in range(-(-(B * h_img) // gb)):
            tab = jax.lax.optimization_barrier(
                imgf[g * gb : (g + 1) * gb].reshape(-1)
            )
            vals = tab[jnp.clip(local, 0, tab.shape[0] - 1)].astype(jnp.int32)
            inten = jnp.where(g_idx == g, vals, inten)
    else:
        gs = gather_group_frames or max(
            1, (32 << 20) // (frame_elems * images.dtype.itemsize)
        )
        g_idx = b_idx // gs
        local = (prow_img - g_idx * (gs * h_img)) * w + col
        inten = jnp.zeros(k, jnp.int32)
        for g in range(-(-B // gs)):
            tab = jax.lax.optimization_barrier(
                images[g * gs : (g + 1) * gs].reshape(-1)
            )
            vals = tab[jnp.clip(local, 0, tab.shape[0] - 1)].astype(jnp.int32)
            inten = jnp.where(g_idx == g, vals, inten)
    inten = jnp.where(valid, inten, 0)
    pixels = CompactPixels(lin, inten, count)
    if not with_neighbors:
        return pixels

    # --- vertical neighbour slots straight from the packed words ----------
    # A pixel at (row, col) has an up/down neighbour iff the same bit is
    # set in the adjacent row's word; the neighbour's SLOT follows from the
    # adjacent row's counts: slot = (pixels before that row) + (rank of the
    # bit within it) - 1.  The adjacent rows arrive as two (K, 2*nwl)
    # row-slice gathers — a row-slice gather prices like K POINT gathers
    # on v5e (lane count ~free, CLAUDE.md cost model), so two of them beat
    # the previous single 5K-index point-gather ~2.5x; the word / preceding
    # count / row total then fall out of dense lane selects.  Feeds
    # label_compact_pixels(..., neighbors=...), replacing its 3K sort-merge.
    rows2d = pcw.reshape(-1, nwl2)
    up_rows = rows2d[jnp.clip(prow - 1, 0, B * h - 1)]
    dn_rows = rows2d[jnp.clip(prow + 1, 0, B * h - 1)]
    # lane == jw_c - 1 never matches for jw_c == 0, giving the wanted 0
    oh_prev = jnp.arange(nwl, dtype=jnp.int32)[None, :] == (jw_c - 1)[:, None]
    word_up = jnp.sum(jnp.where(onehot, up_rows[:, nwl:], 0), axis=1)
    pc_up_prev = jnp.sum(jnp.where(oh_prev, up_rows[:, :nwl], 0), axis=1)
    row_up_cnt = up_rows[:, nwl - 1]
    word_dn = jnp.sum(jnp.where(onehot, dn_rows[:, nwl:], 0), axis=1)
    pc_dn_prev = jnp.sum(jnp.where(oh_prev, dn_rows[:, :nwl], 0), axis=1)
    # low_mask = (1 << bit) - 1; at bit == 31 the i32 wrap yields
    # 0x7FFFFFFF, which is exactly the wanted mask
    low_mask = jnp.where(bit == 0, 0, (jnp.int32(1) << bit) - 1)
    slots = jnp.arange(k, dtype=jnp.int32)

    has_up = valid & (y_idx > 0) & (((word_up >> bit) & 1) == 1)
    rank_up = pc_up_prev + jax.lax.population_count(word_up & low_mask) + 1
    row_start_up = prev_end - row_up_cnt  # == row_end[rt - 2]
    nbu = jnp.where(has_up, row_start_up + rank_up - 1, slots).astype(jnp.int32)

    has_dn = valid & (y_idx < h - 1) & (((word_dn >> bit) & 1) == 1)
    rank_dn = pc_dn_prev + jax.lax.population_count(word_dn & low_mask) + 1
    row_start_dn = prev_end + pc_rows[:, nwl - 1]  # == row_end[rt]
    nbd = jnp.where(has_dn, row_start_dn + rank_dn - 1, slots).astype(jnp.int32)
    return pixels, nbu, nbd


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_pixels_per_frame",
        "with_neighbors",
        "gather_group_frames",
    ),
)
def compact_from_pcw_segmented(
    images: jnp.ndarray,
    pcw: jnp.ndarray,
    *,
    max_pixels_per_frame: int = 4096,
    with_neighbors: bool = False,
    gather_group_frames: int | None = None,
):
    """Batch compaction with PER-FRAME slot segments.

    Same contract as :func:`compact_from_pcw_flat` (tall linear indices
    with the (h+1)-row gap pitch, BIG padding, optional neighbour slots)
    except capacity is per frame, not shared: frame b's pixels occupy the
    static slot range [b*Kf, (b+1)*Kf) with its own BIG padding tail, so
    valid pixels and padding interleave across the K = B*Kf array.
    Downstream CC and spot tables handle that layout unchanged (padding
    slots are self-rooted and carry lin == BIG).

    Why it exists: the flat form's per-frame intensity-gather rounds each
    gather ALL K indices and select one frame's worth (the table budget
    rules out pooling Eiger frames), so B rounds cost B*K gathered
    indices.  Here round b statically slices its own (Kf,) indices —
    B*Kf = K indices total, no K-wide selects — and every other stage
    vectorises over (B, Kf) with frame-local ranks.

    Returns ``(pixels, counts)`` or ``(pixels, nbu, nbd, counts)`` where
    ``counts`` is the (B,) per-frame strong-pixel total; a frame
    overflows when ``counts[b] > max_pixels_per_frame`` (callers must
    check per frame — ``pixels.count`` still holds the batch total).
    """
    B, h, nwl2 = pcw.shape
    nwl = nwl2 // 2
    h_img, w = images.shape[-2], images.shape[-1]
    ht = h + 1
    _check_i32_sort_keys(B, ht, w)
    kf = max_pixels_per_frame

    row_counts = pcw[:, :, nwl - 1]  # (B, h)
    row_end = jnp.cumsum(row_counts, axis=1)  # (B, h) frame-local inclusive
    counts = row_end[:, -1]  # (B,)

    ks = jnp.arange(1, kf + 1, dtype=jnp.int32)[None, :]  # (1, Kf) 1-based
    valid = ks <= counts[:, None]  # (B, Kf)

    # frame-local row of the k-th pixel: per-frame histogram inversion
    b_grid = jnp.arange(B, dtype=jnp.int32)[:, None]
    dhist = jnp.zeros((B, kf + 1), jnp.int32).at[
        jnp.broadcast_to(b_grid, (B, h)), jnp.clip(row_end, 0, kf)
    ].add(1)
    y_f = jnp.cumsum(dhist, axis=1)[:, :kf]  # (B, Kf) row within frame
    y_idx = jnp.clip(y_f, 0, h - 1)
    prev_end = jnp.where(
        y_idx > 0,
        jnp.take_along_axis(row_end, jnp.clip(y_idx - 1, 0, h - 1), axis=1),
        0,
    )
    rank = ks - prev_end  # (B, Kf) 1-based within the row

    prow = b_grid * h + y_idx  # (B, Kf) physical pcw row

    # whole-batch single row gather (pcw stages fine — see flat form)
    rows = pcw.reshape(-1, nwl2)[prow.reshape(-1)].reshape(B, kf, nwl2)
    pc_rows = rows[..., :nwl]
    w_rows = rows[..., nwl:]
    below = pc_rows < rank[..., None]
    jw = jnp.sum(below.astype(jnp.int32), axis=-1)
    jw_c = jnp.clip(jw, 0, nwl - 1)
    before = jnp.max(jnp.where(below, pc_rows, 0), axis=-1)
    lanes = jnp.arange(nwl, dtype=jnp.int32)
    onehot = lanes == jw_c[..., None]
    word = jnp.sum(jnp.where(onehot, w_rows, 0), axis=-1)
    bit = _select_bit(word, rank - before)
    col = jnp.clip(jw_c * 32 + bit, 0, w - 1)

    row_t = b_grid * ht + y_idx  # tall row
    lin = jnp.where(valid, row_t * w + col, BIG).astype(jnp.int32)

    # per-group intensity gathers: round g statically slices its own
    # frames' (gs, Kf) indices — K total gathered indices, no K-wide
    # selects.  Small detectors pool gs frames per VMEM-sized table
    # exactly like the flat form (Jungfrau: 15/group); Eiger runs gs=1.
    gs = gather_group_frames or max(
        1, (32 << 20) // (h_img * w * images.dtype.itemsize)
    )
    local = jnp.clip(
        ((b_grid % gs) * h_img + jnp.minimum(y_idx, h_img - 1)) * w + col,
        0,
        gs * h_img * w - 1,
    )
    vals = []
    for g in range(-(-B // gs)):
        tab = jax.lax.optimization_barrier(
            images[g * gs : (g + 1) * gs].reshape(-1)
        )
        lg = local[g * gs : (g + 1) * gs]
        vals.append(
            tab[jnp.clip(lg, 0, tab.shape[0] - 1)].astype(jnp.int32)
        )
    inten = jnp.where(valid, jnp.concatenate(vals, axis=0), 0)

    pixels = CompactPixels(
        lin.reshape(-1), inten.reshape(-1), jnp.sum(counts)
    )
    if not with_neighbors:
        return pixels, counts

    # vertical neighbour slots (frame-local ranks; see flat form for the
    # row-slice-gather rationale) — slot = b*Kf + frame-local rank - 1
    rows2d = pcw.reshape(-1, nwl2)
    pflat = prow.reshape(-1)
    up_rows = rows2d[jnp.clip(pflat - 1, 0, B * h - 1)].reshape(B, kf, nwl2)
    dn_rows = rows2d[jnp.clip(pflat + 1, 0, B * h - 1)].reshape(B, kf, nwl2)
    oh_prev = lanes == (jw_c - 1)[..., None]
    word_up = jnp.sum(jnp.where(onehot, up_rows[..., nwl:], 0), axis=-1)
    pc_up_prev = jnp.sum(jnp.where(oh_prev, up_rows[..., :nwl], 0), axis=-1)
    row_up_cnt = up_rows[..., nwl - 1]
    word_dn = jnp.sum(jnp.where(onehot, dn_rows[..., nwl:], 0), axis=-1)
    pc_dn_prev = jnp.sum(jnp.where(oh_prev, dn_rows[..., :nwl], 0), axis=-1)

    low_mask = jnp.where(bit == 0, 0, (jnp.int32(1) << bit) - 1)
    slots = jnp.arange(B * kf, dtype=jnp.int32).reshape(B, kf)
    seg0 = b_grid * kf  # first slot of each frame's segment

    has_up = valid & (y_idx > 0) & (((word_up >> bit) & 1) == 1)
    rank_up = pc_up_prev + jax.lax.population_count(word_up & low_mask) + 1
    row_start_up = prev_end - row_up_cnt
    nbu = jnp.where(has_up, seg0 + row_start_up + rank_up - 1, slots).astype(
        jnp.int32
    )

    has_dn = valid & (y_idx < h - 1) & (((word_dn >> bit) & 1) == 1)
    rank_dn = pc_dn_prev + jax.lax.population_count(word_dn & low_mask) + 1
    row_start_dn = prev_end + pc_rows[..., nwl - 1]
    nbd = jnp.where(has_dn, seg0 + row_start_dn + rank_dn - 1, slots).astype(
        jnp.int32
    )
    return pixels, nbu.reshape(-1), nbd.reshape(-1), counts


@functools.partial(jax.jit, static_argnames=("max_pixels", "with_neighbors"))
def compact_from_pcw(
    image: jnp.ndarray,
    pcw: jnp.ndarray,
    *,
    max_pixels: int = 32768,
    with_neighbors: bool = False,
):
    """Single-frame combined-row compaction (plain raster linear indices;
    see :func:`compact_from_words` for why B == 1 tall indices coincide)."""
    return compact_from_pcw_flat(
        image[None],
        pcw[None],
        max_pixels_total=max_pixels,
        with_neighbors=with_neighbors,
    )
