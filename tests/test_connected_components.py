"""Device 2D CC + host 3D merge vs scipy.ndimage reference labelling."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy import ndimage

from ffs_tpu.ops import cc3d
from ffs_tpu.ops import connected_components as cc

S4 = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])  # 4-connectivity
S6 = np.zeros((3, 3, 3), int)  # 6-connectivity
S6[1] = S4
S6[0, 1, 1] = S6[2, 1, 1] = 1


def _partition(labels, mask):
    """Canonical partition: map each component to its sorted pixel tuple."""
    out = {}
    for lab in np.unique(labels[mask]):
        out.setdefault(lab, [])
    ys, xs = np.nonzero(mask)
    for y, x in zip(ys, xs):
        out[labels[y, x]].append((y, x))
    return sorted(tuple(sorted(v)) for v in out.values())


def _sparse_label_image(strong, image):
    """Root-linear-index label image from the sparse device path."""
    pixels, root_slot = _label(strong, image)
    root_lin = np.asarray(pixels.linear_index[root_slot])
    lin = np.asarray(pixels.linear_index)
    n = int(pixels.count)
    out = np.full(strong.shape, -1, dtype=np.int64)
    out.reshape(-1)[lin[:n]] = root_lin[:n]
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_label_sparse_matches_scipy(seed):
    rng = np.random.default_rng(seed)
    strong = rng.random((64, 96)) < 0.2
    image = rng.integers(1, 100, size=strong.shape).astype(np.uint16)
    got = _sparse_label_image(strong, image)
    want, _ = ndimage.label(strong, structure=S4)
    assert _partition(got, strong) == _partition(want, strong)


def test_label_dense_matches_scipy():
    rng = np.random.default_rng(0)
    strong = rng.random((64, 96)) < 0.2
    got = np.asarray(cc.label_components_2d(jnp.asarray(strong)))
    want, _ = ndimage.label(strong, structure=S4)
    assert _partition(got, strong) == _partition(want, strong)


def test_label_2d_spiral():
    # a long snaking component stresses the propagation convergence
    strong = np.zeros((32, 32), bool)
    strong[0, :] = True
    strong[:, -1] = True
    strong[-1, :] = True
    strong[2:-1, 0] = True  # broken at (1, 0): still one component? no - two
    image = np.ones((32, 32), np.uint16)
    got = _sparse_label_image(strong, image)
    want, _ = ndimage.label(strong, structure=S4)
    assert _partition(got, strong) == _partition(want, strong)


def _label(strong, image, max_pixels=4096):
    pixels = cc.compact_strong_pixels(
        jnp.asarray(strong), jnp.asarray(image), max_pixels=max_pixels
    )
    root_slot = cc.label_compact_pixels(pixels, width=strong.shape[1])
    return pixels, root_slot


def _frame_pixels(strong, image):
    pixels, root_slot = _label(strong, image)
    root_lin = pixels.linear_index[root_slot]
    n = int(pixels.count)
    return cc3d.FramePixels(
        linear_index=np.asarray(pixels.linear_index[:n]),
        intensity=np.asarray(pixels.intensity[:n]),
        root=np.asarray(root_lin[:n]),
    )


def test_spot_table_2d(rng):
    strong = rng.random((48, 80)) < 0.15
    image = rng.integers(1, 1000, size=(48, 80)).astype(np.uint16)
    pixels, root_slot = _label(strong, image)
    table = cc.spot_table_from_pixels(pixels, root_slot, width=80, max_spots=1024)

    want, n_want = ndimage.label(strong, structure=S4)
    assert int(table.n_spots) == n_want

    # stats vs direct computation per component, matched by bounding box
    got = {}
    for i in range(n_want):
        ys, xs = np.nonzero(want == i + 1)
        inten = image[ys, xs].astype(np.float64)
        key = (ys.min(), xs.min(), ys.max(), xs.max())
        got[key] = (
            len(ys),
            inten.sum(),
            (inten * (xs + 0.5)).sum() / inten.sum(),
            (inten * (ys + 0.5)).sum() / inten.sum(),
        )
    for s in range(n_want):
        key = (
            int(table.y_min[s]),
            int(table.x_min[s]),
            int(table.y_max[s]),
            int(table.x_max[s]),
        )
        n_px, sum_i, comx, comy = got[key]
        assert int(table.n_pixels[s]) == n_px
        assert float(table.sum_intensity[s]) == pytest.approx(sum_i)
        assert float(table.com_x[s]) == pytest.approx(comx)
        assert float(table.com_y[s]) == pytest.approx(comy)


def test_peak_tie_break():
    # two pixels with equal max intensity: pick smallest (z, y, x)
    strong = np.zeros((8, 8), bool)
    strong[2, 2:5] = True
    image = np.zeros((8, 8), np.uint16)
    image[2, 2:5] = [7, 9, 9]
    pixels, root_slot = _label(strong, image, max_pixels=64)
    table = cc.spot_table_from_pixels(pixels, root_slot, width=8, max_spots=16)
    assert int(table.n_spots) == 1
    assert (int(table.peak_x[0]), int(table.peak_y[0])) == (3, 2)


@pytest.mark.parametrize("seed", [0, 3])
def test_3d_merge_matches_scipy(seed):
    rng = np.random.default_rng(seed)
    nz, h, w = 6, 40, 56
    stack = rng.random((nz, h, w)) < 0.12
    image = rng.integers(1, 500, size=(nz, h, w)).astype(np.uint16)

    frames = [_frame_pixels(stack[z], image[z]) for z in range(nz)]
    spots = cc3d.merge_frames(frames, width=w)

    want, n_want = ndimage.label(stack, structure=S6)
    assert len(spots) == n_want

    # match components by their full pixel sets
    want_parts = {}
    for lab in range(1, n_want + 1):
        zs, ys, xs = np.nonzero(want == lab)
        want_parts[tuple(sorted(zip(zs, ys, xs)))] = lab
    for s in range(len(spots)):
        sel = spots.pixel_spot == s
        part = tuple(
            sorted(
                zip(spots.pixel_z[sel], spots.pixel_y[sel], spots.pixel_x[sel])
            )
        )
        assert part in want_parts

    # COM spot check against direct per-component computation
    for s in [0, len(spots) - 1]:
        sel = spots.pixel_spot == s
        inten = spots.pixel_intensity[sel]
        assert spots.com_z[s] == pytest.approx(
            (inten * (spots.pixel_z[sel] + 0.5)).sum() / inten.sum()
        )


def test_filters():
    strong = np.zeros((16, 16), bool)
    strong[2, 2] = True  # size-1 spot
    strong[8:11, 8:11] = True  # 9-pixel spot
    image = np.ones((16, 16), np.uint16)
    image[8, 8] = 100  # peak far from COM? COM pulled toward (8,8)
    frames = [_frame_pixels(strong, image)]
    spots = cc3d.merge_frames(frames, width=16)
    keep, n_size, n_sep = cc3d.filter_spots(spots, 3, 2.0)
    assert n_size == 1 and keep.sum() == 1

    # device-side filters agree
    pixels, root_slot = _label(strong, image, max_pixels=256)
    table = cc.spot_table_from_pixels(pixels, root_slot, width=16, max_spots=64)
    keep_d, n_size_d, n_sep_d = cc.filter_spots(table, 3, 2.0)
    assert int(n_size_d) == 1
    assert int(keep_d.sum()) == 1


def test_flat_batch_pipeline_matches_per_frame():
    """compact_from_rowcum_flat + frame_rows tabulation == per-frame loop."""
    import jax.numpy as jnp

    from ffs_tpu.ops import dispersion as jops
    from ffs_tpu.ops.compact import compact_from_rowcum, compact_from_rowcum_flat

    rng = np.random.default_rng(5)
    B, H, W = 3, 256, 320
    imgs = rng.poisson(2.0, (B, H, W)).astype(np.uint16)
    for b in range(B):
        for _ in range(40):
            y, x = rng.integers(4, H - 4), rng.integers(4, W - 4)
            imgs[b, y - 1 : y + 2, x - 1 : x + 2] += rng.poisson(
                60, (3, 3)
            ).astype(np.uint16)
    # spots touching frame edges stress the virtual gap row
    imgs[0, H - 2 : H, 100:103] += 500
    imgs[1, 0:2, 100:103] += 500
    mask = jnp.ones((H, W), jnp.uint8)
    strong = jops.dispersion(jnp.asarray(imgs), mask, 65535.0, dtype=jnp.float32)
    rowcum = jnp.cumsum(strong.astype(jnp.int32), axis=2)

    pf = compact_from_rowcum_flat(jnp.asarray(imgs), rowcum, max_pixels_total=8192)
    slotf = cc.label_compact_pixels(pf, width=W)
    tf = cc.spot_table_from_pixels(
        pf, slotf, width=W, max_spots=4096, dtype=jnp.float64, frame_rows=H
    )
    keepf, _, _ = cc.filter_spots(tf, 3, 2.0)
    Sf = int(tf.n_spots)

    rows = []
    for b in range(B):
        p = compact_from_rowcum(jnp.asarray(imgs[b]), rowcum[b], max_pixels=4096)
        slot = cc.label_compact_pixels(p, width=W)
        t = cc.spot_table_from_pixels(
            p, slot, width=W, max_spots=2048, dtype=jnp.float64
        )
        keep, _, _ = cc.filter_spots(t, 3, 2.0)
        for i in range(int(t.n_spots)):
            rows.append(
                (b, float(t.com_x[i]), float(t.com_y[i]), int(t.n_pixels[i]),
                 int(t.x_min[i]), int(t.x_max[i]), int(t.y_min[i]),
                 int(t.y_max[i]), int(t.peak_x[i]), int(t.peak_y[i]),
                 float(t.sum_intensity[i]), bool(keep[i]))
            )
    rows_flat = [
        (int(tf.z_min[i]), float(tf.com_x[i]), float(tf.com_y[i]),
         int(tf.n_pixels[i]), int(tf.x_min[i]), int(tf.x_max[i]),
         int(tf.y_min[i]), int(tf.y_max[i]), int(tf.peak_x[i]),
         int(tf.peak_y[i]), float(tf.sum_intensity[i]), bool(keepf[i]))
        for i in range(Sf)
    ]
    assert len(rows) == Sf
    assert rows == rows_flat
    for i in range(Sf):
        assert int(tf.z_max[i]) == int(tf.z_min[i])
        assert abs(float(tf.com_z[i]) - (int(tf.z_min[i]) + 0.5)) < 1e-12


def test_host_cc2d_matches_device():
    """The C++ host union-find reproduces the device path bit-exactly."""
    import jax.numpy as jnp

    from ffs_tpu.ops import cc2d_host as hc
    from ffs_tpu.ops import dispersion as jops

    rng = np.random.default_rng(1)
    H, W = 512, 640
    img = rng.poisson(2.0, (H, W)).astype(np.uint16)
    for _ in range(120):
        y, x = rng.integers(5, H - 5), rng.integers(5, W - 5)
        img[y - 2 : y + 3, x - 2 : x + 3] += rng.poisson(50, (5, 5)).astype(
            np.uint16
        )
    mask = jnp.ones((H, W), jnp.uint8)
    strong = jops.dispersion(jnp.asarray(img), mask, 65535.0, dtype=jnp.float32)
    p = cc.compact_strong_pixels(strong, jnp.asarray(img), max_pixels=16384)
    slot = cc.label_compact_pixels(p, width=W)
    t = cc.spot_table_from_pixels(
        p, slot, width=W, max_spots=16384, dtype=jnp.float64
    )
    keep_d, ns_d, nsep_d = cc.filter_spots(t, 3, 2.0)

    n = int(p.count)
    h = hc.cc2d(np.asarray(p.linear_index[:n]), np.asarray(p.intensity[:n]), W)
    keep_h, ns_h, nsep_h = hc.filter_spots_host(h, 3, 2.0)
    S = h.n_spots
    assert S == int(t.n_spots) and S > 50
    np.testing.assert_array_equal(np.asarray(p.linear_index[slot])[:n], h.root_lin)
    for dv, hv in [
        (t.n_pixels, h.n_pixels), (t.sum_intensity, h.sum_intensity),
        (t.com_x, h.com_x), (t.com_y, h.com_y),
        (t.x_min, h.x_min), (t.x_max, h.x_max),
        (t.y_min, h.y_min), (t.y_max, h.y_max),
        (t.peak_x, h.peak_x), (t.peak_y, h.peak_y),
    ]:
        np.testing.assert_allclose(np.asarray(dv)[:S], hv, rtol=1e-12)
    assert (int(ns_d), int(nsep_d)) == (ns_h, nsep_h)
    np.testing.assert_array_equal(np.asarray(keep_d)[:S], keep_h)


def test_union_edges_matches_sequential(rng):
    """Batched min-hook union must produce the same partition as
    sequential keep-smaller-root unions on a random edge soup."""
    from ffs_tpu.ops.cc3d import _UnionFind

    n = 500
    u = rng.integers(0, n, 2000)
    v = rng.integers(0, n, 2000)

    seq = _UnionFind(n)
    for a, b in zip(u.tolist(), v.tolist()):
        seq.union(a, b)
    batch = _UnionFind(n)
    batch.union_edges(u, v)

    idx = np.arange(n)
    np.testing.assert_array_equal(seq.find_all(idx), batch.find_all(idx))


@pytest.mark.parametrize("kf", [640, 1024])  # non-pow2 (JF) + pow2 moduli
def test_spot_table_peak_key_bit_parity(kf):
    """peak_key_slots folds the peak tie-break into the bbox segment_max;
    the table must stay BIT-identical to the two-op path — segmented
    per-frame slot layout, planted intensity ties included."""
    rng = np.random.default_rng(7)
    B, H, W = 3, 48, 96
    ht = H + 1
    stack = rng.random((B, H, W)) < 0.10
    image = rng.integers(1, 200, size=(B, H, W)).astype(np.uint16)
    # planted flat-top spots: equal max intensity across several pixels
    # (cleared guard band so noise never merges into the planted spots)
    stack[:, 8:15, :] = False
    for b in range(B):
        stack[b, 10:13, 20 + 5 * b : 23 + 5 * b] = True
        image[b, 10:13, 20 + 5 * b : 23 + 5 * b] = 65535  # u16 extreme
    # build the segmented slot layout by hand: frame b owns [b*kf, (b+1)*kf)
    lin = np.full(B * kf, cc.BIG, np.int64)
    inten = np.zeros(B * kf, np.int32)
    for b in range(B):
        ys, xs = np.nonzero(stack[b])
        assert len(ys) <= kf
        tall = (b * ht + ys) * W + xs  # raster order within the frame
        lin[b * kf : b * kf + len(ys)] = tall
        inten[b * kf : b * kf + len(ys)] = image[b, ys, xs]
    pixels = cc.CompactPixels(
        jnp.asarray(lin, jnp.int32),
        jnp.asarray(inten),
        jnp.int32(int(stack.sum())),
    )
    root = cc.label_compact_pixels(pixels, width=W)
    t0 = cc.spot_table_from_pixels(
        pixels, root, width=W, max_spots=2048, frame_rows=H
    )
    t1 = cc.spot_table_from_pixels(
        pixels, root, width=W, max_spots=2048, frame_rows=H,
        peak_key_slots=kf,
    )
    for f in t0._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(t0, f)), np.asarray(getattr(t1, f)), err_msg=f
        )
    # the planted ties must resolve to the smallest (z, y, x)
    ns = int(t0.n_spots)
    planted = [
        s for s in range(ns)
        if int(t1.n_pixels[s]) == 9 and float(t1.sum_intensity[s]) == 9 * 65535
    ]
    assert len(planted) == B
    for b, s in enumerate(sorted(planted, key=lambda s: int(t1.peak_z[s]))):
        assert (
            int(t1.peak_x[s]), int(t1.peak_y[s]), int(t1.peak_z[s])
        ) == (20 + 5 * b, 10, b)


def test_spot_table_peak_key_flat_layout_bit_parity():
    """peak_key_slots=K on a FLAT multi-frame layout (global-rank slots,
    not per-frame segments): the slot reconstruction must not add z*K —
    regression for the review finding where every z>=1 spot's peak
    indexed a BIG padding slot."""
    rng = np.random.default_rng(9)
    B, H, W = 3, 48, 96
    ht = H + 1
    stack = rng.random((B, H, W)) < 0.08
    image = rng.integers(1, 200, size=(B, H, W)).astype(np.uint16)
    stack[:, 8:15, :] = False
    for b in range(B):
        stack[b, 10:13, 20 + 5 * b : 23 + 5 * b] = True
        image[b, 10:13, 20 + 5 * b : 23 + 5 * b] = 65535
    # FLAT layout: all strong pixels dense at the front in tall raster order
    talls = []
    intens = []
    for b in range(B):
        ys, xs = np.nonzero(stack[b])
        talls.append((b * ht + ys) * W + xs)
        intens.append(image[b, ys, xs])
    tall = np.concatenate(talls)
    inten = np.concatenate(intens).astype(np.int32)
    K = 4096
    lin = np.full(K, cc.BIG, np.int64)
    lin[: len(tall)] = tall
    vals = np.zeros(K, np.int32)
    vals[: len(tall)] = inten
    pixels = cc.CompactPixels(
        jnp.asarray(lin, jnp.int32), jnp.asarray(vals), jnp.int32(len(tall))
    )
    root = cc.label_compact_pixels(pixels, width=W)
    t0 = cc.spot_table_from_pixels(
        pixels, root, width=W, max_spots=2048, frame_rows=H
    )
    t1 = cc.spot_table_from_pixels(
        pixels, root, width=W, max_spots=2048, frame_rows=H,
        peak_key_slots=K,
    )
    for f in t0._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(t0, f)), np.asarray(getattr(t1, f)), err_msg=f
        )
    # the z>=1 planted flat-top spots are the regression surface
    ns = int(t0.n_spots)
    planted = [
        s for s in range(ns)
        if int(t1.n_pixels[s]) == 9 and float(t1.sum_intensity[s]) == 9 * 65535
    ]
    assert len(planted) == B
    for b, s in enumerate(sorted(planted, key=lambda s: int(t1.peak_z[s]))):
        assert (
            int(t1.peak_x[s]), int(t1.peak_y[s]), int(t1.peak_z[s])
        ) == (20 + 5 * b, 10, b)


def test_spot_table_peak_key_rejects_wide_slots():
    pixels = cc.CompactPixels(
        jnp.full(8, cc.BIG, jnp.int32), jnp.zeros(8, jnp.int32), jnp.int32(0)
    )
    root = jnp.arange(8, dtype=jnp.int32)
    with pytest.raises(ValueError, match="peak_key_slots"):
        cc.spot_table_from_pixels(
            pixels, root, width=16, max_spots=8, peak_key_slots=65536
        )


# ---------------------------------------------------------------------------
# Streaming 3D merge (VERDICT r4 item 5)
# ---------------------------------------------------------------------------


def _synthetic_collection(rng, n_frames, width=256, height=200, n_seed=12):
    """Per-frame FramePixels with deliberate multi-frame spots: each seed
    spot persists over a random z-span at fixed (x, y) footprint, so many
    components span frames (incl. runs longer than two frames)."""
    from ffs_tpu.ops.cc3d import FramePixels

    spans = []
    for _ in range(n_seed):
        z0 = rng.integers(0, n_frames - 1)
        spans.append(
            (
                int(z0),
                int(min(n_frames, z0 + rng.integers(1, 9))),
                int(rng.integers(2, width - 4)),
                int(rng.integers(2, height - 4)),
            )
        )
    frames = []
    for z in range(n_frames):
        pts = set()
        for z0, z1, x, y in spans:
            if z0 <= z < z1:
                for dx in range(2):
                    for dy in range(2):
                        pts.add((x + dx, y + dy))
        # plus per-frame singles
        for _ in range(rng.integers(0, 6)):
            pts.add(
                (int(rng.integers(0, width)), int(rng.integers(0, height)))
            )
        lin = np.asarray(sorted(y * width + x for x, y in pts), np.int64)
        inten = (lin % 91 + 1 + z).astype(np.int64)
        # 2D roots: simple row-major union of 4-neighbours via the host CC
        from ffs_tpu.ops.cc2d_host import cc2d

        t = cc2d(lin, inten, width)
        frames.append(
            FramePixels(linear_index=lin, intensity=inten, root=t.root_lin)
        )
    return frames


def test_streaming_merge_bit_identical_to_batch():
    from ffs_tpu.ops.cc3d import StreamingMerger3D, merge_frames

    rng = np.random.default_rng(5)
    frames = _synthetic_collection(rng, 40)
    width = 256
    want = merge_frames(frames, width=width)

    m = StreamingMerger3D(width, keep_pixels=True)
    m.push_frames(frames)
    got = m.finalize()

    assert len(got) == len(want) > 0
    for field in (
        "n_pixels", "sum_intensity", "com_x", "com_y", "com_z",
        "x_min", "x_max", "y_min", "y_max", "z_min", "z_max",
        "peak_x", "peak_y", "peak_z", "peak_intensity",
    ):
        np.testing.assert_array_equal(
            getattr(got, field), getattr(want, field), err_msg=field
        )
    # pixel-level membership identical too (keep_pixels mode)
    np.testing.assert_array_equal(got.pixel_spot, want.pixel_spot)
    np.testing.assert_array_equal(got.pixel_x, want.pixel_x)
    np.testing.assert_array_equal(got.pixel_z, want.pixel_z)
    # multi-frame components really exist
    assert (want.z_max - want.z_min >= 3).any()


def test_streaming_merge_stats_only_matches_batch():
    """Production mode: no pixel retention; per-spot stats still
    bit-identical, and the close hook sees every spot exactly once with
    its pixels."""
    from ffs_tpu.ops.cc3d import StreamingMerger3D, merge_frames

    rng = np.random.default_rng(7)
    frames = _synthetic_collection(rng, 60)
    width = 256
    want = merge_frames(frames, width=width)

    seen = []
    m = StreamingMerger3D(width, on_spot_closed=lambda r: seen.append(r))
    m.push_frames(frames)
    got = m.finalize()

    assert len(got) == len(want)
    for field in (
        "n_pixels", "sum_intensity", "com_x", "com_y", "com_z",
        "x_min", "x_max", "y_min", "y_max", "z_min", "z_max",
        "peak_x", "peak_y", "peak_z", "peak_intensity",
    ):
        np.testing.assert_array_equal(
            getattr(got, field), getattr(want, field), err_msg=field
        )
    assert len(got.pixel_spot) == 0  # pixels were freed, not retained
    assert len(seen) == len(want)
    total_px = sum(len(r["pixel_linear_index"]) for r in seen)
    assert total_px == int(want.n_pixels.sum())


def test_streaming_merge_memory_bounded_by_open_components():
    """Pixels of CLOSED components are freed as the stream advances."""
    from ffs_tpu.ops.cc3d import StreamingMerger3D

    rng = np.random.default_rng(9)
    frames = _synthetic_collection(rng, 80)
    m = StreamingMerger3D(256)
    high_water = 0
    for f in frames:
        m.push_frame(f)
        high_water = max(high_water, m.retained_pixels)
    total = sum(len(f.linear_index) for f in frames)
    # the open set never holds more than ~a dozen frames' worth of
    # pixels (close sweeps run every 4 frames; spans reach 8 frames)
    assert high_water < total / 3
    m.finalize()
