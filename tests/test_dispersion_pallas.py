"""Pallas fused kernel (interpret mode on CPU) vs the f32 jnp path."""

import jax.numpy as jnp
import numpy as np
import pytest

from ffs_tpu.ops import compact as comp
from ffs_tpu.ops import connected_components as cc
from ffs_tpu.ops import dispersion as jops
from ffs_tpu.ops.dispersion_pallas import dispersion_fused


def test_fused_matches_jnp_f32(small_frame):
    image, mask = small_frame
    tm = float(np.iinfo(np.uint16).max)
    strong, rowcum = dispersion_fused(
        jnp.asarray(image), jnp.asarray(mask), tm, strip=64, interpret=True
    )
    want = np.asarray(
        jops.dispersion(jnp.asarray(image), jnp.asarray(mask), tm, dtype=jnp.float32)
    )
    np.testing.assert_array_equal(np.asarray(strong).astype(bool), want)
    # rowcum really is the within-row inclusive prefix count
    np.testing.assert_array_equal(
        np.asarray(rowcum), np.cumsum(want.astype(np.int32), axis=1)
    )


def test_fused_first_pass(small_frame):
    image, mask = small_frame
    tm = float(np.iinfo(np.uint16).max)
    strong, _ = dispersion_fused(
        jnp.asarray(image),
        jnp.asarray(mask),
        tm,
        strip=64,
        signal_test=False,
        interpret=True,
    )
    want = np.asarray(
        jops.dispersion_first_pass(
            jnp.asarray(image), jnp.asarray(mask), tm, dtype=jnp.float32
        )
    )
    np.testing.assert_array_equal(np.asarray(strong).astype(bool), want)


def test_compact_from_rowcum_matches_direct(small_frame):
    image, mask = small_frame
    tm = float(np.iinfo(np.uint16).max)
    strong = jops.dispersion(jnp.asarray(image), jnp.asarray(mask), tm, dtype=jnp.float32)
    rowcum = jnp.cumsum(strong.astype(jnp.int32), axis=1)
    got = comp.compact_from_rowcum(jnp.asarray(image), rowcum, max_pixels=2048)
    want = cc.compact_strong_pixels(strong, jnp.asarray(image), max_pixels=2048)
    assert int(got.count) == int(want.count)
    np.testing.assert_array_equal(
        np.asarray(got.linear_index), np.asarray(want.linear_index)
    )
    np.testing.assert_array_equal(np.asarray(got.intensity), np.asarray(want.intensity))


def test_fused_uneven_strip(small_frame):
    # H=256 with strip=96 -> partial last strip
    image, mask = small_frame
    tm = 65535.0
    strong, _ = dispersion_fused(
        jnp.asarray(image), jnp.asarray(mask), tm, strip=96, interpret=True
    )
    want = np.asarray(
        jops.dispersion(jnp.asarray(image), jnp.asarray(mask), tm, dtype=jnp.float32)
    )
    np.testing.assert_array_equal(np.asarray(strong).astype(bool), want)


def test_extended_fused_matches_jnp_f32(small_frame):
    from ffs_tpu.ops.dispersion_extended_pallas import dispersion_extended_fused

    image, mask = small_frame
    tm = float(np.iinfo(np.uint16).max)
    strong, rowcum = dispersion_extended_fused(
        jnp.asarray(image), jnp.asarray(mask), tm, strip=64, interpret=True
    )
    want = np.asarray(
        jops.dispersion_extended(
            jnp.asarray(image), jnp.asarray(mask), tm, dtype=jnp.float32
        )
    )
    np.testing.assert_array_equal(np.asarray(strong).astype(bool), want)
    np.testing.assert_array_equal(
        np.asarray(rowcum), np.cumsum(want.astype(np.int32), axis=1)
    )
    assert want.sum() > 0


def test_fused_rowcum_only(small_frame):
    # emit_strong=False drops the dense mask output; rowcum is unchanged
    from ffs_tpu.ops.dispersion_extended_pallas import dispersion_extended_fused

    image, mask = small_frame
    tm = 65535.0
    for fused in (dispersion_fused, dispersion_extended_fused):
        _, want_rowcum = fused(
            jnp.asarray(image), jnp.asarray(mask), tm, strip=64, interpret=True
        )
        strong, rowcum = fused(
            jnp.asarray(image),
            jnp.asarray(mask),
            tm,
            strip=64,
            emit_strong=False,
            interpret=True,
        )
        assert strong is None
        np.testing.assert_array_equal(np.asarray(rowcum), np.asarray(want_rowcum))


def test_extended_fused_batched(small_frame):
    from ffs_tpu.ops.dispersion_extended_pallas import dispersion_extended_fused

    image, mask = small_frame
    tm = 65535.0
    batch = np.stack([image, (image // 2).astype(image.dtype)])
    strong, _ = dispersion_extended_fused(
        jnp.asarray(batch), jnp.asarray(mask), tm, strip=96, interpret=True
    )
    for b in range(2):
        want = np.asarray(
            jops.dispersion_extended(
                jnp.asarray(batch[b]), jnp.asarray(mask), tm, dtype=jnp.float32
            )
        )
        np.testing.assert_array_equal(np.asarray(strong[b]).astype(bool), want)


def _pack_words_np(strong: np.ndarray, nwl: int):
    """NumPy oracle for the packed-words contract of dispersion_packed."""
    h, w = strong.shape
    bits = np.zeros((h, nwl * 32), np.uint32)
    bits[:, :w] = strong.astype(np.uint32)
    words = (
        bits.reshape(h, nwl, 32) << np.arange(32, dtype=np.uint32)[None, None, :]
    ).sum(axis=2, dtype=np.uint32)
    pc = np.cumsum(bits.reshape(h, nwl, 32).sum(axis=2, dtype=np.int64), axis=1)
    return words.astype(np.int64), pc


def test_packed_matches_jnp_f32(small_frame):
    from ffs_tpu.ops.dispersion_pallas import _n_word_lanes, dispersion_packed

    image, mask = small_frame
    tm = float(np.iinfo(np.uint16).max)
    w32, pc = dispersion_packed(
        jnp.asarray(image), jnp.asarray(mask), tm, strip=64, interpret=True
    )
    want = np.asarray(
        jops.dispersion(jnp.asarray(image), jnp.asarray(mask), tm, dtype=jnp.float32)
    )
    nwl = _n_word_lanes(((image.shape[1] + 2 * 3 + 127) // 128) * 128)
    exp_words, exp_pc = _pack_words_np(want, nwl)
    got_words = np.asarray(w32).astype(np.int64) & 0xFFFFFFFF
    np.testing.assert_array_equal(got_words, exp_words)
    np.testing.assert_array_equal(np.asarray(pc), exp_pc)


def test_compact_from_words_matches_direct(small_frame):
    from ffs_tpu.ops.dispersion_pallas import _n_word_lanes

    image, mask = small_frame
    tm = float(np.iinfo(np.uint16).max)
    strong = jops.dispersion(
        jnp.asarray(image), jnp.asarray(mask), tm, dtype=jnp.float32
    )
    nwl = _n_word_lanes(((image.shape[1] + 2 * 3 + 127) // 128) * 128)
    words_np, pc_np = _pack_words_np(np.asarray(strong), nwl)
    got = comp.compact_from_words(
        jnp.asarray(image),
        jnp.asarray(words_np.astype(np.int64) & 0xFFFFFFFF, dtype=jnp.uint32).astype(jnp.int32),
        jnp.asarray(pc_np, dtype=jnp.int32),
        max_pixels=2048,
    )
    want = cc.compact_strong_pixels(strong, jnp.asarray(image), max_pixels=2048)
    assert int(got.count) == int(want.count)
    n = int(want.count)
    np.testing.assert_array_equal(
        np.asarray(got.linear_index)[:n], np.asarray(want.linear_index)[:n]
    )
    np.testing.assert_array_equal(
        np.asarray(got.intensity)[:n], np.asarray(want.intensity)[:n]
    )


def test_compact_from_words_flat_batch(small_frame):
    from ffs_tpu.ops.dispersion_pallas import _n_word_lanes

    image, mask = small_frame
    h, w = image.shape
    tm = float(np.iinfo(np.uint16).max)
    rng = np.random.default_rng(5)
    batch = np.stack([image, np.roll(image, 7, axis=1), (image // 2)])
    words_l, pc_l, strongs = [], [], []
    nwl = _n_word_lanes(((w + 2 * 3 + 127) // 128) * 128)
    for f in batch:
        s = np.asarray(
            jops.dispersion(jnp.asarray(f), jnp.asarray(mask), tm, dtype=jnp.float32)
        )
        strongs.append(s)
        wn, pn = _pack_words_np(s, nwl)
        words_l.append(wn)
        pc_l.append(pn)
    wordsb = jnp.asarray(np.stack(words_l).astype(np.int64) & 0xFFFFFFFF).astype(jnp.int32)
    pcb = jnp.asarray(np.stack(pc_l), dtype=jnp.int32)
    got = comp.compact_from_words_flat(
        jnp.asarray(batch), wordsb, pcb, max_pixels_total=8192
    )
    # oracle: tall linear indices with the (h+1)-row gap pitch
    exp = []
    for b, s in enumerate(strongs):
        ys, xs = np.nonzero(s)
        exp.extend(((b * (h + 1) + ys) * w + xs).tolist())
    n = int(got.count)
    assert n == len(exp)
    np.testing.assert_array_equal(np.asarray(got.linear_index)[:n], exp)


def test_extended_packed_matches_jnp_f32(small_frame):
    from ffs_tpu.ops.dispersion_extended_pallas import (
        _IMG,
        dispersion_extended_packed,
    )
    from ffs_tpu.ops.dispersion_pallas import _n_word_lanes

    image, mask = small_frame
    tm = float(np.iinfo(np.uint16).max)
    w32, pc = dispersion_extended_packed(
        jnp.asarray(image), jnp.asarray(mask), tm, strip=64, interpret=True
    )
    want = np.asarray(
        jops.dispersion_extended(
            jnp.asarray(image), jnp.asarray(mask), tm, dtype=jnp.float32
        )
    )
    nwl = _n_word_lanes(((image.shape[1] + 2 * _IMG + 127) // 128) * 128)
    exp_words, exp_pc = _pack_words_np(want, nwl)
    got_words = np.asarray(w32).astype(np.int64) & 0xFFFFFFFF
    np.testing.assert_array_equal(got_words, exp_words)
    np.testing.assert_array_equal(np.asarray(pc), exp_pc)


def test_compact_from_pcw_flat_matches_words_path(small_frame):
    from ffs_tpu.ops.dispersion_pallas import _n_word_lanes

    image, mask = small_frame
    h, w = image.shape
    tm = float(np.iinfo(np.uint16).max)
    batch = np.stack([image, np.roll(image, 5, axis=0)])
    nwl = _n_word_lanes(((w + 2 * 3 + 127) // 128) * 128)
    words_l, pc_l = [], []
    for f in batch:
        s = np.asarray(
            jops.dispersion(jnp.asarray(f), jnp.asarray(mask), tm, dtype=jnp.float32)
        )
        wn, pn = _pack_words_np(s, nwl)
        words_l.append(wn)
        pc_l.append(pn)
    wordsb = jnp.asarray(np.stack(words_l).astype(np.int64) & 0xFFFFFFFF).astype(jnp.int32)
    pcb = jnp.asarray(np.stack(pc_l), dtype=jnp.int32)
    pcw = jnp.concatenate([pcb, wordsb], axis=-1)

    got = comp.compact_from_pcw_flat(jnp.asarray(batch), pcw, max_pixels_total=8192)
    want = comp.compact_from_words_flat(
        jnp.asarray(batch), wordsb, pcb, max_pixels_total=8192
    )
    assert int(got.count) == int(want.count)
    n = int(want.count)
    np.testing.assert_array_equal(
        np.asarray(got.linear_index)[:n], np.asarray(want.linear_index)[:n]
    )
    np.testing.assert_array_equal(
        np.asarray(got.intensity)[:n], np.asarray(want.intensity)[:n]
    )


def test_compact_from_pcw_flat_gather_groups():
    """The VMEM-budgeted frame-group intensity gather must return the same
    pixels/intensities/neighbours for ANY group size (auto, per-frame, and
    groups that straddle frame boundaries, incl. a ragged last group)."""
    rng = np.random.default_rng(7)
    B, h, w = 5, 40, 160
    nwl = (w + 31) // 32
    strong = rng.random((B, h, w)) < 0.02
    images = rng.integers(1, 60000, size=(B, h, w)).astype(np.uint16)
    words_l, pc_l = [], []
    for b in range(B):
        wn, pn = _pack_words_np(strong[b], nwl)
        words_l.append(wn)
        pc_l.append(pn)
    pcw = jnp.concatenate(
        [
            jnp.asarray(np.stack(pc_l), dtype=jnp.int32),
            jnp.asarray(
                np.stack(words_l).astype(np.int64) & 0xFFFFFFFF
            ).astype(jnp.int32),
        ],
        axis=-1,
    )
    batch = jnp.asarray(images)
    results = {
        gg: comp.compact_from_pcw_flat(
            batch,
            pcw,
            max_pixels_total=1024,
            with_neighbors=True,
            gather_group_frames=gg,
        )
        for gg in (None, 1, 2, 5)
    }
    base_p, base_u, base_d = results[None]
    n = int(base_p.count)
    assert n == int(strong.sum())
    # intensities against the raw frames (brute force)
    ht = h + 1
    lin = np.asarray(base_p.linear_index)[:n]
    bi, yi, ci = lin // (ht * w), (lin // w) % ht, lin % w
    np.testing.assert_array_equal(
        np.asarray(base_p.intensity)[:n], images[bi, yi, ci].astype(np.int32)
    )
    for gg, (p, nbu, nbd) in results.items():
        assert int(p.count) == n, gg
        np.testing.assert_array_equal(
            np.asarray(p.linear_index)[:n], lin, err_msg=str(gg)
        )
        np.testing.assert_array_equal(
            np.asarray(p.intensity)[:n],
            np.asarray(base_p.intensity)[:n],
            err_msg=str(gg),
        )
        np.testing.assert_array_equal(
            np.asarray(nbu)[:n], np.asarray(base_u)[:n], err_msg=str(gg)
        )
        np.testing.assert_array_equal(
            np.asarray(nbd)[:n], np.asarray(base_d)[:n], err_msg=str(gg)
        )
    # row-band grouping (bands inside a frame, spanning frames, ragged
    # last band, and one band == whole batch) must match bit-for-bit too
    for gr in (7, h, h + 13, 3 * h, B * h):
        p, nbu, nbd = comp.compact_from_pcw_flat(
            batch,
            pcw,
            max_pixels_total=1024,
            with_neighbors=True,
            gather_group_rows=gr,
        )
        assert int(p.count) == n, gr
        np.testing.assert_array_equal(
            np.asarray(p.linear_index)[:n], lin, err_msg=f"rows={gr}"
        )
        np.testing.assert_array_equal(
            np.asarray(p.intensity)[:n],
            np.asarray(base_p.intensity)[:n],
            err_msg=f"rows={gr}",
        )
        np.testing.assert_array_equal(
            np.asarray(nbu)[:n], np.asarray(base_u)[:n], err_msg=f"rows={gr}"
        )
        np.testing.assert_array_equal(
            np.asarray(nbd)[:n], np.asarray(base_d)[:n], err_msg=f"rows={gr}"
        )


@pytest.mark.parametrize("cc_backend", ["host", "device"])
def test_processor_pallas_path_interpret(small_frame, cc_backend):
    """SpotfindProcessor's production Pallas packed path (tiered host-CC and
    all-device), runnable on CPU via Mosaic interpret mode, must agree with
    the plain f32 oracle pipeline."""
    from ffs_tpu.spotfind import SpotfindConfig, SpotfindProcessor

    image, mask = small_frame
    h, w = image.shape
    tm = float(np.iinfo(np.uint16).max)
    cfg = SpotfindConfig(
        precision="f32",
        use_pallas=True,
        pallas_interpret=True,
        cc_backend=cc_backend,
        max_strong_pixels=4096,
        max_spots=2048,
        min_spot_size=1,
    )
    proc = SpotfindProcessor(w, h, mask, tm, cfg)
    res = proc.process_frame(0, image)

    want = np.asarray(
        jops.dispersion(jnp.asarray(image), jnp.asarray(mask), tm, dtype=jnp.float32)
    )
    assert res.n_strong_pixels == int(want.sum())
    lin = np.sort(np.asarray(res.pixels.linear_index))
    np.testing.assert_array_equal(lin, np.flatnonzero(want.reshape(-1)))


def test_profiled_host_cc_without_pallas(small_frame):
    """process_frame_profiled with cc_backend='host' but the Pallas path
    OFF (e.g. precision='f64') must take the fused dense step like
    dispatch() does — it previously traced the Mosaic kernel with
    interpret=False, which cannot run here."""
    from ffs_tpu.spotfind import SpotfindConfig, SpotfindProcessor

    image, mask = small_frame
    h, w = image.shape
    tm = float(np.iinfo(np.uint16).max)
    cfg = SpotfindConfig(
        precision="f64",
        cc_backend="host",
        max_strong_pixels=4096,
        max_spots=2048,
        min_spot_size=1,
    )
    proc = SpotfindProcessor(w, h, mask, tm, cfg)
    assert proc.host_cc and not proc._x64_off
    res, timings = proc.process_frame_profiled(0, image)
    want = np.asarray(jops.dispersion(jnp.asarray(image), jnp.asarray(mask), tm))
    assert res.n_strong_pixels == int(want.sum()) > 0
    assert "upload" in timings and "collect" in timings


def test_compact_from_pcw_segmented_matches_flat():
    """Per-frame-segment compaction must agree with the flat form: same
    per-frame pixel sets/intensities, an equivalent neighbour graph (slot
    numbering differs; compare through linear indices), and bit-identical
    CC + spot tables."""
    from ffs_tpu.ops.compact import compact_from_pcw_segmented
    from ffs_tpu.ops.dispersion_pallas import dispersion_packed_raw

    rng = np.random.default_rng(3)
    B, H, W = 4, 70, 150
    imgs = rng.poisson(4.0, size=(B, H, W)).astype(np.uint16)
    imgs[0, 10:13, 20:23] = 900
    imgs[1, 40:44, 100:104] = 800
    imgs[2, 0:3, 0:3] = 700
    imgs[3, 67:70, 140:145] = 600
    mask = np.ones((H, W), np.uint8)
    mask[:, 50:55] = 0
    pcw = dispersion_packed_raw(
        jnp.asarray(imgs), jnp.asarray(mask), 65535.0, interpret=True,
        trim=False,
    )
    h = pcw.shape[1]
    kf = 128
    fp, fu, fd = comp.compact_from_pcw_flat(
        jnp.asarray(imgs), pcw, max_pixels_total=512, with_neighbors=True
    )
    sp, su, sd, counts = compact_from_pcw_segmented(
        jnp.asarray(imgs), pcw, max_pixels_per_frame=kf, with_neighbors=True
    )
    # grouped gather rounds (incl. ragged last group and one whole-batch
    # group) must be bit-identical to the per-frame rounds
    for gg in (2, 3, B):
        sp_g, su_g, sd_g, counts_g = compact_from_pcw_segmented(
            jnp.asarray(imgs), pcw, max_pixels_per_frame=kf,
            with_neighbors=True, gather_group_frames=gg,
        )
        np.testing.assert_array_equal(
            np.asarray(sp_g.linear_index), np.asarray(sp.linear_index),
            err_msg=f"gg={gg}",
        )
        np.testing.assert_array_equal(
            np.asarray(sp_g.intensity), np.asarray(sp.intensity),
            err_msg=f"gg={gg}",
        )
        np.testing.assert_array_equal(np.asarray(su_g), np.asarray(su))
        np.testing.assert_array_equal(np.asarray(sd_g), np.asarray(sd))
        np.testing.assert_array_equal(np.asarray(counts_g), np.asarray(counts))
    counts = np.asarray(counts)
    n = int(fp.count)
    assert int(sp.count) == n == counts.sum() > 0
    flin, slin = np.asarray(fp.linear_index), np.asarray(sp.linear_index)
    fint, sint = np.asarray(fp.intensity), np.asarray(sp.intensity)
    off = 0
    for b in range(B):
        c = counts[b]
        np.testing.assert_array_equal(
            slin[b * kf : b * kf + c], flin[off : off + c], err_msg=str(b)
        )
        np.testing.assert_array_equal(
            sint[b * kf : b * kf + c], fint[off : off + c], err_msg=str(b)
        )
        assert (slin[b * kf + c : (b + 1) * kf] == cc.BIG).all(), b
        off += c
    # neighbour graph equivalence through linear indices
    su_, sd_, fu_, fd_ = map(np.asarray, (su, sd, fu, fd))
    for s in range(B * kf):
        if slin[s] >= cc.BIG:
            continue
        fs = np.nonzero(flin == slin[s])[0][0]
        assert slin[su_[s]] == flin[fu_[fs]], s
        assert slin[sd_[s]] == flin[fd_[fs]], s
    # CC + spot tables bit-identical
    rootf = cc.label_compact_pixels(fp, width=W, neighbors=(fu, fd))
    roots = cc.label_compact_pixels(sp, width=W, neighbors=(su, sd))
    tf = cc.spot_table_from_pixels(
        fp, rootf, width=W, max_spots=256, dtype=jnp.float32, frame_rows=h
    )
    ts = cc.spot_table_from_pixels(
        sp, roots, width=W, max_spots=256, dtype=jnp.float32, frame_rows=h
    )
    ns = int(tf.n_spots)
    assert int(ts.n_spots) == ns > 0
    for f in tf._fields:
        if f == "n_spots":
            continue
        np.testing.assert_array_equal(
            np.asarray(getattr(tf, f))[:ns],
            np.asarray(getattr(ts, f))[:ns],
            err_msg=f,
        )


def test_compact_from_pcw_flat_untrimmed_padding(small_frame):
    """Strip-padded (untrimmed) pcw rows must yield the same pixels; the
    padded rows are empty and only shift the tall row pitch."""
    from ffs_tpu.ops.dispersion_pallas import dispersion_packed_raw

    image, mask = small_frame
    h, w = image.shape
    tm = float(np.iinfo(np.uint16).max)
    batch = jnp.asarray(np.stack([image, image // 2]))
    pcw_p = dispersion_packed_raw(
        batch, jnp.asarray(mask), tm, strip=64, interpret=True, trim=False
    )
    hp = pcw_p.shape[1]
    assert hp >= h
    got = comp.compact_from_pcw_flat(batch, pcw_p, max_pixels_total=4096)

    pcw_t = dispersion_packed_raw(
        batch, jnp.asarray(mask), tm, strip=64, interpret=True, trim=True
    )
    want = comp.compact_from_pcw_flat(batch, pcw_t, max_pixels_total=4096)
    n = int(want.count)
    assert int(got.count) == n
    # translate tall indices between the two pitches and compare
    gl = np.asarray(got.linear_index)[:n]
    wl = np.asarray(want.linear_index)[:n]
    gb, gr, gc = gl // ((hp + 1) * w), (gl // w) % (hp + 1), gl % w
    wb, wr, wc = wl // ((h + 1) * w), (wl // w) % (h + 1), wl % w
    np.testing.assert_array_equal(gb, wb)
    np.testing.assert_array_equal(gr, wr)
    np.testing.assert_array_equal(gc, wc)
    np.testing.assert_array_equal(
        np.asarray(got.intensity)[:n], np.asarray(want.intensity)[:n]
    )


def test_pcw_neighbors_match_sort_merge(small_frame):
    """Neighbour slots derived from packed words must reproduce the
    sort-merge CC exactly (same component roots)."""
    from ffs_tpu.ops.dispersion_pallas import dispersion_packed_raw

    image, mask = small_frame
    h, w = image.shape
    tm = float(np.iinfo(np.uint16).max)
    batch = jnp.asarray(np.stack([image, np.roll(image, 3, axis=0)]))
    pcw = dispersion_packed_raw(
        batch, jnp.asarray(mask), tm, strip=64, interpret=True, trim=False
    )
    p, nbu, nbd = comp.compact_from_pcw_flat(
        batch, pcw, max_pixels_total=4096, with_neighbors=True
    )
    root_nb = cc.label_compact_pixels(p, width=w, neighbors=(nbu, nbd))
    root_sm = cc.label_compact_pixels(p, width=w)
    n = int(p.count)
    np.testing.assert_array_equal(
        np.asarray(root_nb)[:n], np.asarray(root_sm)[:n]
    )
    # neighbour slots themselves are mutually consistent with lin math
    lin = np.asarray(p.linear_index)[:n]
    nbu_n = np.asarray(nbu)[:n]
    for i in range(n):
        if nbu_n[i] != i:
            assert lin[nbu_n[i]] == lin[i] - w


def test_packed_mbox_tree_path_matches_oracle(small_frame):
    """The mbox fast path (shared-subsum tree for the x grid) must stay
    bit-identical to the f32 oracle — integer window sums are exact under
    any summation order."""
    from ffs_tpu.ops.dispersion_pallas import (
        _n_word_lanes,
        dispersion_packed,
        mask_box_count,
    )

    image, mask = small_frame
    tm = float(np.iinfo(np.uint16).max)
    mbox = mask_box_count(jnp.asarray(mask))
    w32, pc = dispersion_packed(
        jnp.asarray(image), jnp.asarray(mask), tm, mbox=mbox, strip=64,
        interpret=True,
    )
    want = np.asarray(
        jops.dispersion(jnp.asarray(image), jnp.asarray(mask), tm, dtype=jnp.float32)
    )
    nwl = _n_word_lanes(((image.shape[1] + 2 * 3 + 127) // 128) * 128)
    exp_words, exp_pc = _pack_words_np(want, nwl)
    np.testing.assert_array_equal(
        np.asarray(w32).astype(np.int64) & 0xFFFFFFFF, exp_words
    )
    np.testing.assert_array_equal(np.asarray(pc), exp_pc)


def test_extended_packed_mbox_matches_oracle(small_frame):
    from ffs_tpu.ops.dispersion_extended_pallas import (
        dispersion_extended_packed,
        dispersion_extended_packed_raw,
        mask_box_count_extended,
    )

    image, mask = small_frame
    tm = float(np.iinfo(np.uint16).max)
    mbox = mask_box_count_extended(jnp.asarray(mask), strip=64)
    pcw = dispersion_extended_packed_raw(
        jnp.asarray(image), jnp.asarray(mask), tm, mbox=mbox, strip=64,
        interpret=True,
    )
    w32_ref, pc_ref = dispersion_extended_packed(
        jnp.asarray(image), jnp.asarray(mask), tm, strip=64, interpret=True
    )
    nwl = pcw.shape[-1] // 2
    np.testing.assert_array_equal(np.asarray(pcw[..., nwl:]), np.asarray(w32_ref))
    np.testing.assert_array_equal(np.asarray(pcw[..., :nwl]), np.asarray(pc_ref))


def test_packed_roll_trees_match_slice_trees(small_frame):
    """The full-register roll lowering (production default with mbox) is
    bit-identical to the slice lowering: same float addition order, only
    the shift mechanics differ (tools/measure_roll.py verifies the same
    on hardware, where Mosaic lowers the two differently)."""
    from ffs_tpu.ops.dispersion_pallas import (
        dispersion_packed_raw,
        mask_box_count,
    )

    image, mask = small_frame
    tm = float(np.iinfo(np.uint16).max)
    mbox = mask_box_count(jnp.asarray(mask))
    kw = dict(mbox=mbox, strip=64, interpret=True)
    a = dispersion_packed_raw(
        jnp.asarray(image), jnp.asarray(mask), tm, tree_impl="slice", **kw
    )
    b = dispersion_packed_raw(
        jnp.asarray(image), jnp.asarray(mask), tm, tree_impl="roll", **kw
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_extended_roll_trees_match_slice_trees(small_frame):
    from ffs_tpu.ops.dispersion_extended_pallas import (
        dispersion_extended_packed_raw,
        mask_box_count_extended,
    )

    image, mask = small_frame
    tm = float(np.iinfo(np.uint16).max)
    mbox = mask_box_count_extended(jnp.asarray(mask), strip=64)
    kw = dict(mbox=mbox, strip=64, interpret=True)
    a = dispersion_extended_packed_raw(
        jnp.asarray(image), jnp.asarray(mask), tm, tree_impl="slice", **kw
    )
    b = dispersion_extended_packed_raw(
        jnp.asarray(image), jnp.asarray(mask), tm, tree_impl="roll", **kw
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_packed_u32_saturation_matches_oracle():
    """u32 values >= 2^31 (saturation/gap sentinels) must be rejected by
    the trusted_max gate, not wrapped negative through the i32 widening
    (regression: the kernels' .astype(i32) hop wrapped them, letting a
    saturated pixel pass `src <= trusted_max` and poison every
    neighbour's window sums; the wrapper now pre-casts u32 -> f32 exactly
    like the jnp oracle)."""
    from ffs_tpu.ops.dispersion_extended_pallas import (
        dispersion_extended_packed_raw,
    )
    from ffs_tpu.ops.dispersion_pallas import (
        _n_word_lanes,
        dispersion_packed_raw,
    )

    rng = np.random.default_rng(4)
    h, w = 64, 256
    image = rng.integers(0, 100, size=(h, w)).astype(np.uint32)
    image[10, 50] = 0xFFFFFFFF  # saturated sentinel, UNMASKED
    image[50, 200] = 2**31  # wraps negative under an i32 hop
    image[28:35, 98:105] = 5000  # a real spot nearby
    mask = np.ones((h, w), np.uint8)
    tm = 65535.0

    for raw_fn, oracle, nwl_w in (
        (dispersion_packed_raw, jops.dispersion, 2 * 3),
        (
            dispersion_extended_packed_raw,
            jops.dispersion_extended,
            2 * 10,
        ),
    ):
        pcw = raw_fn(
            jnp.asarray(image), jnp.asarray(mask), tm, interpret=True
        )
        nwl = _n_word_lanes(((w + nwl_w + 127) // 128) * 128)
        want = np.asarray(
            oracle(jnp.asarray(image), jnp.asarray(mask), tm, dtype=jnp.float32)
        )
        exp_words, exp_pc = _pack_words_np(want, nwl)
        got_words = np.asarray(pcw[:, nwl:]).astype(np.int64) & 0xFFFFFFFF
        np.testing.assert_array_equal(got_words, exp_words)
        np.testing.assert_array_equal(np.asarray(pcw[:, :nwl]), exp_pc)
        # the sentinels themselves must NOT be strong, and the fixture
        # must be non-trivial (strong pixels exist for the parity words
        # to disagree on if the wrap regressed)
        assert not want[10, 50] and not want[50, 200]
        assert want.sum() > 0
