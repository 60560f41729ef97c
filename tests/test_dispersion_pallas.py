"""Pallas fused kernel (interpret mode on CPU) vs the f32 jnp path."""

import jax.numpy as jnp
import numpy as np

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
