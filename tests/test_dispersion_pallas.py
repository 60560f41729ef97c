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
