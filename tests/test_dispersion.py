"""Dispersion threshold: JAX ops vs the NumPy DIALS-form oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from ffs_tpu.ops import dispersion as jops
from ffs_tpu.ops import reference as ref


def test_box_sum_matches_brute_force(rng):
    arr = rng.integers(0, 100, size=(17, 23)).astype(np.int64)
    for radius in (1, 2, 3, 5):
        got = np.asarray(jops.box_sum(jnp.asarray(arr), radius))
        want = np.zeros_like(arr)
        h, w = arr.shape
        for y in range(h):
            for x in range(w):
                y0, y1 = max(0, y - radius), min(h, y + radius + 1)
                x0, x1 = max(0, x - radius), min(w, x + radius + 1)
                want[y, x] = arr[y0:y1, x0:x1].sum()
        np.testing.assert_array_equal(got, want)


def test_dispersion_matches_reference(small_frame):
    image, mask = small_frame
    trusted_max = float(np.iinfo(np.uint16).max)
    want = ref.dispersion(image, mask, trusted_max)
    got = np.asarray(jops.dispersion(jnp.asarray(image), jnp.asarray(mask), trusted_max))
    np.testing.assert_array_equal(got, want)
    assert want.sum() > 0, "expected some strong pixels in the synthetic frame"


def test_dispersion_extended_matches_reference(small_frame):
    image, mask = small_frame
    trusted_max = float(np.iinfo(np.uint16).max)
    want = ref.dispersion_extended(image, mask, trusted_max)
    got = np.asarray(
        jops.dispersion_extended(jnp.asarray(image), jnp.asarray(mask), trusted_max)
    )
    np.testing.assert_array_equal(got, want)
    assert want.sum() > 0


def test_dispersion_batched(small_frame):
    image, mask = small_frame
    trusted_max = float(np.iinfo(np.uint16).max)
    batch = np.stack([image, image // 2, np.zeros_like(image)])
    got = np.asarray(jops.dispersion(jnp.asarray(batch), jnp.asarray(mask), trusted_max))
    assert got.shape == batch.shape
    for i in range(3):
        want = ref.dispersion(batch[i], mask, trusted_max)
        np.testing.assert_array_equal(got[i], want)


def test_trusted_max_excludes_hot_pixels(small_frame):
    image, mask = small_frame
    image = image.copy()
    image[50, 50] = 60000  # hot pixel above trusted range
    got = np.asarray(jops.dispersion(jnp.asarray(image), jnp.asarray(mask), 40000.0))
    assert not got[50, 50]
    want = ref.dispersion(image, mask, 40000.0)
    np.testing.assert_array_equal(got, want)


def test_erosion_semantics():
    # one isolated strong pixel: a background pixel is adjacent -> eroded away
    disp = np.zeros((9, 9), dtype=bool)
    disp[4, 4] = True
    mask = np.ones((9, 9), dtype=np.uint8)
    survived = ref.erosion(disp, mask)
    assert not survived.any()
    # a large solid block: its interior (>2 px from any background) survives
    disp[2:8, 2:8] = True
    survived = ref.erosion(disp, mask)
    assert survived[4:6, 4:6].all()
    assert not survived[2, 2]
    got = np.asarray(jops.erode(jnp.asarray(disp), jnp.asarray(mask)))
    np.testing.assert_array_equal(got, survived)


def test_min_count():
    # a pixel whose window has fewer than min_count valid neighbours -> never strong
    image = np.zeros((9, 9), dtype=np.uint16)
    mask = np.zeros((9, 9), dtype=np.uint8)
    mask[4, 4] = 1
    mask[4, 5] = 1
    image[4, 4] = 1000
    got = np.asarray(jops.dispersion(jnp.asarray(image), jnp.asarray(mask), 65535.0))
    assert not got.any()


@pytest.mark.parametrize("n", [2, 5])
def test_sample_images_have_expected_structure(n):
    """Full Eiger 16M frames: jnp vs oracle on deterministic sample data."""
    from ffs_tpu.io import sample_data

    image = sample_data.generate_sample_image(n)
    mask = sample_data.generate_mask()
    trusted_max = 65535.0
    want = ref.dispersion(image, mask, trusted_max)
    got = np.asarray(jops.dispersion(jnp.asarray(image), jnp.asarray(mask), trusted_max))
    np.testing.assert_array_equal(got, want)
    if n == 2:
        # isolated I=100 pixels on a zero background are strong
        assert want.sum() > 5000
    if n == 5:
        # uniform %10 background: only module-edge pixels (small local n)
        # trigger; the count is deterministic -> regression pin
        assert want.sum() == 2388
