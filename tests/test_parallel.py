"""Multi-device sharding on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ffs_tpu.ops import dispersion as dops
from ffs_tpu.parallel import (
    halo_sharded_dispersion,
    make_mesh,
    shard_frames,
    sharded_spotfind_counts,
)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_dp_counts_match_single_device(mesh, rng):
    h, w = 64, 256
    frames = rng.poisson(3.0, size=(16, h, w)).astype(np.uint16)
    frames[:, 30:33, 100:103] = 900
    mask = np.ones((h, w), np.uint8)
    per_frame, total = sharded_spotfind_counts(
        mesh, jnp.asarray(frames), jnp.asarray(mask), 65535.0
    )
    assert int(total) == int(np.asarray(per_frame).sum()) > 0
    # single-device reference
    want = np.asarray(
        dops.dispersion(jnp.asarray(frames), jnp.asarray(mask), 65535.0,
                        dtype=jnp.float32)
    ).sum(axis=(1, 2))
    np.testing.assert_array_equal(np.asarray(per_frame), want)


def test_halo_sharded_dispersion_bit_identical(mesh, rng):
    h, w = 128, 192  # 128 rows / 8 shards = 16 rows per shard
    image = rng.poisson(4.0, size=(h, w)).astype(np.uint16)
    image[60:64, 90:94] = 700  # spot spanning a shard boundary (rows 63/64)
    mask = np.ones((h, w), np.uint8)
    got = np.asarray(
        halo_sharded_dispersion(mesh, jnp.asarray(image), jnp.asarray(mask), 65535.0)
    )
    want = np.asarray(
        dops.dispersion(jnp.asarray(image), jnp.asarray(mask), 65535.0,
                        dtype=jnp.float32)
    )
    np.testing.assert_array_equal(got.astype(bool), want)
    assert want[60:64, 90:94].any()


def test_shard_frames_layout(mesh, rng):
    frames = jnp.asarray(rng.poisson(1.0, size=(8, 16, 32)).astype(np.uint16))
    sharded = shard_frames(mesh, frames)
    assert len(sharded.sharding.device_set) == 8


def test_sharded_packed_pipeline_matches_single_chip(small_frame):
    """The full production packed pipeline under shard_map (one chip per
    frame-shard, psum total) must agree with the single-process result."""
    import jax.numpy as jnp

    from ffs_tpu.ops import dispersion as dops
    from ffs_tpu.parallel import make_mesh, sharded_packed_pipeline

    image, mask = small_frame
    n = 4
    mesh = make_mesh(n)
    batch = np.stack([np.roll(image, 3 * i, axis=1) for i in range(2 * n)])
    per_frame, spots_per_chip, total = sharded_packed_pipeline(
        mesh,
        jnp.asarray(batch),
        jnp.asarray(mask),
        65535.0,
        max_pixels_per_chip=4096,
        max_spots_per_chip=2048,
        interpret=True,
    )
    per_frame = np.asarray(per_frame)
    want = [
        int(
            np.asarray(
                dops.dispersion(
                    jnp.asarray(f), jnp.asarray(mask), 65535.0, dtype=jnp.float32
                )
            ).sum()
        )
        for f in batch
    ]
    np.testing.assert_array_equal(per_frame, want)
    assert int(total) == sum(want)
    assert np.asarray(spots_per_chip).sum() > 0
