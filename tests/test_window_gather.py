"""Pallas window-gather kernel vs a NumPy oracle (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from ffs_tpu.ops.window_gather import window_gather


def test_window_gather_matches_numpy(rng):
    img = rng.integers(0, 60000, (512, 640)).astype(np.int32)
    a = 21  # not a multiple of the DMA batch -> exercises padding
    y0 = rng.integers(0, 512 - 32, a)
    x0 = rng.integers(0, 640 - 128, a)
    out = np.asarray(
        window_gather(
            jnp.asarray(img), jnp.asarray(y0), jnp.asarray(x0), bh=32,
            interpret=True,
        )
    )
    want = np.stack(
        [img[y0[k] : y0[k] + 32, x0[k] : x0[k] + 128] for k in range(a)]
    )
    np.testing.assert_array_equal(out, want)


def test_window_gather_float_and_edges(rng):
    img = rng.normal(size=(256, 384)).astype(np.float32)
    # windows hugging every edge, incl. the last 128-lane block (clamped
    # block start + in-tile shift path)
    y0 = np.array([0, 224, 0, 224, 100])
    x0 = np.array([0, 0, 384 - 128, 384 - 128, 255])
    out = np.asarray(
        window_gather(
            jnp.asarray(img), jnp.asarray(y0), jnp.asarray(x0), bh=32,
            interpret=True,
        )
    )
    want = np.stack(
        [img[y0[k] : y0[k] + 32, x0[k] : x0[k] + 128] for k in range(len(y0))]
    )
    np.testing.assert_array_equal(out, want)


def test_window_gather_planes(rng):
    from ffs_tpu.ops.window_gather import window_gather_planes

    img = rng.integers(0, 60000, (4, 256, 384)).astype(np.int32)
    a = 13
    y0 = rng.integers(0, 256 - 32, a)
    x0 = rng.integers(0, 384 - 128, a)
    out = np.asarray(
        window_gather_planes(
            jnp.asarray(img), jnp.asarray(y0), jnp.asarray(x0), bh=32,
            interpret=True,
        )
    )
    want = np.stack(
        [img[:, y0[k] : y0[k] + 32, x0[k] : x0[k] + 128] for k in range(a)]
    )
    np.testing.assert_array_equal(out, want)


def test_window_gather_planes_packed_matches(rng):
    """The lane-packed gather kernel must equal the XLA relayout of the
    plain kernel's output (the integrator's packed classification input)."""
    from ffs_tpu.ops.window_gather import (
        window_gather_planes,
        window_gather_planes_packed,
    )

    f, h, w = 4, 256, 384
    img = rng.integers(0, 60000, (f, h, w)).astype(np.int32)
    a = 12  # multiple of 4, not of the DMA batch -> padding path
    y0 = rng.integers(0, h - 32, a)
    x0 = rng.integers(0, w - 128, a)
    full = np.asarray(
        window_gather_planes(
            jnp.asarray(img), jnp.asarray(y0), jnp.asarray(x0), bh=32,
            interpret=True,
        )
    )
    want = (
        full[..., :32]
        .reshape(a // 4, 4, f, 32, 32)
        .transpose(0, 2, 3, 1, 4)
        .reshape(a // 4, f, 32, 128)
    )
    got = np.asarray(
        window_gather_planes_packed(
            jnp.asarray(img), jnp.asarray(y0), jnp.asarray(x0), bh=32,
            interpret=True,
        )
    )
    np.testing.assert_array_equal(got, want)


def test_window_gather_planes_plane_last_matches(rng):
    """The plane-last layout variant (measured neutral on v5e; kept as
    the probe-harness record) must stay bit-identical to plane-first."""
    import jax

    from ffs_tpu.ops.window_gather import (
        window_gather_planes,
        window_gather_planes_pl,
    )

    f, h, w = 3, 256, 384
    img = rng.integers(0, 60000, (f, h, w)).astype(np.int32)
    a = 11
    y0 = rng.integers(0, h - 32, a)
    x0 = rng.integers(0, w - 128, a)
    to_pl = jax.jit(
        lambda fr: fr.reshape(f, h, w // 128, 128).transpose(1, 2, 0, 3)
    )
    want = np.asarray(
        window_gather_planes(
            jnp.asarray(img), jnp.asarray(y0), jnp.asarray(x0), bh=32,
            interpret=True,
        )
    )
    got = np.asarray(
        window_gather_planes_pl(
            to_pl(jnp.asarray(img)), jnp.asarray(y0), jnp.asarray(x0),
            bh=32, interpret=True,
        )
    )
    np.testing.assert_array_equal(got, want)
