"""Candidate bench pipeline v3: packed kernel (mkf-free) + word compaction
with resident-image intensity gather + flat CC + flat table.

Intensity rides a gather into the loop-invariant input batch (exactly the
production situation: images are host-uploaded resident buffers), while the
thresholded batch still varies per rep — indices vary, so nothing hoists.
"""

import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/ffs_tpu_xla")
)

import jax
import jax.numpy as jnp
import numpy as np

from ffs_tpu.constants import E2XE_16M_FAST, E2XE_16M_SLOW
from ffs_tpu.io import sample_data
from ffs_tpu.ops import connected_components as cc
from ffs_tpu.ops.compact import compact_from_words_flat
from ffs_tpu.ops.dispersion_pallas import dispersion_packed, mask_box_count

H, W = E2XE_16M_SLOW, E2XE_16M_FAST
B = int(os.environ.get("B", "8"))
REPS = int(os.environ.get("REPS", "10"))
K = 24576
S = 12288
STRIP = int(os.environ.get("STRIP", "128"))


def timeit(name, fn, *args, reps=REPS):
    @jax.jit
    def chained(*a):
        def body(i, acc):
            return acc + fn(i, *a)

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    jax.block_until_ready(chained(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(chained(*args))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:58s} {dt * 1e3:9.3f} ms/batch  {dt * 1e3 / B:8.3f} ms/frame")
    return dt


def main():
    print(f"backend={jax.default_backend()} B={B} reps={REPS} strip={STRIP}")
    rng = np.random.default_rng(12)
    base = rng.poisson(2.0, size=(H, W)).astype(np.uint16)
    mask_np = sample_data.generate_mask()
    frames = []
    for _ in range(B):
        f = base.copy()
        ys = rng.integers(8, H - 8, 300)
        xs = rng.integers(8, W - 8, 300)
        for yy, xx in zip(ys, xs):
            f[yy - 1 : yy + 2, xx - 1 : xx + 2] += rng.poisson(
                60.0, size=(3, 3)
            ).astype(np.uint16)
        f[mask_np == 0] = 0
        frames.append(f)
    batch = jax.device_put(jnp.asarray(np.stack(frames)))
    mask = jnp.asarray(mask_np)
    mbox = jax.block_until_ready(mask_box_count(mask))

    def vary(i, b):
        return b + (i & 1).astype(b.dtype)

    def kern(i, b):
        w32, pc = dispersion_packed(
            vary(i, b), mask, 65535.0, mbox=mbox, strip=STRIP
        )
        return (jnp.sum(pc[:, :, -1]) + jnp.sum(w32[0, 0])).astype(jnp.float32)

    def compacted(i, b):
        w32, pc = dispersion_packed(
            vary(i, b), mask, 65535.0, mbox=mbox, strip=STRIP
        )
        p = compact_from_words_flat(b, w32, pc, max_pixels_total=K)
        return (jnp.sum(p.linear_index % 97) + jnp.sum(p.intensity)
                + p.count).astype(jnp.float32)

    def with_cc(i, b):
        w32, pc = dispersion_packed(
            vary(i, b), mask, 65535.0, mbox=mbox, strip=STRIP
        )
        p = compact_from_words_flat(b, w32, pc, max_pixels_total=K)
        root = cc.label_compact_pixels(p, width=W)
        return (jnp.sum(root) + jnp.sum(p.intensity) + p.count).astype(jnp.float32)

    def full(i, b):
        w32, pc = dispersion_packed(
            vary(i, b), mask, 65535.0, mbox=mbox, strip=STRIP
        )
        p = compact_from_words_flat(b, w32, pc, max_pixels_total=K)
        root = cc.label_compact_pixels(p, width=W)
        t = cc.spot_table_from_pixels(p, root, width=W, max_spots=S,
                                      dtype=jnp.float32, frame_rows=H)
        keep, _, _ = cc.filter_spots(t, 3, 2.0)
        return (p.count + t.n_spots + jnp.sum(keep)
                + jnp.sum(t.com_x) + jnp.sum(t.com_y)).astype(jnp.float32)

    timeit("v3 packed kernel (mkf-free)", kern, batch)
    timeit("v3 + words compact (resident intensity)", compacted, batch)
    timeit("v3 + CC", with_cc, batch)
    timeit("v3 + CC + table + filters (FULL)", full, batch)


def main_v4():
    from ffs_tpu.ops.dispersion_pallas import dispersion_packed_raw
    from ffs_tpu.ops.compact import compact_from_pcw_flat

    print(f"v4 pcw path: backend={jax.default_backend()} B={B} strip={STRIP}")
    rng = np.random.default_rng(12)
    base = rng.poisson(2.0, size=(H, W)).astype(np.uint16)
    mask_np = sample_data.generate_mask()
    frames = []
    for _ in range(B):
        f = base.copy()
        ys = rng.integers(8, H - 8, 300)
        xs = rng.integers(8, W - 8, 300)
        for yy, xx in zip(ys, xs):
            f[yy - 1 : yy + 2, xx - 1 : xx + 2] += rng.poisson(
                60.0, size=(3, 3)
            ).astype(np.uint16)
        f[mask_np == 0] = 0
        frames.append(f)
    batch = jax.device_put(jnp.asarray(np.stack(frames)))
    mask = jnp.asarray(mask_np)
    mbox = jax.block_until_ready(mask_box_count(mask))

    def vary(i, b):
        return b + (i & 1).astype(b.dtype)

    def kern(i, b):
        pcw = dispersion_packed_raw(vary(i, b), mask, 65535.0, mbox=mbox, strip=STRIP)
        nwl = pcw.shape[-1] // 2
        return (jnp.sum(pcw[:, :, nwl - 1]) + jnp.sum(pcw[0, 0])).astype(jnp.float32)

    def compacted(i, b):
        pcw = dispersion_packed_raw(vary(i, b), mask, 65535.0, mbox=mbox, strip=STRIP)
        p = compact_from_pcw_flat(b, pcw, max_pixels_total=K)
        return (jnp.sum(p.linear_index % 97) + jnp.sum(p.intensity)
                + p.count).astype(jnp.float32)

    def full(i, b):
        pcw = dispersion_packed_raw(vary(i, b), mask, 65535.0, mbox=mbox, strip=STRIP)
        p = compact_from_pcw_flat(b, pcw, max_pixels_total=K)
        root = cc.label_compact_pixels(p, width=W)
        t = cc.spot_table_from_pixels(p, root, width=W, max_spots=S,
                                      dtype=jnp.float32, frame_rows=H)
        keep, _, _ = cc.filter_spots(t, 3, 2.0)
        return (p.count + t.n_spots + jnp.sum(keep)
                + jnp.sum(t.com_x) + jnp.sum(t.com_y)).astype(jnp.float32)

    timeit("v4 packed kernel (single-stmt sums, pcw out)", kern, batch)
    timeit("v4 + pcw compact (one row gather)", compacted, batch)
    timeit("v4 FULL (+ CC + table + filters)", full, batch)


def main_v5():
    from ffs_tpu.ops.dispersion_pallas import dispersion_packed_raw
    from ffs_tpu.ops.compact import compact_from_pcw_flat

    print(f"v5 pcw UNSLICED path: backend={jax.default_backend()} B={B} strip={STRIP}")
    rng = np.random.default_rng(12)
    base = rng.poisson(2.0, size=(H, W)).astype(np.uint16)
    mask_np = sample_data.generate_mask()
    frames = []
    for _ in range(B):
        f = base.copy()
        ys = rng.integers(8, H - 8, 300)
        xs = rng.integers(8, W - 8, 300)
        for yy, xx in zip(ys, xs):
            f[yy - 1 : yy + 2, xx - 1 : xx + 2] += rng.poisson(
                60.0, size=(3, 3)
            ).astype(np.uint16)
        f[mask_np == 0] = 0
        frames.append(f)
    batch = jax.device_put(jnp.asarray(np.stack(frames)))
    mask = jnp.asarray(mask_np)
    mbox = jax.block_until_ready(mask_box_count(mask))

    def vary(i, b):
        return b + (i & 1).astype(b.dtype)

    def compacted(i, b):
        pcw = dispersion_packed_raw(vary(i, b), mask, 65535.0, mbox=mbox,
                                    strip=STRIP, trim=False)
        p = compact_from_pcw_flat(b, pcw, max_pixels_total=K)
        return (jnp.sum(p.linear_index % 97) + jnp.sum(p.intensity)
                + p.count).astype(jnp.float32)

    def full(i, b):
        pcw = dispersion_packed_raw(vary(i, b), mask, 65535.0, mbox=mbox,
                                    strip=STRIP, trim=False)
        hp = pcw.shape[1]
        p = compact_from_pcw_flat(b, pcw, max_pixels_total=K)
        root = cc.label_compact_pixels(p, width=W)
        t = cc.spot_table_from_pixels(p, root, width=W, max_spots=S,
                                      dtype=jnp.float32, frame_rows=hp)
        keep, _, _ = cc.filter_spots(t, 3, 2.0)
        return (p.count + t.n_spots + jnp.sum(keep)
                + jnp.sum(t.com_x) + jnp.sum(t.com_y)).astype(jnp.float32)

    timeit("v5 kernel + UNSLICED pcw compact", compacted, batch)
    timeit("v5 FULL (+ CC + table + filters)", full, batch)


if __name__ == "__main__":
    if os.environ.get("V5"):
        main_v5()
    elif os.environ.get("V4"):
        main_v4()
    else:
        main()
