"""Flat vs segmented-grouped compaction: full Jungfrau bench programs.

Honest capacities: flat K=65536 (holds the ~59k-pixel 112-frame batch);
segmented Kf=640 per frame (holds the ~560-px max frame with margin,
K = 71680 total).  Gather groups pool 15 frames/table in both forms; the
segmented form gathers ~72k total indices instead of 8 rounds x 65536.
"""

import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/ffs_tpu_xla")
)

import jax
import jax.numpy as jnp
import numpy as np

from ffs_tpu.ops import connected_components as cc
from ffs_tpu.ops.compact import compact_from_pcw_flat, compact_from_pcw_segmented
from ffs_tpu.ops.dispersion_extended_pallas import (
    dispersion_extended_packed_raw,
    mask_box_count_extended,
)

H, W = 1066, 1030
B = int(os.environ.get("B", "112"))
REPS = int(os.environ.get("REPS", "32"))
K = int(os.environ.get("K", "65536"))
KF = int(os.environ.get("KF", "640"))
S = int(os.environ.get("S", "8192"))
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
    print(
        f"{name:58s} {dt * 1e3:9.3f} ms/batch  {B / dt:9.1f} fps",
        flush=True,
    )
    return dt


def main():
    print(f"backend={jax.default_backend()} B={B} reps={REPS} K={K} KF={KF}")
    rng = np.random.default_rng(12)
    base = rng.poisson(2.0, size=(H, W)).astype(np.uint16)
    mask_np = np.ones((H, W), dtype=np.uint8)
    mask_np[512:554, :] = 0
    frames = []
    for _ in range(B):
        f = base.copy()
        ys = rng.integers(8, H - 8, 60)
        xs = rng.integers(8, W - 8, 60)
        for yy, xx in zip(ys, xs):
            f[yy - 1 : yy + 2, xx - 1 : xx + 2] += rng.poisson(
                60.0, size=(3, 3)
            ).astype(np.uint16)
        f[mask_np == 0] = 0
        frames.append(f)
    batch = jax.device_put(jnp.asarray(np.stack(frames)))
    mask = jnp.asarray(mask_np)
    mbox = jax.block_until_ready(mask_box_count_extended(mask, strip=STRIP))

    def run_kernel(b):
        return dispersion_extended_packed_raw(
            b, mask, 65535.0, mbox=mbox, strip=STRIP
        )

    # workload fit check
    pcw0 = run_kernel(batch)
    nwl0 = pcw0.shape[-1] // 2
    per_frame = np.asarray(jnp.sum(pcw0[:, :, nwl0 - 1], axis=1))
    print(f"per-frame strong px: max {per_frame.max()} total {per_frame.sum()}")
    assert per_frame.max() <= KF and per_frame.sum() <= K

    def full_flat(i, b):
        bb = b + (i & 1).astype(b.dtype)
        pcw = run_kernel(bb)
        hp = pcw.shape[1]
        p, nbu, nbd = compact_from_pcw_flat(
            bb, pcw, max_pixels_total=K, with_neighbors=True
        )
        root = cc.label_compact_pixels(p, width=W, neighbors=(nbu, nbd))
        t = cc.spot_table_from_pixels(
            p, root, width=W, max_spots=S, dtype=jnp.float32, frame_rows=hp
        )
        keep, _, _ = cc.filter_spots(t, 3, 2.0)
        return (
            p.count + t.n_spots + jnp.sum(keep.astype(jnp.int32))
            + jnp.sum(t.com_x) + jnp.sum(t.com_y)
        ).astype(jnp.float32)

    def full_seg(i, b):
        bb = b + (i & 1).astype(b.dtype)
        pcw = run_kernel(bb)
        hp = pcw.shape[1]
        p, nbu, nbd, counts = compact_from_pcw_segmented(
            bb, pcw, max_pixels_per_frame=KF, with_neighbors=True
        )
        root = cc.label_compact_pixels(p, width=W, neighbors=(nbu, nbd))
        t = cc.spot_table_from_pixels(
            p, root, width=W, max_spots=S, dtype=jnp.float32, frame_rows=hp
        )
        keep, _, _ = cc.filter_spots(t, 3, 2.0)
        return (
            p.count + jnp.max(counts) + t.n_spots
            + jnp.sum(keep.astype(jnp.int32))
            + jnp.sum(t.com_x) + jnp.sum(t.com_y)
        ).astype(jnp.float32)

    timeit("JF full pipeline, FLAT K=65536", full_flat, batch)
    timeit(f"JF full pipeline, SEGMENTED Kf={KF}", full_seg, batch)
    timeit("JF full pipeline, FLAT (repeat)", full_flat, batch)
    timeit(f"JF full pipeline, SEGMENTED (repeat)", full_seg, batch)


if __name__ == "__main__":
    main()
