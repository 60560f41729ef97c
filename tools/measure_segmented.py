"""Flat vs segmented compaction: full Eiger bench programs head-to-head.

The flat form's B intensity-gather rounds each gather ALL K indices and
select one frame's worth; the segmented form statically slices each
round's own (Kf,) indices (K total) with no K-wide selects.  Both
programs run kernel + compact + CC + table + filters with everything
consumed, chained with loop-dependent inputs.
"""

import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/ffs_tpu_xla")
)

import jax
import jax.numpy as jnp
import numpy as np

from bench import _make_frames  # keep the measured workload in lockstep
from ffs_tpu.constants import E2XE_16M_FAST, E2XE_16M_SLOW
from ffs_tpu.io import sample_data
from ffs_tpu.ops import connected_components as cc
from ffs_tpu.ops.compact import compact_from_pcw_flat, compact_from_pcw_segmented
from ffs_tpu.ops.dispersion_pallas import dispersion_packed_raw, mask_box_count

H, W = E2XE_16M_SLOW, E2XE_16M_FAST
B = int(os.environ.get("B", "8"))
REPS = int(os.environ.get("REPS", "32"))
K = int(os.environ.get("K", "24576"))
S = int(os.environ.get("S", "12288"))
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
        f"{name:58s} {dt * 1e3:9.3f} ms/batch  {dt * 1e3 / B:8.3f} ms/frame",
        flush=True,
    )
    return dt


def main():
    print(f"backend={jax.default_backend()} B={B} reps={REPS} K={K}")
    rng = np.random.default_rng(12)
    mask_np = sample_data.generate_mask()
    batch = jax.device_put(jnp.asarray(_make_frames(rng, H, W, B, mask_np)))
    mask = jnp.asarray(mask_np)
    mbox = jax.block_until_ready(mask_box_count(mask))

    def run_kernel(b):
        return dispersion_packed_raw(
            b, mask, 65535.0, mbox=mbox, trim=False, strip=STRIP
        )

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
            bb, pcw, max_pixels_per_frame=K // B, with_neighbors=True
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

    timeit("full pipeline, FLAT shared-capacity compact", full_flat, batch)
    timeit("full pipeline, SEGMENTED per-frame compact", full_seg, batch)
    timeit("full pipeline, FLAT (repeat)", full_flat, batch)
    timeit("full pipeline, SEGMENTED (repeat)", full_seg, batch)


if __name__ == "__main__":
    main()
