"""Per-stage timing of the real Eiger-16M spotfind pipeline on the TPU.

Builds the same batch the bench uses, then times nested prefixes of the
pipeline (kernel; +compact; +CC; +table+filters) chained REPS times with
loop-dependent inputs and all outputs consumed.  Differences between
successive rows give honest per-stage costs.

Also compares per-frame lax.map vs python-unrolled vs flat-batch forms.
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
from ffs_tpu.ops.compact import compact_from_rowcum, compact_from_rowcum_flat
from ffs_tpu.ops.dispersion_pallas import dispersion_fused, mask_box_count

H, W = E2XE_16M_SLOW, E2XE_16M_FAST
BATCH = int(os.environ.get("B", "8"))
REPS = int(os.environ.get("REPS", "10"))
MAX_PX = 8192
MAX_SPOTS = 4096
FLAT_PX = 24576
FLAT_SPOTS = 12288


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
    print(f"{name:58s} {dt * 1e3:9.3f} ms/batch  {dt * 1e3 / BATCH:8.3f} ms/frame")
    return dt


def main():
    print(f"backend={jax.default_backend()} B={BATCH} reps={REPS}")
    rng = np.random.default_rng(12)
    base = rng.poisson(2.0, size=(H, W)).astype(np.uint16)
    mask_np = sample_data.generate_mask()
    frames = []
    for _ in range(BATCH):
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

    # --- stage prefixes (per-frame lax.map form, as bench.py runs) --------
    def k_only(i, b):
        _, rowcum = dispersion_fused(vary(i, b), mask, 65535.0, mbox=mbox,
                                     emit_strong=False)
        return jnp.sum(rowcum[:, :, -1]).astype(jnp.float32)

    def k_compact(i, b):
        bb = vary(i, b)
        _, rowcum = dispersion_fused(bb, mask, 65535.0, mbox=mbox,
                                     emit_strong=False)

        def rest(args):
            image, rc = args
            p = compact_from_rowcum(image, rc, max_pixels=MAX_PX)
            return jnp.sum(p.linear_index % 97) + jnp.sum(p.intensity) + p.count

        return jnp.sum(jax.lax.map(rest, (bb, rowcum))).astype(jnp.float32)

    def k_cc(i, b):
        bb = vary(i, b)
        _, rowcum = dispersion_fused(bb, mask, 65535.0, mbox=mbox,
                                     emit_strong=False)

        def rest(args):
            image, rc = args
            p = compact_from_rowcum(image, rc, max_pixels=MAX_PX)
            root = cc.label_compact_pixels(p, width=W)
            return jnp.sum(root) + jnp.sum(p.intensity) + p.count

        return jnp.sum(jax.lax.map(rest, (bb, rowcum))).astype(jnp.float32)

    def k_full(i, b):
        bb = vary(i, b)
        _, rowcum = dispersion_fused(bb, mask, 65535.0, mbox=mbox,
                                     emit_strong=False)

        def rest(args):
            image, rc = args
            p = compact_from_rowcum(image, rc, max_pixels=MAX_PX)
            root = cc.label_compact_pixels(p, width=W)
            t = cc.spot_table_from_pixels(p, root, width=W,
                                          max_spots=MAX_SPOTS,
                                          dtype=jnp.float32)
            keep, _, _ = cc.filter_spots(t, 3, 2.0)
            return (p.count + t.n_spots + jnp.sum(keep)
                    + jnp.sum(t.com_x) + jnp.sum(t.com_y))

        return jnp.sum(jax.lax.map(rest, (bb, rowcum))).astype(jnp.float32)

    timeit("kernel only (rowcum consumed)", k_only, batch)
    timeit("kernel + compact (lax.map)", k_compact, batch)
    timeit("kernel + compact + CC (lax.map)", k_cc, batch)
    timeit("kernel + compact + CC + table (lax.map)  [= bench]", k_full, batch)

    # --- flat-batch form ---------------------------------------------------
    def flat_full(i, b):
        bb = vary(i, b)
        _, rowcum = dispersion_fused(bb, mask, 65535.0, mbox=mbox,
                                     emit_strong=False)
        p = compact_from_rowcum_flat(bb, rowcum, max_pixels_total=FLAT_PX)
        root = cc.label_compact_pixels(p, width=W)
        t = cc.spot_table_from_pixels(p, root, width=W, max_spots=FLAT_SPOTS,
                                      dtype=jnp.float32, frame_rows=H)
        keep, _, _ = cc.filter_spots(t, 3, 2.0)
        return (p.count + t.n_spots + jnp.sum(keep)
                + jnp.sum(t.com_x) + jnp.sum(t.com_y)).astype(jnp.float32)

    def flat_compact(i, b):
        bb = vary(i, b)
        _, rowcum = dispersion_fused(bb, mask, 65535.0, mbox=mbox,
                                     emit_strong=False)
        p = compact_from_rowcum_flat(bb, rowcum, max_pixels_total=FLAT_PX)
        return (jnp.sum(p.linear_index % 97) + jnp.sum(p.intensity)
                + p.count).astype(jnp.float32)

    timeit("kernel + flat compact", flat_compact, batch)
    timeit("kernel + flat compact + CC + table", flat_full, batch)


def main2():
    """Packed-words pipeline variants (run when PACKED=1)."""
    from ffs_tpu.ops.dispersion_pallas import dispersion_packed
    from ffs_tpu.ops.compact import compact_from_words_flat

    print(f"packed-words path: backend={jax.default_backend()} B={BATCH}")
    rng = np.random.default_rng(12)
    base = rng.poisson(2.0, size=(H, W)).astype(np.uint16)
    from ffs_tpu.io import sample_data
    mask_np = sample_data.generate_mask()
    frames = []
    for _ in range(BATCH):
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
    from ffs_tpu.ops.dispersion_pallas import mask_box_count
    mbox = jax.block_until_ready(mask_box_count(mask))

    def vary(i, b):
        return b + (i & 1).astype(b.dtype)

    def pk_only(i, b):
        w32, pc = dispersion_packed(vary(i, b), mask, 65535.0, mbox=mbox)
        return (jnp.sum(pc[:, :, -1]) + jnp.sum(w32[0, 0])).astype(jnp.float32)

    def pk_compact(i, b):
        bb = vary(i, b)
        w32, pc = dispersion_packed(bb, mask, 65535.0, mbox=mbox)
        p = compact_from_words_flat(bb, w32, pc, max_pixels_total=FLAT_PX)
        return (jnp.sum(p.linear_index % 97) + jnp.sum(p.intensity)
                + p.count).astype(jnp.float32)

    def pk_full(i, b):
        bb = vary(i, b)
        w32, pc = dispersion_packed(bb, mask, 65535.0, mbox=mbox)
        p = compact_from_words_flat(bb, w32, pc, max_pixels_total=FLAT_PX)
        root = cc.label_compact_pixels(p, width=W)
        t = cc.spot_table_from_pixels(p, root, width=W, max_spots=FLAT_SPOTS,
                                      dtype=jnp.float32, frame_rows=H)
        keep, _, _ = cc.filter_spots(t, 3, 2.0)
        return (p.count + t.n_spots + jnp.sum(keep)
                + jnp.sum(t.com_x) + jnp.sum(t.com_y)).astype(jnp.float32)

    timeit("packed kernel only", pk_only, batch)
    timeit("packed kernel + words-flat compact", pk_compact, batch)
    timeit("packed kernel + compact + CC + table (flat)", pk_full, batch)




if __name__ == "__main__":
    if os.environ.get("PACKED"):
        main2()
    else:
        main()
