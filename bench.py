"""Benchmark: Eiger 16M spotfinding throughput on one TPU chip.

Runs the full per-frame device pipeline (dispersion threshold -> on-device
2D connected components -> compaction -> spot table + filters) on batched
full-size Eiger 16M frames, validates strong-pixel counts against the
deterministic sample-data anchors, and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference's published real-time goal of 500 Hz Eiger 16M on
one GPU (reference: README.md:131-132, BASELINE.md).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/ffs_tpu_xla"))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from ffs_tpu.constants import E2XE_16M_FAST, E2XE_16M_SLOW
    from ffs_tpu.io import sample_data
    from ffs_tpu.ops import connected_components as cc
    from ffs_tpu.ops import dispersion as dops

    H, W = E2XE_16M_SLOW, E2XE_16M_FAST
    # capacities sized for realistic beamline frames (thaumatin rotation
    # peaks at ~2.5k strong px / ~1.4k spots per frame); frames that
    # overflow are detected via the exact total count and reprocessed at
    # higher capacity by the pipeline layer
    MAX_PX = int(os.environ.get("FFS_BENCH_MAX_PX", "8192"))
    MAX_SPOTS = int(os.environ.get("FFS_BENCH_MAX_SPOTS", "4096"))
    VAL_MAX_PX, VAL_MAX_SPOTS = 16384, 16384  # anchors incl. the 9.5k-spot frame
    BATCH = int(os.environ.get("FFS_BENCH_BATCH", "8"))
    REPS = int(os.environ.get("FFS_BENCH_REPS", "8"))

    mask = jnp.asarray(sample_data.generate_mask())

    from ffs_tpu.ops.compact import compact_from_rowcum
    from ffs_tpu.ops.dispersion_pallas import dispersion_fused

    on_tpu = jax.default_backend() == "tpu"

    def make_batch_step(max_px, max_spots):
        def _rest(image, pixels):
            root_slot = cc.label_compact_pixels(pixels, width=W)
            table = cc.spot_table_from_pixels(
                pixels, root_slot, width=W, max_spots=max_spots, dtype=jnp.float32
            )
            keep, n_size, n_sep = cc.filter_spots(table, 3, 2.0)
            return pixels.count, table.n_spots, jnp.sum(keep.astype(jnp.int32))

        def batch_step(batch):
            if on_tpu:
                # the fused kernel batches natively (grid over frames); the
                # sparse stages run per frame via lax.map — their
                # single-frame lowering (searchsorted/gather/segment ops) is
                # far faster than the batched-gather form vmap produces
                _, rowcum = dispersion_fused(batch, mask, 65535.0)

                def rest(args):
                    image, rc = args
                    pixels = compact_from_rowcum(image, rc, max_pixels=max_px)
                    return _rest(image, pixels)

                return jax.lax.map(rest, (batch, rowcum))
            strong = dops.dispersion(batch, mask, 65535.0, dtype=jnp.float32)

            def rest_cpu(args):
                s, image = args
                pixels = cc.compact_strong_pixels(s, image, max_pixels=max_px)
                return _rest(image, pixels)

            return jax.lax.map(rest_cpu, (strong, batch))

        return jax.jit(batch_step)

    # --- correctness anchors (deterministic sample frames, full capacity) ----
    img2 = sample_data.generate_sample_image(2)
    img5 = sample_data.generate_sample_image(5)
    val_step = make_batch_step(VAL_MAX_PX, VAL_MAX_SPOTS)
    counts, n_spots, _ = jax.device_get(
        val_step(jnp.stack([jnp.asarray(img2), jnp.asarray(img5)]))
    )
    ok = [int(v) for v in counts] == [9506, 2388] and int(n_spots[0]) == 9506
    if not ok:
        print(
            f"VALIDATION MISMATCH: {list(counts)}/{list(n_spots)}", file=sys.stderr
        )

    # --- throughput -----------------------------------------------------------
    # realistic beamline-like frames: Poisson background + ~300 Gaussian
    # spots of ~9 px (thaumatin-scale: ~2.5k strong px/frame), device-resident.
    # REPS batch-steps are chained inside one jit so the measurement reflects
    # on-device throughput (one process per chip in production feeds frames
    # from local host RAM; the dev-tunnel's per-dispatch latency is not part
    # of the pipeline being measured).
    rng = np.random.default_rng(12)
    base = rng.poisson(2.0, size=(H, W)).astype(np.uint16)
    frames = []
    for b in range(BATCH):
        f = base.copy()
        ys = rng.integers(8, H - 8, 300)
        xs = rng.integers(8, W - 8, 300)
        for yy, xx in zip(ys, xs):
            f[yy - 1 : yy + 2, xx - 1 : xx + 2] += rng.poisson(
                60.0, size=(3, 3)
            ).astype(np.uint16)
        f[sample_data.generate_mask() == 0] = 0
        frames.append(f)
    batch_np = np.stack(frames)
    batch = jax.device_put(jnp.asarray(batch_np))
    step = make_batch_step(MAX_PX, MAX_SPOTS)
    batch_step = step  # chained() closes over the jitted step

    # capacity check on the realistic frames
    cts, _, _ = jax.device_get(step(batch))
    if int(max(cts)) > MAX_PX:
        print(f"bench frames exceed capacity: {max(cts)}", file=sys.stderr)
        ok = False

    @jax.jit
    def chained(batch):
        def body(i, acc):
            counts, _, kept = batch_step(batch + (i - i).astype(batch.dtype))
            return acc + jnp.sum(counts) + jnp.sum(kept)

        return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

    jax.block_until_ready(chained(batch))  # warm
    t0 = time.perf_counter()
    out = chained(batch)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = BATCH * REPS / dt
    print(
        json.dumps(
            {
                "metric": "eiger16m_spotfind_fps"
                + ("" if ok else "_VALIDATION_FAILED"),
                "value": round(fps, 2),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps / 500.0, 4),
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
