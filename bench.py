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
    MAX_PX, MAX_SPOTS = 32768, 16384
    BATCH = int(os.environ.get("FFS_BENCH_BATCH", "4"))
    REPS = int(os.environ.get("FFS_BENCH_REPS", "8"))

    mask = jnp.asarray(sample_data.generate_mask())

    from ffs_tpu.ops.compact import compact_from_rowcum
    from ffs_tpu.ops.dispersion_pallas import dispersion_fused

    on_tpu = jax.default_backend() == "tpu"

    def _rest(image, pixels):
        root_slot = cc.label_compact_pixels(pixels, width=W)
        table = cc.spot_table_from_pixels(
            pixels, root_slot, width=W, max_spots=MAX_SPOTS, dtype=jnp.float32
        )
        keep, _, _ = cc.filter_spots(table, 3, 2.0)
        return pixels.count, jnp.sum(keep.astype(jnp.int32))

    def batch_step(batch):
        if on_tpu:
            # the fused kernel batches natively (grid over frames)
            _, rowcum = dispersion_fused(batch, mask, 65535.0)
            pixels = jax.vmap(
                lambda i, rc: compact_from_rowcum(i, rc, max_pixels=MAX_PX)
            )(batch, rowcum)
        else:
            strong = dops.dispersion(batch, mask, 65535.0, dtype=jnp.float32)
            pixels = jax.vmap(
                lambda s, i: cc.compact_strong_pixels(s, i, max_pixels=MAX_PX)
            )(strong, batch)
        return jax.vmap(_rest)(batch, pixels)

    step = jax.jit(batch_step)

    # --- correctness anchors (deterministic sample frames) -------------------
    img2 = sample_data.generate_sample_image(2)
    img5 = sample_data.generate_sample_image(5)
    anchor = jax.device_get(step(jnp.stack([jnp.asarray(img2), jnp.asarray(img5)])))
    counts = [int(v) for v in anchor[0]]
    ok = counts == [9506, 2388]
    if not ok:
        print(f"VALIDATION MISMATCH: {counts} != [9506, 2388]", file=sys.stderr)

    # --- throughput -----------------------------------------------------------
    # realistic mixed batch: background frames + spotty frames, device-resident
    batch_np = np.stack([img5 if i % 2 else img2 for i in range(BATCH)])
    batch = jax.device_put(jnp.asarray(batch_np))
    step(batch)[0].block_until_ready()  # warm

    t0 = time.perf_counter()
    for _ in range(REPS):
        out = step(batch)
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
