"""Benchmark: Eiger 16M spotfinding throughput on one TPU chip.

Runs the full per-frame pipeline (fused Pallas dispersion threshold ->
gather-based stream compaction -> sparse 2D connected components -> spot
table + filters, all on device) on batched full-size Eiger 16M frames,
validates strong-pixel and spot counts against the deterministic
sample-data anchors, and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference's published real-time goal of 500 Hz Eiger 16M on
one GPU (reference: README.md:131-132, BASELINE.md).

Measurement notes (hard-won):
  * REPS device batch-steps are chained inside ONE jitted loop whose input
    depends on the loop counter — XLA hoists loop-invariant bodies, so
    `batch + (i - i)` styles measure a single rep and lie by ~REPS x.
  * Consume every output you claim to compute: reducing a pipeline to
    `count` lets XLA dead-code-eliminate the expensive gather stages.
  * The dev tunnel costs ~45 ms per dispatch and moves d2h data at only
    ~40 MB/s, so the production host-CC split (device threshold+compact,
    C++ union-find on the host — see SpotfindConfig.cc_backend) measures
    *slower* here than the all-device path despite winning on local
    hardware; the bench therefore runs the all-device path.
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
    from ffs_tpu.ops.cc2d_host import cc2d, filter_spots_host

    H, W = E2XE_16M_SLOW, E2XE_16M_FAST
    # capacities sized for realistic beamline frames (thaumatin rotation
    # peaks at ~2.5k strong px / ~1.4k spots per frame); frames that
    # overflow are detected via the exact total count and reprocessed at
    # higher capacity by the pipeline layer
    MAX_PX = int(os.environ.get("FFS_BENCH_MAX_PX", "8192"))
    MAX_SPOTS = int(os.environ.get("FFS_BENCH_MAX_SPOTS", "4096"))
    VAL_MAX_PX = 16384  # anchors incl. the 9.5k-strong-pixel frame
    BATCH = int(os.environ.get("FFS_BENCH_BATCH", "8"))
    REPS = int(os.environ.get("FFS_BENCH_REPS", "16"))

    mask = jnp.asarray(sample_data.generate_mask())

    from ffs_tpu.ops.compact import compact_from_rowcum
    from ffs_tpu.ops.dispersion_pallas import dispersion_fused, mask_box_count

    on_tpu = jax.default_backend() == "tpu"
    # frame-invariant: computed once per collection, reused every frame
    mbox = jax.block_until_ready(mask_box_count(mask)) if on_tpu else None

    def make_batch_step(max_px, max_spots):
        """One batch through the full pipeline -> per-frame scalars."""

        def _rest(image, pixels):
            root_slot = cc.label_compact_pixels(pixels, width=W)
            table = cc.spot_table_from_pixels(
                pixels, root_slot, width=W, max_spots=max_spots, dtype=jnp.float32
            )
            keep, n_size, n_sep = cc.filter_spots(table, 3, 2.0)
            return pixels.count, table.n_spots, jnp.sum(keep.astype(jnp.int32))

        def batch_step(batch):
            if on_tpu:
                _, rowcum = dispersion_fused(
                    batch, mask, 65535.0, mbox=mbox, emit_strong=False
                )

                def rest(args):
                    image, rc = args
                    p = compact_from_rowcum(image, rc, max_pixels=max_px)
                    return _rest(image, p)

                # per-frame sparse stages: lax.map lowers gathers far
                # better than the batched forms vmap produces
                return jax.lax.map(rest, (batch, rowcum))
            strong = dops.dispersion(batch, mask, 65535.0, dtype=jnp.float32)

            def rest_cpu(args):
                s, image = args
                p = cc.compact_strong_pixels(s, image, max_pixels=max_px)
                return _rest(image, p)

            return jax.lax.map(rest_cpu, (strong, batch))

        return jax.jit(batch_step)

    # --- correctness anchors (deterministic sample frames, full capacity) ----
    # validated through BOTH CC backends: the on-device sparse union-find
    # (what the throughput loop runs) and the host C++ union-find (what the
    # production CLI runs)
    img2 = sample_data.generate_sample_image(2)
    img5 = sample_data.generate_sample_image(5)
    val_step = make_batch_step(VAL_MAX_PX, VAL_MAX_PX)
    counts, n_spots, _ = jax.device_get(
        val_step(jnp.stack([jnp.asarray(img2), jnp.asarray(img5)]))
    )
    ok = [int(v) for v in counts] == [9506, 2388] and int(n_spots[0]) == 9506
    if not ok:
        print(
            f"VALIDATION MISMATCH: {list(counts)}/{list(n_spots)}", file=sys.stderr
        )

    @jax.jit
    def val_compact(batch):
        if on_tpu:
            _, rowcum = dispersion_fused(
                batch, mask, 65535.0, mbox=mbox, emit_strong=False
            )
            def rest(args):
                image, rc = args
                p = compact_from_rowcum(image, rc, max_pixels=VAL_MAX_PX)
                return p.linear_index, p.intensity, p.count
            return jax.lax.map(rest, (batch, rowcum))
        strong = dops.dispersion(batch, mask, 65535.0, dtype=jnp.float32)
        def rest_cpu(args):
            s, image = args
            p = cc.compact_strong_pixels(s, image, max_pixels=VAL_MAX_PX)
            return p.linear_index, p.intensity, p.count
        return jax.lax.map(rest_cpu, (strong, batch))

    lin_v, int_v, cts_v = jax.device_get(
        val_compact(jnp.stack([jnp.asarray(img2), jnp.asarray(img5)]))
    )
    host_spots = []
    for lin, inten, n in zip(lin_v, int_v, cts_v):
        table = cc2d(lin[: int(n)], inten[: int(n)], W)
        host_spots.append(table.n_spots)
    if host_spots[0] != 9506 or [int(c) for c in cts_v] != [9506, 2388]:
        print(f"HOST-CC VALIDATION MISMATCH: {cts_v}/{host_spots}", file=sys.stderr)
        ok = False

    # --- throughput -----------------------------------------------------------
    # realistic beamline-like frames: Poisson background + ~300 Gaussian
    # spots of ~9 px (thaumatin-scale: ~2.5k strong px/frame), device-resident.
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
        # the input must depend on the loop counter or XLA hoists the whole
        # body out of the loop (see module docstring); (i & 1) perturbs
        # pixel values by at most 1
        def body(i, acc):
            counts, _, kept = batch_step(batch + (i & 1).astype(batch.dtype))
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
