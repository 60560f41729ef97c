"""Measure the INGEST-INCLUSIVE Eiger 16M spotfind pipeline on the TPU.

The chained program starts from bitshuffle PLANES (the LZ4-decoded but
still bit-transposed bytes — exactly what the host hands the device in
`--decode-backend device` mode) and runs: device untranspose -> frame
assembly -> packed dispersion -> segmented compaction -> CC -> spot
table -> filters, every output consumed.  This is the program behind
bench.py's `eiger16m_ingest_spotfind_fps` metric (VERDICT r4 item 1: the
reference's 500 Hz includes decode in the loop, spotfinder.cc:823-855).

Measurement protocol (r5, supersedes earlier harnesses): the axon tunnel
now acks `block_until_ready` at ENQUEUE (timings read ~0) and appears to
memoize identical (program, input-value) executions — so every timing
here (a) fences with a scalar d2h (`float(r)`), (b) perturbs the input
value between warmup and every timed run, and (c) reports the d2h RTT
measured separately so the per-frame marginal can be judged against it.

Usage: python tools/measure_ingest.py [REPS [BATCH]]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/ffs_tpu_xla")
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def make_planes(frames: np.ndarray):
    """Host bitshuffle of (B, H, W) u16 frames -> (B, NBLK, 8192) u8
    planes + block element count, via the native codec (compress then
    LZ4-split — one-time setup cost, not timed)."""
    from ffs_tpu.io import compression

    B, H, W = frames.shape
    n_elem = H * W
    out = []
    for b in range(B):
        chunk = compression.bshuf_lz4_compress(frames[b].reshape(-1), 2)
        planes, tail, block_elem, n_shuf = compression.bshuf_lz4_planes(
            chunk, n_elem, 2, skip_header=True
        )
        assert n_shuf == n_elem and not len(tail)
        out.append(planes)
    return np.stack(out), block_elem


def main():
    import bench as B
    from ffs_tpu.constants import E2XE_16M_FAST, E2XE_16M_SLOW
    from ffs_tpu.io import sample_data
    from ffs_tpu.ops import connected_components as cc
    from ffs_tpu.ops.bitshuffle_device import untranspose_planes
    from ffs_tpu.ops.compact import compact_from_pcw_segmented
    from ffs_tpu.ops.dispersion_pallas import (
        dispersion_packed_raw,
        mask_box_count,
    )

    from ffs_tpu.ops.bitshuffle_device import untranspose_planes_to_wide
    from ffs_tpu.ops.frame_assemble import frames_from_flat_wide, padded_width

    print("devices:", jax.devices())
    H, W = E2XE_16M_SLOW, E2XE_16M_FAST
    WP = padded_width(W)
    K, S = 24576, 12288
    KF = K // BATCH
    mask_np = np.zeros((E2XE_16M_SLOW, WP), dtype=np.uint8)
    mask_np[:, :W] = sample_data.generate_mask()
    mask = jnp.asarray(mask_np)
    mbox = mask_box_count(mask)
    rng = np.random.default_rng(12)
    frames = B._make_frames(
        rng, H, W, BATCH, mask_np[:, :W], n_spots=300
    )
    t0 = time.perf_counter()
    planes_np, block_elem = make_planes(frames)
    print(
        f"host plane prep {time.perf_counter() - t0:.1f}s "
        f"(block_elem={block_elem}, planes {planes_np.nbytes / 1e6:.0f} MB)"
    )
    # upload as little-endian u32 WORDS (free host view; a device-side
    # u8->u32 bitcast is a ~1 ms/frame sublane-repack relayout)
    planes = jax.device_put(
        jnp.asarray(planes_np.reshape(BATCH, planes_np.shape[1], -1)
                    .view(np.uint32))
    )
    n_elem = H * W

    def frames_from_planes(pl):
        el = untranspose_planes_to_wide(pl.reshape(-1, pl.shape[-1]), 2)
        return frames_from_flat_wide(el.reshape(BATCH, -1), H, W)

    def step(b):
        w = b.shape[-1]
        pcw = dispersion_packed_raw(
            b, mask, 65535.0, mbox=mbox, trim=False, strip=128,
            interpret=False,
        )
        hp = pcw.shape[1]
        p, nbu, nbd, counts = compact_from_pcw_segmented(
            b, pcw, max_pixels_per_frame=KF, with_neighbors=True
        )
        root = cc.label_compact_pixels(p, width=w, neighbors=(nbu, nbd))
        t = cc.spot_table_from_pixels(
            p, root, width=w, max_spots=S, dtype=jnp.float32,
            frame_rows=hp, peak_key_slots=KF,
        )
        keep, _, _ = cc.filter_spots(t, 3, 2.0)
        return p, t, keep, counts

    def consume_all(p, t, keep, counts):
        acc = (
            p.count + jnp.max(counts) + t.n_spots
            + jnp.sum(keep.astype(jnp.int32))
        ).astype(jnp.float32)
        for col in t[1:]:
            acc = acc + jnp.sum(col.astype(jnp.float32))
        return acc

    @jax.jit
    def chained(pl):
        def body(i, acc):
            b = frames_from_planes(pl ^ (i & 1).astype(jnp.uint32))
            return acc + consume_all(*step(b))

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    # decode parity vs the host frames (parity 0 = untouched planes)
    dec = np.asarray(jax.jit(frames_from_planes)(planes))
    assert np.array_equal(dec[:, :, :W], frames), "device decode != host frames"
    print("decode parity ok")

    # RTT calibration: scalar round trip
    s = jnp.float32(1.0)
    float(s + 1)
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(s + 1)
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[2]
    print(f"scalar d2h RTT ~{rtt * 1e3:.1f} ms")

    t0 = time.perf_counter()
    float(chained(planes))
    print(f"compile+first run {time.perf_counter() - t0:.1f}s")
    for k in range(3):
        plk = planes ^ jnp.uint32(k + 2)
        int(plk[0, 0, 0])
        t0 = time.perf_counter()
        float(chained(plk))
        dt = time.perf_counter() - t0
        fps = BATCH * REPS / (dt - rtt)
        print(
            f"run {k}: {dt:.3f}s -> {fps:.1f} fps "
            f"({(dt - rtt) / REPS / BATCH * 1e3:.3f} ms/frame, RTT-adjusted)"
        )


if __name__ == "__main__":
    main()
