"""Per-stage timing of bench.py's EXACT segmented Eiger/JF pipeline.

Times nested prefixes of the segmented production pipeline (packed kernel
+ pack, + segmented compact w/ neighbours, + CC, + table/filters), each
chained REPS times with loop-dependent inputs and all outputs consumed.
Successive-row deltas bound the stage costs (cross-program deltas still
mislead; compare full candidate programs for decisions).

JF=1 switches to the Jungfrau 1M bench shape (extended kernel, B=112).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/ffs_tpu_xla")
)

import jax
import jax.numpy as jnp
import numpy as np

from bench import _make_frames
from ffs_tpu.constants import E2XE_16M_FAST, E2XE_16M_SLOW
from ffs_tpu.io import sample_data
from ffs_tpu.ops import connected_components as cc
from ffs_tpu.ops.compact import compact_from_pcw_segmented
from ffs_tpu.ops.dispersion_pallas import dispersion_packed_raw, mask_box_count

JF = bool(os.environ.get("JF"))
if JF:
    H, W = 1066, 1030
else:
    H, W = E2XE_16M_SLOW, E2XE_16M_FAST
B = int(os.environ.get("B", "112" if JF else "8"))
REPS = int(os.environ.get("REPS", "32"))
KF = int(os.environ.get("KF", "640" if JF else "3072"))
S = int(os.environ.get("S", "8192" if JF else "12288"))
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
    print(
        f"backend={jax.default_backend()} jf={JF} B={B} reps={REPS} "
        f"KF={KF} strip={STRIP}"
    )
    rng = np.random.default_rng(12)
    if JF:
        mask_np = np.ones((H, W), dtype=np.uint8)
        mask_np[512:554, :] = 0
        batch_np = _make_frames(rng, H, W, B, mask_np, n_spots=60)
    else:
        mask_np = sample_data.generate_mask()
        batch_np = _make_frames(rng, H, W, B, mask_np)
    batch = jax.device_put(jnp.asarray(batch_np))
    mask = jnp.asarray(mask_np)
    if JF:
        from ffs_tpu.ops.dispersion_extended_pallas import (
            dispersion_extended_packed_raw,
            mask_box_count_extended,
        )

        mbox = jax.block_until_ready(mask_box_count_extended(mask, strip=STRIP))

        def run_kernel(b):
            return dispersion_extended_packed_raw(
                b, mask, 65535.0, mbox=mbox, strip=STRIP
            )

    else:
        mbox = jax.block_until_ready(mask_box_count(mask))

        def run_kernel(b):
            return dispersion_packed_raw(
                b, mask, 65535.0, mbox=mbox, trim=False, strip=STRIP
            )

    def vary(i, b):
        return b + (i & 1).astype(b.dtype)

    def kern(i, b):
        pcw = run_kernel(vary(i, b))
        nwl = pcw.shape[-1] // 2
        return (jnp.sum(pcw[:, :, nwl - 1]) + jnp.sum(pcw[0, 0])).astype(
            jnp.float32
        )

    def kc(i, b):
        bb = vary(i, b)
        pcw = run_kernel(bb)
        p, nbu, nbd, counts = compact_from_pcw_segmented(
            bb, pcw, max_pixels_per_frame=KF, with_neighbors=True
        )
        return (
            jnp.sum(p.linear_index % 97)
            + jnp.sum(p.intensity)
            + jnp.sum(nbu) % 11
            + jnp.sum(nbd) % 13
            + jnp.max(counts)
        ).astype(jnp.float32)

    def kcc(i, b):
        bb = vary(i, b)
        pcw = run_kernel(bb)
        p, nbu, nbd, counts = compact_from_pcw_segmented(
            bb, pcw, max_pixels_per_frame=KF, with_neighbors=True
        )
        root = cc.label_compact_pixels(p, width=W, neighbors=(nbu, nbd))
        return (jnp.sum(root) + jnp.sum(p.intensity) + jnp.max(counts)).astype(
            jnp.float32
        )

    def full(i, b):
        bb = vary(i, b)
        pcw = run_kernel(bb)
        hp = pcw.shape[1]
        p, nbu, nbd, counts = compact_from_pcw_segmented(
            bb, pcw, max_pixels_per_frame=KF, with_neighbors=True
        )
        root = cc.label_compact_pixels(p, width=W, neighbors=(nbu, nbd))
        t = cc.spot_table_from_pixels(
            p, root, width=W, max_spots=S, dtype=jnp.float32, frame_rows=hp,
            peak_key_slots=KF,
        )
        keep, _, _ = cc.filter_spots(t, 3, 2.0)
        return (
            p.count
            + jnp.max(counts)
            + t.n_spots
            + jnp.sum(keep.astype(jnp.int32))
            + jnp.sum(t.com_x)
            + jnp.sum(t.com_y)
        ).astype(jnp.float32)

    timeit("kernel+pack (pcw consumed)", kern, batch)
    timeit("+ segmented compact (w/ neighbours)", kc, batch)
    timeit("+ CC", kcc, batch)
    timeit("+ table + filters   [= bench program]", full, batch)


if __name__ == "__main__":
    main()
