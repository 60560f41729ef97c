"""Per-stage timing of bench.py's EXACT Eiger pipeline (roll-kernel era).

Times nested prefixes of the flat-batch production pipeline the bench
measures — packed kernel (incl. _pack_pcw), + flat compaction, + CC,
+ table/filters — each chained REPS times with loop-dependent inputs and
all outputs consumed.  Successive-row deltas give honest stage costs
(cross-program deltas still mislead; treat them as bounds, not truths).

JF=1 switches to the Jungfrau 1M bench shape (extended kernel, B=112).
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
from ffs_tpu.ops.compact import compact_from_pcw_flat
from ffs_tpu.ops.dispersion_pallas import dispersion_packed_raw, mask_box_count

JF = bool(os.environ.get("JF"))
if JF:
    H, W = 1066, 1030
else:
    H, W = E2XE_16M_SLOW, E2XE_16M_FAST
B = int(os.environ.get("B", "112" if JF else "8"))
REPS = int(os.environ.get("REPS", "16"))
K = int(os.environ.get("K", "16384" if JF else "24576"))
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
        f"strip={STRIP}"
    )
    rng = np.random.default_rng(12)
    base = rng.poisson(2.0, size=(H, W)).astype(np.uint16)
    if JF:
        mask_np = np.ones((H, W), dtype=np.uint8)
        mask_np[512:554, :] = 0  # module gap band (bench.py geometry)
    else:
        mask_np = sample_data.generate_mask()
    frames = []
    for _ in range(B):
        f = base.copy()
        n_spots = 60 if JF else 300
        ys = rng.integers(8, H - 8, n_spots)
        xs = rng.integers(8, W - 8, n_spots)
        for yy, xx in zip(ys, xs):
            f[yy - 1 : yy + 2, xx - 1 : xx + 2] += rng.poisson(
                60.0, size=(3, 3)
            ).astype(np.uint16)
        f[mask_np == 0] = 0
        frames.append(f)
    batch = jax.device_put(jnp.asarray(np.stack(frames)))
    mask = jnp.asarray(mask_np)
    if JF:
        from ffs_tpu.ops.dispersion_extended_pallas import (
            dispersion_extended_packed_raw,
            mask_box_count_extended,
        )

        mbox = jax.block_until_ready(
            mask_box_count_extended(mask, strip=STRIP)
        )

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

    def kc_gg(gg):
        def kc(i, b):
            bb = vary(i, b)
            pcw = run_kernel(bb)
            p, nbu, nbd = compact_from_pcw_flat(
                bb, pcw, max_pixels_total=K, with_neighbors=True,
                gather_group_frames=gg,
            )
            return (
                jnp.sum(p.linear_index % 97)
                + jnp.sum(p.intensity)
                + jnp.sum(nbu) % 11
                + jnp.sum(nbd) % 13
                + p.count
            ).astype(jnp.float32)

        return kc

    kc = kc_gg(None)

    def kcc(i, b):
        bb = vary(i, b)
        pcw = run_kernel(bb)
        p, nbu, nbd = compact_from_pcw_flat(
            bb, pcw, max_pixels_total=K, with_neighbors=True
        )
        root = cc.label_compact_pixels(p, width=W, neighbors=(nbu, nbd))
        return (jnp.sum(root) + jnp.sum(p.intensity) + p.count).astype(
            jnp.float32
        )

    def full(i, b):
        bb = vary(i, b)
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
            p.count
            + t.n_spots
            + jnp.sum(keep.astype(jnp.int32))
            + jnp.sum(t.com_x)
            + jnp.sum(t.com_y)
        ).astype(jnp.float32)

    if not JF:

        def kern0(i, b):
            s8 = dispersion_packed_raw(
                vary(i, b), mask, 65535.0, mbox=mbox, trim=False,
                strip=STRIP, pack=False,
            )
            # consume the whole plane (a reduce pass XLA can fuse into the
            # kernel output stream; treat the row as an upper bound)
            return jnp.sum(s8.astype(jnp.int32)).astype(jnp.float32)

        timeit("kernel only (dense strong8, no pack)", kern0, batch)

        def kern0_nosig(i, b):
            # signal_test=False drops one full-grid sqrt + two mults: the
            # delta calibrates what a sqrt-free predicate form could save
            s8 = dispersion_packed_raw(
                vary(i, b), mask, 65535.0, mbox=mbox, trim=False,
                strip=STRIP, pack=False, signal_test=False,
            )
            return jnp.sum(s8.astype(jnp.int32)).astype(jnp.float32)

        timeit("kernel only, signal_test=False (sqrt cost probe)",
               kern0_nosig, batch)
    timeit("kernel+pack (pcw consumed)", kern, batch)
    timeit("+ flat compact (w/ neighbours, auto groups)", kc, batch)
    if JF:
        timeit("+ flat compact (per-frame gather, old)", kc_gg(1), batch)
    else:
        # does a 72 MB two-frame table still gather at the fast rate?
        timeit("+ flat compact (2-frame 72 MB tables)", kc_gg(2), batch)
        timeit("+ flat compact (4-frame 144 MB tables)", kc_gg(4), batch)
    timeit("+ CC", kcc, batch)
    timeit("+ table + filters   [= bench program]", full, batch)


if __name__ == "__main__":
    main()
