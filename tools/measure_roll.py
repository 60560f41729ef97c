"""Packed-kernel tree implementation probe: misaligned slices vs rolls.

Hypothesis: the horizontal (lane-axis) window-sum trees dominate the
kernel's VPU cost through misaligned lane slices + masked sub-width
stores; a full-register pltpu.roll formulation with the identical float
addition order may lower cheaper.  Measures kernel-only throughput for
both on the real Eiger 16M shape AND verifies hardware bit-parity of the
combined [pc | w32] output (Mosaic lowering bugs are a known v5e hazard:
see _pack_pcw's history — never trust a new in-kernel formulation
without a hardware cross-check).
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
from ffs_tpu.ops.dispersion_pallas import dispersion_packed_raw, mask_box_count

H, W = E2XE_16M_SLOW, E2XE_16M_FAST
BATCH = int(os.environ.get("B", "8"))
REPS = int(os.environ.get("REPS", "32"))
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
        f"{name:58s} {dt * 1e3:9.3f} ms/batch  {dt * 1e3 / BATCH:8.3f} ms/frame",
        flush=True,
    )
    return dt


def main():
    print(f"backend={jax.default_backend()} B={BATCH} reps={REPS} strip={STRIP}")
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

    # hardware bit-parity first (includes the sample-image anchor frame)
    img2 = jnp.asarray(sample_data.generate_sample_image(2))[None]
    for nm, frames_b in (("sample2", img2), ("bench", batch)):
        a = dispersion_packed_raw(
            frames_b, mask, 65535.0, mbox=mbox, strip=STRIP, trim=False
        )
        b = dispersion_packed_raw(
            frames_b, mask, 65535.0, mbox=mbox, strip=STRIP, trim=False,
            tree_impl="roll",
        )
        same = bool(jnp.all(a == b))
        nwl = a.shape[-1] // 2
        print(f"parity[{nm}]: bit-identical={same} "
              f"strong={int(jnp.sum(a[:, :, nwl - 1]))}", flush=True)
        if not same:
            d = jnp.argwhere(a != b)[:8]
            print("  first diffs:", np.asarray(d))
            return 1

    def vary(i, b):
        return b + (i & 1).astype(b.dtype)

    def pk(impl):
        def f(i, b):
            pcw = dispersion_packed_raw(
                vary(i, b), mask, 65535.0, mbox=mbox, strip=STRIP,
                trim=False, tree_impl=impl,
            )
            nwl = pcw.shape[-1] // 2
            return (
                jnp.sum(pcw[:, :, nwl - 1]) + jnp.sum(pcw[0, 0])
            ).astype(jnp.float32)

        return f

    timeit("packed kernel only, slice trees (current)", pk("slice"), batch)
    timeit("packed kernel only, roll trees", pk("roll"), batch)
    return 0


def main_ext():
    """Jungfrau 1M extended-kernel variant (EXT=1)."""
    from ffs_tpu.ops.dispersion_extended_pallas import (
        dispersion_extended_packed_raw,
        mask_box_count_extended,
    )

    JH, JW = 1066, 1030
    JB = int(os.environ.get("B", "112"))
    STRIP_J = int(os.environ.get("STRIP", "128"))
    print(f"backend={jax.default_backend()} JB={JB} reps={REPS} strip={STRIP_J}")
    rng = np.random.default_rng(12)
    jmask_np = np.ones((JH, JW), dtype=np.uint8)
    jmask_np[512:554, :] = 0
    jmask = jnp.asarray(jmask_np)
    base = rng.poisson(2.0, size=(JH, JW)).astype(np.uint16)
    frames = []
    for _ in range(JB):
        f = base.copy()
        ys = rng.integers(8, JH - 8, 60)
        xs = rng.integers(8, JW - 8, 60)
        for yy, xx in zip(ys, xs):
            f[yy - 1 : yy + 2, xx - 1 : xx + 2] += rng.poisson(
                60.0, size=(3, 3)
            ).astype(np.uint16)
        f[jmask_np == 0] = 0
        frames.append(f)
    batch = jax.device_put(jnp.asarray(np.stack(frames)))
    mbox = jax.block_until_ready(mask_box_count_extended(jmask, strip=STRIP_J))

    a = dispersion_extended_packed_raw(
        batch, jmask, 65535.0, mbox=mbox, strip=STRIP_J, tree_impl="slice"
    )
    b = dispersion_extended_packed_raw(
        batch, jmask, 65535.0, mbox=mbox, strip=STRIP_J, tree_impl="roll"
    )
    same = bool(jnp.all(a == b))
    nwl = a.shape[-1] // 2
    print(f"parity[jf-bench]: bit-identical={same} "
          f"strong={int(jnp.sum(a[:, :, nwl - 1]))}", flush=True)
    if not same:
        return 1

    def vary(i, b):
        return b + (i & 1).astype(b.dtype)

    def pk(impl):
        def f(i, b):
            pcw = dispersion_extended_packed_raw(
                vary(i, b), jmask, 65535.0, mbox=mbox, strip=STRIP_J,
                tree_impl=impl,
            )
            nwl = pcw.shape[-1] // 2
            return (
                jnp.sum(pcw[:, :, nwl - 1]) + jnp.sum(pcw[0, 0])
            ).astype(jnp.float32)

        return f

    timeit("ext packed kernel only, slice trees (current)", pk("slice"), batch, reps=REPS)
    timeit("ext packed kernel only, roll trees", pk("roll"), batch, reps=REPS)
    return 0


if __name__ == "__main__":
    raise SystemExit(main_ext() if os.environ.get("EXT") else main())
