"""A/B row-band gather groups for the Eiger intensity fetch.

An Eiger 16M frame is 36.2 MB — just past the ~34 MB VMEM-stageable gather
table limit (tools/measure_compact.py), so the current whole-frame gather
groups may be riding the ~200 ns/index slow path.  This times FULL
kernel+compact candidate programs (cross-program stage deltas mislead)
that differ only in the static gather grouping:

  * auto (current production: whole 36.2 MB frames)
  * row bands at ~33.5 / ~16.7 / ~8.4 MB
  * whole-batch 288 MB (the known slow-path baseline)

Run alone on the TPU (never overlap tunnel jobs).
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
from ffs_tpu.ops.compact import compact_from_pcw_flat
from ffs_tpu.ops.dispersion_pallas import dispersion_packed_raw, mask_box_count

H, W = E2XE_16M_SLOW, E2XE_16M_FAST
B = int(os.environ.get("B", "8"))
REPS = int(os.environ.get("REPS", "32"))
K = int(os.environ.get("K", "24576"))
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

    def kc(gg=None, gr=None):
        def f(i, b):
            bb = b + (i & 1).astype(b.dtype)
            pcw = dispersion_packed_raw(
                bb, mask, 65535.0, mbox=mbox, trim=False, strip=STRIP
            )
            p, nbu, nbd = compact_from_pcw_flat(
                bb, pcw, max_pixels_total=K, with_neighbors=True,
                gather_group_frames=gg, gather_group_rows=gr,
            )
            return (
                jnp.sum(p.linear_index % 97)
                + jnp.sum(p.intensity)
                + jnp.sum(nbu) % 11
                + jnp.sum(nbd) % 13
                + p.count
            ).astype(jnp.float32)

        return f

    row_bytes = W * 2
    for name, gg, gr in [
        ("auto (whole 36.2 MB frames, current)", None, None),
        (f"row bands ~33.5 MB (gb={(32 << 20) // row_bytes})", None,
         (32 << 20) // row_bytes),
        (f"row bands ~16.7 MB (gb={(16 << 20) // row_bytes})", None,
         (16 << 20) // row_bytes),
        (f"row bands ~8.4 MB (gb={(8 << 20) // row_bytes})", None,
         (8 << 20) // row_bytes),
        ("whole batch 288 MB (slow-path baseline)", B, None),
    ]:
        timeit(name, kc(gg, gr), batch)


if __name__ == "__main__":
    main()
