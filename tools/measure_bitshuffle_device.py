"""Measure the on-device bitshuffle untranspose at Eiger-16M frame scale.

One Eiger 16M u16 frame = 18,093,576 elements = 4417 blocks of 4096
elements (+ partial) = ~36 MB of planes.  The kernel is 16 unrolled
shift/mask/or passes (ops/bitshuffle_device.py); this harness times it
with the measurement rules from CLAUDE.md: chained reps with a
loop-dependent input (the plane buffer is xor-perturbed by the loop
counter) and the full output consumed.

Usage: python tools/measure_bitshuffle_device.py [REPS]
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

from ffs_tpu.ops.bitshuffle_device import untranspose_planes  # noqa: E402

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 20

E16M_ELEMS = 4362 * 4148
BLOCK_ELEM = 4096
N_BLOCKS = (E16M_ELEMS + BLOCK_ELEM - 1) // BLOCK_ELEM  # 4417


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    planes = rng.integers(
        0, 256, size=(N_BLOCKS, BLOCK_ELEM * 2), dtype=np.uint8
    )

    @jax.jit
    def chained(pl):
        # true data dependence: each rep's input is xor-perturbed by the
        # previous rep's OUTPUT bytes (a scalar-sum consumption lets XLA
        # fold the per-rep work — measured 50x too fast)
        acc = jnp.zeros((), jnp.uint32)
        for i in range(REPS):
            out = untranspose_planes(pl, 2)
            acc = acc + out[0, 0].astype(jnp.uint32)
            fb = jax.lax.bitcast_convert_type(out, jnp.uint8).reshape(pl.shape)
            pl = pl ^ fb ^ jnp.uint8(i + 1)
        return acc + pl.astype(jnp.uint32).sum()

    pl = jax.device_put(planes)
    r = chained(pl)
    r.block_until_ready()
    t0 = time.perf_counter()
    r = chained(pl)
    r.block_until_ready()
    dt = time.perf_counter() - t0
    per_frame_ms = dt / REPS * 1000
    print(
        f"untranspose 16M-u16 frame: {per_frame_ms:.3f} ms/frame "
        f"({REPS} chained reps, checksum {int(r)})"
    )
    # host codec comparison (single-threaded native)
    from ffs_tpu.io import compression

    frame = rng.integers(0, 65536, size=E16M_ELEMS, dtype=np.uint16)
    chunk = compression.bshuf_lz4_compress(frame, 2)
    t0 = time.perf_counter()
    compression.bshuf_lz4_decompress(chunk, E16M_ELEMS, 2)
    t_full = time.perf_counter() - t0
    t0 = time.perf_counter()
    compression.bshuf_lz4_planes(chunk, E16M_ELEMS, 2)
    t_lz4 = time.perf_counter() - t0
    print(
        f"host full decode {t_full * 1000:.1f} ms/frame, "
        f"LZ4-only {t_lz4 * 1000:.1f} ms/frame "
        f"(bit-transpose share {100 * (1 - t_lz4 / t_full):.0f}%)"
    )


if __name__ == "__main__":
    main()
