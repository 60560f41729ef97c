"""CPU-algorithm benchmark: oracle forms vs the jnp dispersion path.

The TPU-repo analogue of the reference's ``bm`` Google-Benchmark app
(reference: baseline/spotfinder/bm.cpp, CMakeLists.txt:43-59), which times
the CPU spotfinding algorithm variants against each other; the pixel-exact
cross-form *compare* half of that toolchain (check_no_tbx.cc) lives in
tests/test_oracle_cross_form.py.

Times, per full sample frame on the host CPU:

- ops/reference.py         boxed-inequality f64 NumPy oracle
- ops/reference_division.py division-form f32 NumPy oracle (GPU-kernel shape)
- ops/dispersion.py        jnp dispersion (XLA CPU), both algorithms

Run:  python tools/bm_oracles.py [--reps N] [--image I]
Prints one line per (algorithm, form): ms/frame and strong-pixel count
(the counts double as a live cross-check — boxed/division/jnp must agree).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--image", type=int, default=2)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ffs_tpu.io.sample_data import SampleReader
    from ffs_tpu.ops import dispersion as dj
    from ffs_tpu.ops import reference as ref
    from ffs_tpu.ops import reference_division as refdiv

    r = SampleReader()
    img = np.asarray(r.get_image(args.image))
    mask = np.asarray(r.get_mask())
    tmax = float(r.get_trusted_range()[1])

    def timed(fn):
        fn()  # warm (jit compile / page in)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn()
        dt = (time.perf_counter() - t0) / args.reps
        return dt * 1e3, out

    jimg, jmask = jnp.asarray(img), jnp.asarray(mask)

    cases = [
        (
            "dispersion  boxed-f64   ",
            lambda: int(ref.dispersion(img, mask, trusted_max=tmax).sum()),
        ),
        (
            "dispersion  division-f32",
            lambda: int(
                refdiv.dispersion_division_f32(img, mask, trusted_max=tmax).sum()
            ),
        ),
        (
            "dispersion  jnp-xla     ",
            lambda: int(
                np.asarray(dj.dispersion(jimg, jmask, trusted_max=tmax)).sum()
            ),
        ),
        (
            "extended    boxed-f64   ",
            lambda: int(ref.dispersion_extended(img, mask, trusted_max=tmax).sum()),
        ),
        (
            "extended    division-f32",
            lambda: int(
                refdiv.dispersion_extended_division_f32(
                    img, mask, trusted_max=tmax
                ).sum()
            ),
        ),
        (
            "extended    jnp-xla     ",
            lambda: int(
                np.asarray(
                    dj.dispersion_extended(jimg, jmask, trusted_max=tmax)
                ).sum()
            ),
        ),
    ]

    print(f"{'case':<26} {'ms/frame':>9} {'strong_px':>10}")
    for name, fn in cases:
        ms, count = timed(fn)
        print(f"{name:<26} {ms:>9.1f} {count:>10d}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
