"""Randomized differential fuzz of the full spotfinding pipeline.

Drives the production packed Pallas path (Mosaic interpret mode on CPU)
and the dense jnp path through SpotfindProcessor on randomized frames and
asserts frame-by-frame equality of the complete result (counts, pixel
lists, roots, centroid sets) — the same bitwise contract the unit suite
pins on fixed fixtures (tests/test_spotfind_batch.py), here at scale over
adversarial content:

  * Poisson background at random rates, planted Gaussian spots,
    constant plateaus (window-sum ties), checkerboards;
  * saturated pixels at/above trusted_max, including u32 values >= 2^31
    (the i32-widening wrap regression, ops/dispersion_pallas);
  * random masks (bands, holes, fully open), both CC backends, both
    algorithms (dispersion / dispersion_extended), batch vs per-frame.

Usage: python tools/fuzz_spotfind.py [N_SEEDS [START_SEED]]
Exit code 0 = no mismatches.  Seeds cycle through a FIXED config pool
(shape/dtype/algorithm/backend/mask) with processors cached per config,
so the number of distinct XLA compiles — and therefore host memory — is
bounded no matter how many seeds run; only the frame content varies.
"""

from __future__ import annotations

import os
import sys

if __name__ == "__main__":
    # standalone: force the CPU platform before jax initialises.  Under
    # pytest (tests/test_fuzz_smoke.py) conftest already did, and mutating
    # the process env here would leak into sibling subprocess tests.
    os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from ffs_tpu.spotfind import SpotfindConfig, SpotfindProcessor  # noqa: E402

# A FIXED pool of configurations cycled by seed (content is what varies
# per seed).  Keeping the pool small bounds the number of distinct XLA
# compiles — an unbounded (shape x dtype x knobs) cross-product exhausts
# host memory after a few hundred seeds (LLVM "Cannot allocate memory").
# Each entry: (h, w, dtype, algorithm, cc_backend, min_spot_size,
#              mask_kind, full_trusted_range)
CONFIGS = [
    (96, 128, np.uint16, "dispersion", "device", 1, 0, True),
    (96, 128, np.uint16, "dispersion", "host", 1, 1, True),
    (96, 128, np.uint16, "dispersion", "device", 3, 2, False),
    (96, 128, np.uint32, "dispersion", "host", 1, 2, True),
    (128, 256, np.uint16, "dispersion_extended", "device", 1, 1, True),
    (128, 256, np.uint16, "dispersion_extended", "host", 3, 0, True),
    (128, 256, np.uint32, "dispersion_extended", "device", 1, 2, False),
    (72, 384, np.uint16, "dispersion", "device", 1, 2, True),
    (72, 384, np.uint32, "dispersion", "host", 3, 1, False),
    (72, 384, np.uint16, "dispersion_extended", "device", 1, 0, True),
]
_PROCS: dict = {}


def _processor(h, w, mask, trusted_max, algorithm, cc_backend,
               use_pallas, min_spot_size):
    key = (h, w, trusted_max, algorithm, cc_backend, use_pallas,
           min_spot_size)
    if key not in _PROCS:
        cfg = SpotfindConfig(
            precision="f32",
            use_pallas=use_pallas,
            pallas_interpret=use_pallas,
            algorithm=algorithm,
            cc_backend=cc_backend,
            max_strong_pixels=8192,
            max_spots=4096,
            min_spot_size=min_spot_size,
        )
        _PROCS[key] = SpotfindProcessor(w, h, mask, trusted_max, cfg)
    return _PROCS[key]


def _config_mask(kind, h, w):
    """Deterministic per-config mask (cached processors hold the mask, so
    it must be a function of the config, not of the seed)."""
    rng = np.random.default_rng(1000 + kind * 31 + h + w)
    mask = np.ones((h, w), dtype=np.uint8)
    if kind == 1:  # module-gap bands
        r0 = int(rng.integers(0, h - 4))
        mask[r0 : r0 + int(rng.integers(1, 5)), :] = 0
        c0 = int(rng.integers(0, w - 4))
        mask[:, c0 : c0 + int(rng.integers(1, 5))] = 0
    elif kind == 2:  # scattered holes
        holes = rng.random((h, w)) < 0.02
        mask[holes] = 0
    return mask


def _random_frame(rng, h, w, dtype, trusted_max):
    lam = float(rng.choice([0.5, 3.0, 8.0]))
    img = rng.poisson(lam, size=(h, w)).astype(np.int64)
    # planted compact spots
    for _ in range(int(rng.integers(1, 12))):
        cy, cx = int(rng.integers(2, h - 2)), int(rng.integers(2, w - 2))
        amp = int(rng.integers(50, 900))
        sz = int(rng.integers(1, 4))
        img[cy - sz // 2 : cy + sz // 2 + 1, cx - sz // 2 : cx + sz // 2 + 1] += amp
    # constant plateau: every window sum ties inside it
    if rng.random() < 0.5:
        r0, c0 = int(rng.integers(0, h - 16)), int(rng.integers(0, w - 16))
        img[r0 : r0 + 16, c0 : c0 + 16] = int(rng.integers(1, 30))
    # checkerboard patch (high local variance)
    if rng.random() < 0.3:
        r0, c0 = int(rng.integers(0, h - 12)), int(rng.integers(0, w - 12))
        yy, xx = np.mgrid[0:12, 0:12]
        img[r0 : r0 + 12, c0 : c0 + 12] = ((yy + xx) % 2) * int(
            rng.integers(10, 200)
        )
    # saturation: values at and above trusted_max must be excluded
    n_sat = int(rng.integers(0, 20))
    if n_sat:
        ys = rng.integers(0, h, n_sat)
        xs = rng.integers(0, w, n_sat)
        over = np.iinfo(dtype).max if rng.random() < 0.5 else int(trusted_max)
        img[ys, xs] = over
    if dtype == np.uint32 and rng.random() < 0.5:
        # the i32-widening wrap regression: huge u32 values must stay
        # excluded by the trusted_max gate
        ys = rng.integers(0, h, 5)
        xs = rng.integers(0, w, 5)
        img[ys, xs] = 3_000_000_000
    return np.clip(img, 0, np.iinfo(dtype).max).astype(dtype)


def _table_key(res):
    order = np.lexsort(res.centers_of_mass.T) if len(res.centers_of_mass) else []
    return res.centers_of_mass[order] if len(res.centers_of_mass) else None


def _compare(seed, tag, got, want):
    errs = []
    for f in ("n_strong_pixels", "n_spots", "n_spots_prefilter",
              "n_strong_pixels_filtered"):
        g, w_ = getattr(got, f), getattr(want, f)
        if g != w_:
            errs.append(f"{f}: {g} != {w_}")
    if not errs:
        if not np.array_equal(got.pixels.linear_index, want.pixels.linear_index):
            errs.append("pixel linear_index mismatch")
        if not np.array_equal(got.pixels.intensity, want.pixels.intensity):
            errs.append("pixel intensity mismatch")
        gk, wk = _table_key(got), _table_key(want)
        if (gk is None) != (wk is None) or (
            gk is not None and not np.allclose(gk, wk, rtol=0, atol=1e-5)
        ):
            errs.append("centroid set mismatch")
    if errs:
        print(f"MISMATCH seed={seed} [{tag}]: " + "; ".join(errs))
    return not errs


def run_seed(seed: int) -> bool:
    rng = np.random.default_rng(seed)
    (h, w, dtype, algorithm, cc_backend, min_spot_size, mask_kind,
     full_range) = CONFIGS[seed % len(CONFIGS)]
    mask = _config_mask(mask_kind, h, w)
    info = np.iinfo(dtype)
    trusted_max = float(info.max) if full_range else float(info.max // 2)
    nimg = int(rng.integers(2, 5))
    stack = np.stack([_random_frame(rng, h, w, dtype, trusted_max)
                      for _ in range(nimg)])

    common = (h, w, mask, trusted_max, algorithm, cc_backend)
    packed = _processor(*common, True, min_spot_size)
    dense = _processor(*common, False, min_spot_size)

    tag = (f"{h}x{w} {np.dtype(dtype).name} {algorithm} cc={cc_backend} "
           f"mss={min_spot_size} mask={mask_kind} tm={trusted_max:.0f}")
    ok = True
    want = []
    for n in range(nimg):
        w_res = dense.process_frame(n, stack[n], want_com=True)
        g_res = packed.process_frame(n, stack[n], want_com=True)
        want.append(g_res)
        ok &= _compare(seed, f"{tag} frame {n} packed-vs-dense", g_res, w_res)
    # batched collection must equal the per-frame packed path
    if packed.batch_supported():
        got = packed.collect_batch(
            list(range(nimg)), packed.dispatch_batch(stack), images=stack,
            want_com=True,
        )
        for n in range(nimg):
            ok &= _compare(seed, f"{tag} frame {n} batch-vs-frame",
                           got[n], want[n])
        # device-decode ingestion: LZ4-only planes + on-device bitshuffle
        # untranspose must reproduce the frame-batch results bitwise
        # (SpotfindProcessor.dispatch_batch_planes; the frames are
        # multiple-of-8 sized by construction)
        if (h * w) % 8 == 0:
            from ffs_tpu.io import compression

            planes = np.stack([
                compression.bshuf_lz4_planes(
                    compression.bshuf_lz4_compress(fr, fr.dtype.itemsize),
                    fr.size, fr.dtype.itemsize,
                )[0]
                for fr in stack
            ])
            got_p = packed.collect_batch(
                list(range(nimg)),
                packed.dispatch_batch_planes(planes, dtype=dtype),
                images=stack,
                want_com=True,
            )
            for n in range(nimg):
                ok &= _compare(seed, f"{tag} frame {n} planes-vs-frame",
                               got_p[n], want[n])
    return ok


def main():
    n_seeds = 50
    start = 0
    digits = [int(a) for a in sys.argv[1:] if a.isdigit()]
    if digits:
        n_seeds = digits[0]
    if len(digits) > 1:
        start = digits[1]
    failures = 0
    for seed in range(start, start + n_seeds):
        try:
            if not run_seed(seed):
                failures += 1
        except Exception as e:  # a crash is a finding too
            print(f"CRASH seed={seed}: {type(e).__name__}: {e}")
            failures += 1
        if (seed + 1 - start) % 10 == 0:
            print(f"... {seed + 1 - start}/{n_seeds} seeds, "
                  f"{failures} failures", flush=True)
    print(f"fuzz done: {n_seeds} seeds, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
