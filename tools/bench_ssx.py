"""SSX per-image indexing throughput (device scoring path).

Measures ffs_tpu/indexing/ssx.SSXIndexer.index() end-to-end — rlp
computation, half-sphere candidate-vector search (the device matmul),
host refinement, cell assembly, candidate assignment, stills prediction,
rmsds — per image, on synthetic stills at the adversarial-suite spot
scale (~50-300 spots/image, the lysozyme_ssx_25keV regime of ~50
spots/image across 100 images).

Baseline derivation (BASELINE.md "SSX indexing"): the reference's ffbidx
feeds live per-image results inside the PIA loop of a 500 Hz Eiger SSX
collection (reference: src/ffs/ssx_index.py:87-159, service.py:447-491);
indexing only runs on HIT images, and at a representative ~20% hit rate
real-time means 100 indexed images/s on one chip.  vs_baseline = value/100.

Prints one JSON line {"metric": "ssx_index_images_per_s", ...}.

Tunnel note: each index() call makes device dispatches that cost ~45 ms
each here (artifact — real deployments don't pay it); the batched scoring
path keeps it to two dispatches per 64-image batch.
"""

import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/ffs_tpu_xla")
)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ".")


def main() -> int:
    from ssx_adversarial import CELL, lattice_spots, make_experiment, noise_spots

    from ffs_tpu.indexing.ssx import SSXIndexer

    N_IMAGES = int(os.environ.get("FFS_BENCH_SSX_IMAGES", "64"))
    REPS = int(os.environ.get("FFS_BENCH_SSX_REPS", "2"))

    images = []
    for seed in range(N_IMAGES):
        crystal, panel, wavelength, s0, rng = make_experiment(seed + 1)
        obs = lattice_spots(crystal, panel, s0, rng)
        obs = np.concatenate([obs, noise_spots(rng, 10)])
        images.append(obs)
    spot_counts = [len(o) for o in images]

    indexer = SSXIndexer(use_device=True)
    indexer.panel = panel
    indexer.cell = CELL
    indexer.wavelength = wavelength

    BATCH = int(os.environ.get("FFS_BENCH_SSX_BATCH", "64"))

    # warmup: compile the batched search (both dispatches) at the bucket,
    # then one JITTERED batch — the tunnel memoizes identical executions
    # and defers the executable-load cost to the first REAL run, so a
    # same-value warm absorbs neither (r5 protocol v3)
    indexer.index_batch(images[:BATCH])
    indexer.index_batch([im + 5e-4 for im in images[:BATCH]])

    n_ok = 0
    t0 = time.perf_counter()
    for rep in range(REPS):
        n_ok = 0
        # r5 protocol: jitter inputs per rep (sub-millipixel, harmless to
        # the search) — the tunnel memoizes identical (program, value)
        # executions, which would hand reps 2+ back for free
        jit_off = 1e-3 * (rep + 1)
        for lo in range(0, N_IMAGES, BATCH):
            batch_imgs = [im + jit_off for im in images[lo : lo + BATCH]]
            for result, _ in indexer.index_batch(batch_imgs):
                if result is not None:
                    n_ok += 1
    dt = time.perf_counter() - t0
    rate = N_IMAGES * REPS / dt

    print(
        f"{N_IMAGES} images x {REPS} reps, spots/image "
        f"{min(spot_counts)}-{max(spot_counts)}, indexed {n_ok}/{N_IMAGES}: "
        f"{rate:.1f} images/s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "ssx_index_images_per_s",
                "value": round(rate, 2),
                "unit": "images/s/chip (~50-300 spots, 32768-dir search)",
                "vs_baseline": round(rate / 100.0, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
