"""Differential fuzz: device two-pass ray search vs the host f64 oracle.

The TPU predictor accepts pass-1 candidates in f32 inside a numeric band
(prediction/rotation._get_pblock_fn); a band violation would SILENTLY drop
predicted reflections, and interpret/CPU runs cannot catch TPU-specific
precision behaviour (bf16 default matmul passes, fused rounding).  This
harness predicts random experiments — random triclinic-ish cells, random
orientations, panel distances, wavelengths and scan spans — on the device
path AND the host path and demands:

  * identical reflection membership (hkl multiset per image, exact);
  * xyzcal parity (<= 1e-6 px — both ends are f64 once a ray is accepted).

Run:  python tools/fuzz_predict.py [N_SEEDS [START_SEED]]
(defaults 20 0; each seed is a full predict over 4-10 images).  Run on the
TPU, serialized against other work.  CPU fallback exercises the same code
paths minus the TPU numerics.
"""

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/ffs_tpu_xla")
)

import numpy as np

sys.path.insert(0, ".")


def run_seed(seed: int) -> dict:
    import jax

    jax.config.update("jax_enable_x64", True)

    from ffs_tpu.models.crystal import Crystal
    from ffs_tpu.models.experiment import Experiment
    from ffs_tpu.models.geometry import (
        Goniometer,
        MonochromaticBeam,
        Scan,
        simple_panel,
    )
    from ffs_tpu.prediction import rotation as rot

    rng = np.random.default_rng(seed)
    # random cell: lengths 25-120 A, right-handed random orientation
    lengths = rng.uniform(25.0, 120.0, 3)
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    vecs = np.diag(lengths) @ q.T
    # mild shear for non-orthogonal cells
    shear = np.eye(3) + rng.uniform(-0.15, 0.15, (3, 3)) * (1 - np.eye(3))
    vecs = vecs @ shear.T
    crystal = Crystal(vecs[0], vecs[1], vecs[2])

    npx = int(rng.integers(512, 2200))
    dist = float(rng.uniform(80.0, 350.0))
    px = float(rng.uniform(0.05, 0.2))
    panel = simple_panel(dist, (npx / 2, npx / 2), (px, px), (npx, npx))
    wl = float(rng.uniform(0.7, 2.0))
    n_img = int(rng.integers(4, 11))
    osc = float(rng.uniform(0.05, 0.5))
    expt = Experiment(
        beam=MonochromaticBeam(wavelength=wl),
        panel=panel,
        goniometer=Goniometer(),
        scan=Scan(image_range=(1, n_img), oscillation=(0.0, osc)),
        crystal=crystal,
    )

    pd = rot.predict_rotation(expt, use_device=True)
    ph = rot.predict_rotation(expt, use_device=False)
    res = {"seed": seed, "n_dev": len(pd.hkl), "n_host": len(ph.hkl)}
    if len(pd.hkl) != len(ph.hkl):
        res["fail"] = "count"
        return res
    if len(pd.hkl) == 0:
        res["px_diff"] = 0.0
        return res

    def keys(p):
        return np.lexsort(
            (
                p.xyzcal_px[:, 2],
                p.hkl[:, 2], p.hkl[:, 1], p.hkl[:, 0],
                p.entering,
            )
        )

    kd, kh = keys(pd), keys(ph)
    if not (pd.hkl[kd] == ph.hkl[kh]).all():
        res["fail"] = "membership"
        return res
    if not (pd.entering[kd] == ph.entering[kh]).all():
        res["fail"] = "entering"
        return res
    px_diff = float(np.abs(pd.xyzcal_px[kd] - ph.xyzcal_px[kh]).max())
    res["px_diff"] = px_diff
    if px_diff > 1e-6:
        res["fail"] = "px"
    return res


def main() -> int:
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    fails = 0
    t0 = time.time()
    for seed in range(start, start + n_seeds):
        r = run_seed(seed)
        status = r.get("fail", "ok")
        print(
            f"seed {seed}: n={r['n_dev']}/{r['n_host']} "
            f"px_diff={r.get('px_diff', float('nan')):.2e} {status}",
            flush=True,
        )
        if status != "ok":
            fails += 1
    print(
        f"{n_seeds} seeds, {fails} failures, {time.time() - t0:.0f} s",
        flush=True,
    )
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
