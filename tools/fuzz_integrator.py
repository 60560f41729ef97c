"""Randomized differential fuzz of the blocked Kabsch integrator.

Drives the production blocked device step (integration/kabsch.py —
corner-field gathers, hi/lo f32 corner split, MXU one-hot histograms,
exact split-i32 moment dots, lane packing) against the independent CPU
f64 oracle (integration/reference_kabsch.py, which re-derives every
corner's scattered wavevector inline and accumulates per pixel) over
randomized experiments, and asserts EXACT equality of every accumulator
— the same contract tests/test_kabsch_oracle.py pins at one fixed
geometry, here swept over:

  * random detector geometry (distance, pixel size, beam centre,
    parallax px<->mm on a third of seeds);
  * random triclinic-ish cells at random orientations, random
    oscillation widths;
  * random sigma_b/sigma_m/n_sigma (shoebox sizes from a few px up to
    the lane-packing boundary), both algorithms (ellipsoid / dials);
  * lane-packed vs classic step, max_active 64/128 chunking;
  * Poisson background at random rates + saturating high counts,
    random detector-mask bands and holes overlapping shoeboxes.

Usage: python tools/fuzz_integrator.py [N_SEEDS [START_SEED]]
Exit code 0 = every accumulator of every seed bit-identical.
"""

from __future__ import annotations

import os
import sys

if __name__ == "__main__":
    os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from ffs_tpu.integration import extent as extent_mod  # noqa: E402
from ffs_tpu.integration import kabsch as kb  # noqa: E402
from ffs_tpu.integration.reference_kabsch import integrate_reference  # noqa: E402
from ffs_tpu.models.crystal import Crystal  # noqa: E402
from ffs_tpu.models.experiment import Experiment  # noqa: E402
from ffs_tpu.models.geometry import (  # noqa: E402
    Goniometer,
    MonochromaticBeam,
    Scan,
    simple_panel,
)
from ffs_tpu.prediction.rotation import predict_rotation  # noqa: E402

PANEL_SIZES = [(240, 260), (200, 208), (288, 224)]


def _random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


class _Reader:
    """Poisson background + dense Gaussian spots at the predictions."""

    def __init__(self, expt, xyzcal_px, rng, bg_lam, intensity):
        w, h = expt.panel.image_size
        z0, z1 = expt.scan.image_range
        n_img = z1 - z0 + 1
        self.frames = rng.poisson(bg_lam, size=(n_img, h, w)).astype(np.float64)
        yy, xx = np.mgrid[0:h, 0:w]
        for px, py, pz in xyzcal_px:
            for z in range(n_img):
                fz = np.exp(-((z + 0.5 - (pz + 0.5)) ** 2) / (2 * 0.5**2))
                if fz < 1e-3:
                    continue
                g = np.exp(-(((xx - px) ** 2 + (yy - py) ** 2) / (2 * 1.2**2)))
                self.frames[z] += intensity * fz * g
        # a few very large counts: the bg histogram overflow path
        n_hot = int(rng.integers(0, 6))
        if n_hot:
            self.frames[
                rng.integers(0, n_img, n_hot),
                rng.integers(0, h, n_hot),
                rng.integers(0, w, n_hot),
            ] = float(rng.integers(300, 70000))
        self.frames = np.round(self.frames)
        self._mask = np.ones((h, w), dtype=np.uint8)

    def get_image(self, img_no):
        return self.frames[img_no]

    def get_mask(self):
        return self._mask

    def get_number_of_images(self):
        return len(self.frames)


def run_seed(seed: int, verbose: bool = False) -> bool:
    rng = np.random.default_rng(seed)
    w_px, h_px = PANEL_SIZES[seed % len(PANEL_SIZES)]
    pixel = float(rng.choice([0.15, 0.2, 0.3]))
    parallax = seed % 3 == 0
    panel_kw = dict(
        distance_mm=float(rng.uniform(90.0, 180.0)),
        beam_center_px=(
            w_px / 2 + float(rng.uniform(-15, 15)),
            h_px / 2 + float(rng.uniform(-15, 15)),
        ),
        pixel_size_mm=(pixel, pixel),
        image_size=(w_px, h_px),
    )
    if parallax:
        panel_kw.update(
            mu=float(rng.uniform(0.2, 0.5)), thickness=0.45, parallax=True
        )

    cell = rng.uniform(35.0, 70.0, size=3)
    R = _random_rotation(rng)
    vecs = np.diag(cell) @ R.T
    expt = Experiment(
        beam=MonochromaticBeam(wavelength=float(rng.uniform(0.8, 1.4))),
        panel=simple_panel(**panel_kw),
        goniometer=Goniometer(),
        scan=Scan(
            image_range=(1, 12),
            oscillation=(0.0, float(rng.choice([0.5, 1.0]))),
        ),
        crystal=Crystal(vecs[0], vecs[1], vecs[2]),
    )

    pred = predict_rotation(expt, dmin=4.0, use_device=False)
    x, y, z = pred.xyzcal_px.T
    keep = (
        (x > 20) & (x < w_px - 20) & (y > 20) & (y < h_px - 20)
        & (z > 1.5) & (z < 10.5)
    )
    idx = np.nonzero(keep)[0]
    if len(idx) < 5:
        if verbose:
            print(f"  seed {seed}: only {len(idx)} usable predictions, skip")
        return True
    idx = idx[rng.permutation(len(idx))[:40]]
    s1 = pred.s1[idx]
    phi = pred.xyzcal_mm[idx][:, 2]

    sigma_b = np.deg2rad(rng.uniform(0.04, 0.10))
    sigma_m = np.deg2rad(rng.uniform(0.25, 0.50))
    n_sig = float(rng.uniform(2.5, 3.5))
    delta_b, delta_m = n_sig * sigma_b * 2, n_sig * sigma_m
    bboxes = extent_mod.compute_kabsch_bounding_boxes(
        expt.beam.s0, expt.goniometer.rotation_axis, s1, phi,
        sigma_b, sigma_m, expt.panel, expt.scan,
    )
    bboxes[:, 0] = np.clip(bboxes[:, 0], 0, w_px - 1)
    bboxes[:, 1] = np.clip(bboxes[:, 1], 0, w_px - 1)
    bboxes[:, 2] = np.clip(bboxes[:, 2], 0, h_px - 1)
    bboxes[:, 3] = np.clip(bboxes[:, 3], 0, h_px - 1)

    reader = _Reader(
        expt, pred.xyzcal_px[idx], rng,
        bg_lam=float(rng.choice([1.0, 4.0, 9.0])),
        intensity=float(rng.uniform(100.0, 600.0)),
    )
    mask_kind = int(rng.integers(0, 3))
    if mask_kind == 1:  # band across the shoebox region
        r0 = int(rng.integers(h_px // 4, 3 * h_px // 4))
        reader._mask[r0 : r0 + int(rng.integers(2, 8)), :] = 0
    elif mask_kind == 2:  # scattered holes
        reader._mask[rng.random((h_px, w_px)) < 0.01] = 0

    algorithm = "ellipsoid" if seed % 2 == 0 else "dials"
    lane_pack = (seed // 2) % 2 == 0
    integ = kb.KabschIntegrator(
        panel=expt.panel, beam=expt.beam, gonio=expt.goniometer,
        scan=expt.scan, s1=s1, phi=phi, bboxes=bboxes,
        delta_b=delta_b, delta_m=delta_m, algorithm=algorithm,
        max_active=int(rng.choice([64, 128])), lane_pack=lane_pack,
    )
    acc = kb.Accumulators.zeros(len(idx))
    image_numbers = list(range(0, 12))
    integ.integrate(reader, image_numbers, acc)

    osc_start, osc_width = expt.scan.oscillation
    z0 = expt.scan.image_range[0]
    phi_lows = np.deg2rad(
        osc_start + (np.asarray(image_numbers) - (z0 - 1)) * osc_width
    )
    want = integrate_reference(
        frames=reader.frames,
        det_mask=reader._mask,
        bboxes=bboxes,
        s1=s1,
        phi=phi,
        s0=expt.beam.s0,
        rotation_axis=expt.goniometer.rotation_axis,
        panel=expt.panel,
        wavelength=expt.beam.wavelength,
        phi_lows=phi_lows,
        d_osc=float(np.deg2rad(osc_width)),
        z_values=np.asarray(image_numbers, dtype=np.float64),
        delta_b=delta_b,
        delta_m=delta_m,
        algorithm=algorithm,
        centre_slices=True,
    )

    tag = (
        f"{w_px}x{h_px} px={pixel} plx={int(parallax)} alg={algorithm} "
        f"pack={int(lane_pack)} mask={mask_kind} n={len(idx)}"
    )
    errs = []
    if acc.fg_count.sum() == 0 or want["fg_count"].sum() == 0:
        errs.append("no foreground classified at all")
    for name, got in (
        ("fg_count", acc.fg_count), ("bg_count", acc.bg_count),
        ("bg_overflow", acc.bg_overflow), ("bg_hist", acc.bg_hist),
        ("fg_sum", acc.fg_sum), ("sum_ix", acc.sum_ix),
        ("sum_iy", acc.sum_iy), ("sum_iz", acc.sum_iz),
    ):
        if not np.array_equal(np.asarray(got), np.asarray(want[name])):
            bad = int((np.asarray(got) != np.asarray(want[name])).sum())
            errs.append(f"{name}: {bad} mismatching entries")
    if errs:
        print(f"MISMATCH seed={seed} [{tag}]: " + "; ".join(errs))
        return False
    if verbose:
        print(f"  seed {seed} ok [{tag}] fg_px={int(acc.fg_count.sum())}")
    return True


def main():
    n_seeds = 20
    start = 0
    digits = [int(a) for a in sys.argv[1:] if a.isdigit()]
    if digits:
        n_seeds = digits[0]
    if len(digits) > 1:
        start = digits[1]
    failures = 0
    for seed in range(start, start + n_seeds):
        try:
            if not run_seed(seed, verbose=True):
                failures += 1
        except Exception as e:  # a crash is a finding too
            print(f"CRASH seed={seed}: {type(e).__name__}: {e}")
            failures += 1
    print(f"integrator fuzz done: {n_seeds} seeds, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
