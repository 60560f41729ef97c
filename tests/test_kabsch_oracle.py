"""Production Kabsch device path vs the independent CPU f64 oracle.

The reference validates its GPU Kabsch kernel against an independently
written CPU baseline integrator (reference: integrator.cc:1030-1096 — the
``--compare`` path diffing GPU vs CPU accumulators).  Here the production
blocked device step (corner-field gathers, hi/lo f32 split, MXU one-hot
histogram, exact-integer sum decomposition) is checked against
ffs_tpu/integration/reference_kabsch.py, which re-derives every corner's
geometry inline in f64 and accumulates per pixel — no shared code beyond
the model objects.  Agreement is exact: the classification must match on
every pixel and every accumulator is integer- or half-integer-exact.
"""

import types

import numpy as np
import pytest

from ffs_tpu.integration import extent as extent_mod
from ffs_tpu.integration import kabsch as kb
from ffs_tpu.integration.reference_kabsch import integrate_reference
from ffs_tpu.prediction.rotation import predict_rotation

from .test_integration import _SyntheticReader, integration_experiment  # noqa: F401


@pytest.mark.parametrize("algorithm", ["ellipsoid", "dials"])
def test_blocked_step_matches_independent_oracle(
    integration_experiment, algorithm  # noqa: F811
):
    expt = integration_experiment
    pred = predict_rotation(expt, dmin=4.0, use_device=False)
    x, y, z = pred.xyzcal_px.T
    keep = (x > 20) & (x < 220) & (y > 20) & (y < 240) & (z > 1.5) & (z < 10.5)
    hkl, s1 = pred.hkl[keep], pred.s1[keep]
    phi = pred.xyzcal_mm[keep][:, 2]
    assert len(hkl) >= 5

    P = types.SimpleNamespace(
        hkl=hkl, s1=s1,
        xyzcal_px=pred.xyzcal_px[keep], xyzcal_mm=pred.xyzcal_mm[keep],
    )
    reader = _SyntheticReader(expt, P, seed=3)
    # knock out a mask block overlapping some shoeboxes so the mask path
    # is exercised, not just all-ones
    reader._mask[100:120, 80:160] = 0

    sigma_b, sigma_m = np.deg2rad(0.08), np.deg2rad(0.4)
    bboxes = extent_mod.compute_kabsch_bounding_boxes(
        expt.beam.s0, expt.goniometer.rotation_axis, s1, phi,
        sigma_b, sigma_m, expt.panel, expt.scan,
    )
    w, h = expt.panel.image_size
    bboxes[:, 0] = np.clip(bboxes[:, 0], 0, w - 1)
    bboxes[:, 1] = np.clip(bboxes[:, 1], 0, w - 1)
    bboxes[:, 2] = np.clip(bboxes[:, 2], 0, h - 1)
    bboxes[:, 3] = np.clip(bboxes[:, 3], 0, h - 1)

    delta_b, delta_m = 3 * sigma_b * 2, 3 * sigma_m
    integ = kb.KabschIntegrator(
        panel=expt.panel, beam=expt.beam, gonio=expt.goniometer,
        scan=expt.scan, s1=s1, phi=phi, bboxes=bboxes,
        delta_b=delta_b, delta_m=delta_m, algorithm=algorithm,
        max_active=128,
    )
    acc = kb.Accumulators.zeros(len(hkl))
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

    assert acc.fg_count.sum() > 0 and want["fg_count"].sum() > 0
    np.testing.assert_array_equal(acc.fg_count, want["fg_count"])
    np.testing.assert_array_equal(acc.bg_count, want["bg_count"])
    np.testing.assert_array_equal(acc.bg_overflow, want["bg_overflow"])
    np.testing.assert_array_equal(acc.bg_hist, want["bg_hist"])
    np.testing.assert_array_equal(acc.fg_sum, want["fg_sum"])
    # half-integer-exact moment sums: identical in f64 regardless of order
    np.testing.assert_array_equal(acc.sum_ix, want["sum_ix"])
    np.testing.assert_array_equal(acc.sum_iy, want["sum_iy"])
    np.testing.assert_array_equal(acc.sum_iz, want["sum_iz"])
    # the mask block actually removed pixels from at least one shoebox
    full = (bboxes[:, 1] - bboxes[:, 0] + 1) * (bboxes[:, 3] - bboxes[:, 2] + 1)
    per_frame_px = acc.fg_count + acc.bg_count
    depth = bboxes[:, 5] - bboxes[:, 4]
    assert (per_frame_px < full * depth).any()
