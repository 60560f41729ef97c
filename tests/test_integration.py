"""Summation integration: backgrounds, extents, end-to-end recovery."""

import numpy as np
import pytest

from ffs_tpu.integration import background as bg
from ffs_tpu.integration import extent as extent_mod
from ffs_tpu.integration import finalize as fin
from ffs_tpu.integration import kabsch as kb
from ffs_tpu.models.crystal import Crystal
from ffs_tpu.models.experiment import Experiment
from ffs_tpu.models.geometry import Goniometer, MonochromaticBeam, Scan, simple_panel
from ffs_tpu.prediction.rotation import predict_rotation


def _hist(values):
    values = np.asarray(values)
    overflow = int((values >= bg.NUM_BG_BINS).sum())
    bins = np.bincount(values[values < bg.NUM_BG_BINS], minlength=bg.NUM_BG_BINS)
    return bins, overflow


def test_tukey_background():
    rng = np.random.default_rng(7)
    vals = rng.poisson(5.0, size=500)
    bins, overflow = _hist(vals)
    mean, wsum, valid = bg.tukey_constant_background(bins[None], np.array([overflow]))
    assert valid[0]
    # Tukey mean of a well-behaved Poisson sample is close to the true mean
    assert mean[0] == pytest.approx(5.0, abs=0.4)

    # outliers are rejected
    vals2 = np.concatenate([vals, np.full(20, 200)])
    bins2, overflow2 = _hist(vals2)
    mean2, _, valid2 = bg.tukey_constant_background(bins2[None], np.array([overflow2]))
    assert valid2[0] and mean2[0] == pytest.approx(mean[0], abs=0.1)

    # empty histogram invalid
    _, _, v = bg.tukey_constant_background(
        np.zeros((1, bg.NUM_BG_BINS), int), np.zeros(1, int)
    )
    assert not v[0]


def test_glm_background():
    rng = np.random.default_rng(8)
    for mu in (2.0, 7.5, 40.0):
        vals = rng.poisson(mu, size=800)
        bins, overflow = _hist(vals)
        mean, wsum, valid = bg.glm_constant_background(bins[None], np.array([overflow]))
        assert valid[0]
        assert mean[0] == pytest.approx(mu, rel=0.1)
        assert wsum[0] == pytest.approx(mean[0] * len(vals))

    # robustness: a block of high outliers barely moves the estimate
    vals = rng.poisson(5.0, size=800)
    bins, _ = _hist(np.concatenate([vals, np.full(40, 120)]))
    mean, _, valid = bg.glm_constant_background(bins[None], np.array([0]))
    assert valid[0] and mean[0] == pytest.approx(5.0, abs=0.5)

    # too few pixels -> invalid
    bins3, o3 = _hist(rng.poisson(5.0, size=5))
    _, _, v3 = bg.glm_constant_background(bins3[None], np.array([o3]))
    assert not v3[0]


@pytest.fixture()
def integration_experiment():
    crystal = Crystal([40.0, 0, 0], [0, 50.0, 0], [0, 0, 60.0])
    expt = Experiment(
        beam=MonochromaticBeam(wavelength=1.0),
        panel=simple_panel(120.0, (120.0, 130.0), (0.3, 0.3), (240, 260)),
        goniometer=Goniometer(),
        scan=Scan(image_range=(1, 12), oscillation=(0.0, 1.0)),
        crystal=crystal,
    )
    return expt


def test_bounding_boxes_contain_predictions(integration_experiment):
    expt = integration_experiment
    pred = predict_rotation(expt, dmin=4.0, use_device=False)
    assert len(pred.hkl) > 10
    sigma_b, sigma_m = np.deg2rad(0.05), np.deg2rad(0.3)
    bboxes = extent_mod.compute_kabsch_bounding_boxes(
        expt.beam.s0,
        expt.goniometer.rotation_axis,
        pred.s1,
        pred.xyzcal_mm[:, 2],
        sigma_b,
        sigma_m,
        expt.panel,
        expt.scan,
    )
    x, y, z = pred.xyzcal_px.T
    assert (bboxes[:, 0] <= x).all() and (x <= bboxes[:, 1] + 1).all()
    assert (bboxes[:, 2] <= y).all() and (y <= bboxes[:, 3] + 1).all()
    assert (bboxes[:, 4] <= z + 0.5).all() and (z - 0.5 <= bboxes[:, 5]).all()


class _SyntheticReader:
    """Frames with Poisson background + Gaussian spots at predictions."""

    def __init__(self, expt, pred, intensity=2000.0, bg_level=4.0, seed=0):
        rng = np.random.default_rng(seed)
        w, h = expt.panel.image_size
        z0, z1 = expt.scan.image_range
        n_img = z1 - z0 + 1
        self.frames = rng.poisson(bg_level, size=(n_img, h, w)).astype(np.float64)
        self.injected = np.zeros(len(pred.hkl))
        yy, xx = np.mgrid[0:h, 0:w]
        for i, (px, py, pz) in enumerate(pred.xyzcal_px):
            for z in range(n_img):
                # spread over z with a Gaussian of width 0.5 frames
                fz = np.exp(-((z + 0.5 - (pz + 0.5)) ** 2) / (2 * 0.5**2))
                if fz < 1e-3:
                    continue
                g = np.exp(
                    -(((xx - px) ** 2 + (yy - py) ** 2) / (2 * 1.2**2))
                )
                spot = intensity * fz * g / (2 * np.pi * 1.2**2 * np.sqrt(2 * np.pi) * 0.5)
                self.frames[z] += spot
                self.injected[i] += spot.sum()
        self.frames = np.round(self.frames)
        self._mask = np.ones((h, w), dtype=np.uint8)

    def get_image(self, img_no):
        return self.frames[img_no]

    def get_mask(self):
        return self._mask

    def get_number_of_images(self):
        return len(self.frames)


def test_integration_end_to_end(integration_experiment):
    expt = integration_experiment
    pred = predict_rotation(expt, dmin=4.0, use_device=False)
    # keep reflections away from the detector edges
    x, y, z = pred.xyzcal_px.T
    keep = (x > 20) & (x < 220) & (y > 20) & (y < 240) & (z > 1.5) & (z < 10.5)
    hkl, s1 = pred.hkl[keep], pred.s1[keep]
    xyzcal_px, xyzcal_mm = pred.xyzcal_px[keep], pred.xyzcal_mm[keep]
    assert len(hkl) >= 5

    import types

    P = types.SimpleNamespace(
        hkl=hkl, s1=s1, xyzcal_px=xyzcal_px, xyzcal_mm=xyzcal_mm
    )
    reader = _SyntheticReader(expt, P)

    sigma_b = np.deg2rad(0.08)
    sigma_m = np.deg2rad(0.4)
    phi = xyzcal_mm[:, 2]
    bboxes = extent_mod.compute_kabsch_bounding_boxes(
        expt.beam.s0, expt.goniometer.rotation_axis, s1, phi,
        sigma_b, sigma_m, expt.panel, expt.scan,
    )
    w, h = expt.panel.image_size
    bboxes[:, 0] = np.clip(bboxes[:, 0], 0, w - 1)
    bboxes[:, 1] = np.clip(bboxes[:, 1], 0, w - 1)
    bboxes[:, 2] = np.clip(bboxes[:, 2], 0, h - 1)
    bboxes[:, 3] = np.clip(bboxes[:, 3], 0, h - 1)

    integ = kb.KabschIntegrator(
        panel=expt.panel, beam=expt.beam, gonio=expt.goniometer, scan=expt.scan,
        s1=s1, phi=phi, bboxes=bboxes,
        delta_b=3 * sigma_b * 2, delta_m=3 * sigma_m, max_active=256,
    )
    acc = kb.Accumulators.zeros(len(hkl))
    integ.integrate(reader, range(0, 12), acc)

    assert (acc.fg_count > 0).all()
    assert (acc.bg_count > 50).all()

    bg_mean, bg_wsum, bg_valid = bg.tukey_constant_background(acc.bg_hist, acc.bg_overflow)
    assert bg_valid.all()
    # background level recovered
    np.testing.assert_allclose(bg_mean, 4.0, atol=1.0)

    cs = extent_mod.coordinate_systems(
        expt.beam.s0, expt.goniometer.rotation_axis, s1
    )
    result = fin.finalize(
        acc=acc, bg_mean=bg_mean, bg_wsum=bg_wsum, bg_valid=bg_valid,
        bboxes=bboxes, s1=s1, phi=phi, hkl=hkl, zeta=cs.zeta,
        scan=expt.scan, beam=expt.beam, gonio=expt.goniometer,
        crystal=expt.crystal, sigma_m=sigma_m,
    )
    assert result.valid.all()
    # intensities recover the injected signal within uncertainty:
    # the foreground ellipsoid captures most but not all of the Gaussian
    ratio = result.intensity / reader.injected
    assert np.median(ratio) > 0.7
    assert (ratio < 1.15).all()
    # centroids land on the predictions
    np.testing.assert_allclose(result.xyzobs_px[:, 0], xyzcal_px[:, 0], atol=1.0)
    np.testing.assert_allclose(result.xyzobs_px[:, 1], xyzcal_px[:, 1], atol=1.0)
    # d-spacings positive and sensible
    assert (result.d > 3.9).all()
    # LP corrections positive
    assert (result.lp > 0).all()


def test_integration_bit_stable_between_runs(integration_experiment):
    """Two identical integrate() runs must produce bit-identical
    accumulators (the reference uses double/u64 atomics for exactly this
    guarantee: integrator.cc:785-794; here XLA's fixed reduction order +
    f64 sums provide it)."""
    expt = integration_experiment
    pred = predict_rotation(expt, dmin=4.0, use_device=False)
    x, y, z = pred.xyzcal_px.T
    keep = (x > 20) & (x < 220) & (y > 20) & (y < 240) & (z > 1.5) & (z < 10.5)
    s1 = pred.s1[keep]
    phi = pred.xyzcal_mm[keep][:, 2]

    import types

    P = types.SimpleNamespace(
        hkl=pred.hkl[keep], s1=s1,
        xyzcal_px=pred.xyzcal_px[keep], xyzcal_mm=pred.xyzcal_mm[keep],
    )
    reader = _SyntheticReader(expt, P)
    sigma_b, sigma_m = np.deg2rad(0.08), np.deg2rad(0.4)
    bboxes = extent_mod.compute_kabsch_bounding_boxes(
        expt.beam.s0, expt.goniometer.rotation_axis, s1, phi,
        sigma_b, sigma_m, expt.panel, expt.scan,
    )
    w, h = expt.panel.image_size
    for j, lim in ((0, w - 1), (1, w - 1), (2, h - 1), (3, h - 1)):
        bboxes[:, j] = np.clip(bboxes[:, j], 0, lim)

    accs = []
    for _ in range(2):
        integ = kb.KabschIntegrator(
            panel=expt.panel, beam=expt.beam, gonio=expt.goniometer,
            scan=expt.scan, s1=s1, phi=phi, bboxes=bboxes,
            delta_b=3 * sigma_b * 2, delta_m=3 * sigma_m, max_active=256,
        )
        acc = kb.Accumulators.zeros(len(s1))
        integ.integrate(reader, range(0, 12), acc)
        accs.append(acc)
    for f in ("fg_sum", "sum_ix", "sum_iy", "sum_iz"):
        a, b = getattr(accs[0], f), getattr(accs[1], f)
        np.testing.assert_array_equal(a, b)  # BITWISE equality, no tolerance
    np.testing.assert_array_equal(accs[0].bg_hist, accs[1].bg_hist)
    np.testing.assert_array_equal(accs[0].fg_count, accs[1].fg_count)


def test_lane_packed_step_bit_identical(integration_experiment):
    """The lane-packed classification path (4 reflections per 128-lane
    vreg row, kabsch._finish_block_step_packed) must produce BITWISE
    identical accumulators to the full-lane path on a real end-to-end
    integrate() run."""
    expt = integration_experiment
    pred = predict_rotation(expt, dmin=4.0, use_device=False)
    x, y, z = pred.xyzcal_px.T
    keep = (x > 20) & (x < 220) & (y > 20) & (y < 240) & (z > 1.5) & (z < 10.5)
    s1 = pred.s1[keep]
    phi = pred.xyzcal_mm[keep][:, 2]

    import types

    P = types.SimpleNamespace(
        hkl=pred.hkl[keep], s1=s1,
        xyzcal_px=pred.xyzcal_px[keep], xyzcal_mm=pred.xyzcal_mm[keep],
    )
    reader = _SyntheticReader(expt, P)
    sigma_b, sigma_m = np.deg2rad(0.08), np.deg2rad(0.4)
    bboxes = extent_mod.compute_kabsch_bounding_boxes(
        expt.beam.s0, expt.goniometer.rotation_axis, s1, phi,
        sigma_b, sigma_m, expt.panel, expt.scan,
    )
    w, h = expt.panel.image_size
    for j, lim in ((0, w - 1), (1, w - 1), (2, h - 1), (3, h - 1)):
        bboxes[:, j] = np.clip(bboxes[:, j], 0, lim)

    accs = {}
    groups = {}
    for lane_pack in (True, False):
        integ = kb.KabschIntegrator(
            panel=expt.panel, beam=expt.beam, gonio=expt.goniometer,
            scan=expt.scan, s1=s1, phi=phi, bboxes=bboxes,
            delta_b=3 * sigma_b * 2, delta_m=3 * sigma_m, max_active=256,
            lane_pack=lane_pack,
        )
        groups[lane_pack] = integ._lane_group
        acc = kb.Accumulators.zeros(len(s1))
        integ.integrate(reader, range(0, 12), acc)
        accs[lane_pack] = acc
    # the packed path must actually engage for this geometry
    assert groups[True] == 4 and groups[False] == 1
    for f in (
        "fg_sum", "fg_count", "sum_ix", "sum_iy", "sum_iz",
        "bg_hist", "bg_overflow", "bg_count",
    ):
        np.testing.assert_array_equal(
            getattr(accs[True], f), getattr(accs[False], f), err_msg=f
        )


def test_lane_packed_step_variants_bit_identical(integration_experiment):
    """Packed vs classic parity on the corners the end-to-end test does
    not reach: the 'dials' algorithm, a detector mask with dead pixels,
    inactive (padded) reflections, and a partially-valid frame block."""
    import jax
    import jax.numpy as jnp

    expt = integration_experiment
    pred = predict_rotation(expt, dmin=4.0, use_device=False)
    x, y, z = pred.xyzcal_px.T
    keep = (x > 20) & (x < 220) & (y > 20) & (y < 240) & (z > 1.5) & (z < 10.5)
    s1 = pred.s1[keep]
    phi = pred.xyzcal_mm[keep][:, 2]
    sigma_b, sigma_m = np.deg2rad(0.08), np.deg2rad(0.4)
    bboxes = extent_mod.compute_kabsch_bounding_boxes(
        expt.beam.s0, expt.goniometer.rotation_axis, s1, phi,
        sigma_b, sigma_m, expt.panel, expt.scan,
    )
    w, h = expt.panel.image_size
    for j, lim in ((0, w - 1), (1, w - 1), (2, h - 1), (3, h - 1)):
        bboxes[:, j] = np.clip(bboxes[:, j], 0, lim)

    rng = np.random.default_rng(11)
    det_mask = np.ones((h, w), dtype=np.uint8)
    det_mask[rng.integers(0, h, 400), rng.integers(0, w, 400)] = 0

    F = 4
    frames_np = rng.poisson(5.0, size=(F, h, w)).astype(np.uint16)
    phi_lows = jnp.asarray(np.deg2rad(np.arange(F) * 0.1))
    d_osc = jnp.float64(np.deg2rad(0.1))
    z_values = jnp.asarray(np.arange(2.0, 2.0 + F))
    frame_ok = jnp.asarray([True, True, True, False])

    cs = extent_mod.coordinate_systems(
        expt.beam.s0, expt.goniometer.rotation_axis, s1
    )

    for algorithm in ("ellipsoid", "dials"):
        outs = {}
        for lane_pack in (True, False):
            integ = kb.KabschIntegrator(
                panel=expt.panel, beam=expt.beam, gonio=expt.goniometer,
                scan=expt.scan, s1=s1, phi=phi, bboxes=bboxes,
                delta_b=3 * sigma_b * 2, delta_m=3 * sigma_m,
                algorithm=algorithm, max_active=64, lane_pack=lane_pack,
            )
            assert integ._lane_group == (4 if lane_pack else 1)
            integ.set_mask(det_mask)
            # a short chunk -> padded/inactive tail reflections
            chunk = np.arange(min(len(s1), 49))
            dev = integ._chunk_setup(chunk, cs.e1, cs.e2, cs.zeta)
            frames = jnp.asarray(integ.pad_frames(frames_np)).astype(
                jnp.int32
            )
            step = jax.jit(
                integ._block_step_impl, static_argnames=("centre_slices",)
            )
            outs[lane_pack] = step(
                frames, dev["e12"], dev["maskw"], dev["x0"], dev["y0"],
                dev["bbox"], dev["phi"], dev["zeta"], dev["active"],
                phi_lows, d_osc, z_values, frame_ok, centre_slices=True,
            )
        for k, (a, b) in enumerate(zip(outs[True], outs[False])):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"{algorithm} output {k}",
            )


def test_weighted_index_dot_exact_at_bounds():
    """The 13-bit-split i32 moment dot must equal the exact integer dot
    (as f64) everywhere in its stated domain: vals < 2**26, n <= 512 —
    including the all-maximal corner where the f64 emulation it replaced
    would still have been exact but any split overflow would not be."""
    import jax.numpy as jnp

    from ffs_tpu.integration.kabsch import _weighted_index_dot

    rng = np.random.default_rng(7)
    for n in (21, 128, 512):
        vals = rng.integers(0, 1 << 26, size=(17, n), dtype=np.int64)
        vals[0] = (1 << 26) - 1  # all-maximal row
        vals[1] = 0
        want = (vals * np.arange(n, dtype=np.int64)).sum(axis=1)
        got = np.asarray(
            _weighted_index_dot(jnp.asarray(vals, jnp.int32), n)
        )
        np.testing.assert_array_equal(got, want.astype(np.float64))

    with pytest.raises(AssertionError):
        _weighted_index_dot(jnp.zeros((2, 513), jnp.int32), 513)


def test_finalize_invalidates_background_failures_and_reads_polarization():
    """Reference success_final requires a valid background estimate
    (integrator.cc:1245-1248), and the LP correction reads the beam's
    polarization normal/fraction (integrator.cc:1228-1229) rather than
    hardcoded defaults."""
    from types import SimpleNamespace

    from ffs_tpu.models.geometry import (
        Goniometer,
        MonochromaticBeam,
        Scan,
    )

    n = 3
    acc = SimpleNamespace(
        fg_sum=np.array([100.0, 80.0, 0.0]),
        fg_count=np.array([10, 8, 0]),
        bg_count=np.array([30, 25, 0]),
        sum_ix=np.array([500.0, 400.0, 0.0]),
        sum_iy=np.array([500.0, 400.0, 0.0]),
        sum_iz=np.array([50.0, 40.0, 0.0]),
    )
    s1 = np.tile([0.1, 0.2, 1.0], (n, 1))
    s1 /= np.linalg.norm(s1, axis=1, keepdims=True) * 0.976
    common = dict(
        acc=acc,
        bg_mean=np.array([2.0, 3.0, 0.0]),
        bg_wsum=np.array([60.0, 75.0, 0.0]),
        bboxes=np.array([[0, 9, 0, 9, 0, 2]] * n),
        s1=s1,
        phi=np.deg2rad([0.05, 0.1, 0.15]),
        hkl=np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]]),
        zeta=np.array([0.9, 0.9, 0.9]),
        scan=Scan(image_range=(1, 3), oscillation=(0.0, 0.1)),
        gonio=Goniometer(),
        crystal=SimpleNamespace(a_matrix=np.eye(3) / 60.0),
        sigma_m=np.deg2rad(0.2),
    )

    beam = MonochromaticBeam(wavelength=0.976)
    res = fin.finalize(
        beam=beam, bg_valid=np.array([True, False, True]), **common
    )
    # reflection 1: measured but its background estimate was rejected ->
    # unsubtracted intensity must NOT carry the integrated flag
    assert res.valid.tolist() == [True, False, False]
    assert res.n_background_failures == 1

    # a non-default polarization fraction must change every lp value
    beam2 = MonochromaticBeam(wavelength=0.976, polarization_fraction=0.5)
    res2 = fin.finalize(
        beam=beam2, bg_valid=np.array([True, False, True]), **common
    )
    assert not np.allclose(res.lp, res2.lp)
    # and round-trips through the expt JSON beam block
    b3 = MonochromaticBeam.from_json(
        {"wavelength": 0.976, "polarization_fraction": 0.5,
         "polarization_normal": [0.0, 0.0, 1.0]}
    )
    assert b3.polarization_fraction == 0.5
    assert b3.polarization_normal.tolist() == [0.0, 0.0, 1.0]


def test_integrate_rejects_out_of_bound_32bit_values():
    """32-bit frames with pixel values past the exact-i32 accumulation
    bound must fail loudly: the device step's integer sums (and the
    .astype(int32) upload) would silently corrupt intensities."""
    from ffs_tpu.models.geometry import (
        Goniometer,
        MonochromaticBeam,
        Scan,
        simple_panel,
    )

    IW, IH, F = 128, 64, 4
    panel = simple_panel(150.0, (IW / 2, IH / 2), (0.075, 0.075), (IW, IH))
    beam = MonochromaticBeam(wavelength=0.976)
    scan = Scan(image_range=(1, F), oscillation=(0.0, 0.1))
    x = np.array([40.0, 80.0])
    y = np.array([30.0, 40.0])
    xmm, ymm = panel.px_to_mm(x, y)
    lab = panel.get_lab_coord(xmm, ymm)
    s1 = lab / np.linalg.norm(lab, axis=1, keepdims=True) / beam.wavelength
    phi = np.deg2rad(np.array([0.05, 0.15]))
    bboxes = np.stack(
        [x - 4, x + 4, y - 4, y + 4, [0, 0], [2, 2]], axis=1
    ).astype(np.int64)
    integ = kb.KabschIntegrator(
        panel=panel, beam=beam, gonio=Goniometer(), scan=scan,
        s1=s1, phi=phi, bboxes=bboxes,
        delta_b=np.deg2rad(0.3), delta_m=np.deg2rad(1.0), max_active=2,
    )

    class _HotReader:
        def __init__(self, hot):
            self.hot = hot

        def get_image(self, n):
            img = np.zeros((IH, IW), np.uint32)
            img[5, 5] = self.hot
            return img

        def get_mask(self):
            return None

    acc = kb.Accumulators.zeros(2)
    with pytest.raises(ValueError, match="exact-i32"):
        integ.integrate(_HotReader(2**27), range(0, F), acc)

    # in-bound 32-bit data (and any 16-bit data) integrates fine
    acc = kb.Accumulators.zeros(2)
    integ.integrate(_HotReader(60000), range(0, F), acc)


def test_integrate_chunk_z_band_scheduling():
    """Chunks run ONLY on frame blocks overlapping their z band.

    Regression: bboxes[c, 4].min(initial=0) folded 0 into the reduction,
    pinning every chunk's zmin to 0 — every chunk then ran a (masked,
    numerically harmless) full block step on every frame block and cached
    its device buffers from block 0."""
    import jax

    from ffs_tpu.models.geometry import (
        Goniometer,
        MonochromaticBeam,
        Scan,
        simple_panel,
    )

    rng = np.random.default_rng(3)
    IW, IH, F = 128, 64, 12
    panel = simple_panel(150.0, (IW / 2, IH / 2), (0.075, 0.075), (IW, IH))
    beam = MonochromaticBeam(wavelength=0.976)
    gonio = Goniometer()
    scan = Scan(image_range=(1, F), oscillation=(0.0, 0.1))
    A = 8  # two chunks of 4 at max_active=4
    x = rng.uniform(20, IW - 20, A)
    y = rng.uniform(20, IH - 20, A)
    xmm, ymm = panel.px_to_mm(x, y)
    lab = panel.get_lab_coord(xmm, ymm)
    s1 = lab / np.linalg.norm(lab, axis=1, keepdims=True) / beam.wavelength
    phi = np.deg2rad(rng.uniform(0, 0.2, A))
    zmin = np.array([0] * 4 + [8] * 4)
    bboxes = np.stack(
        [
            np.clip(x - 4, 0, IW - 1), np.clip(x + 4, 0, IW - 1),
            np.clip(y - 4, 0, IH - 1), np.clip(y + 4, 0, IH - 1),
            zmin, zmin + 2,
        ],
        axis=1,
    ).astype(np.int64)
    integ = kb.KabschIntegrator(
        panel=panel, beam=beam, gonio=gonio, scan=scan,
        s1=s1, phi=phi, bboxes=bboxes,
        delta_b=np.deg2rad(0.3), delta_m=np.deg2rad(1.0), max_active=4,
    )
    steps = []
    jitted = jax.jit(integ._block_step_impl, static_argnames=("centre_slices",))

    def counting(*a, **k):
        steps.append(1)
        return jitted(*a, **k)

    integ._block_jit = counting

    class _Reader:
        def get_image(self, n):
            return np.zeros((IH, IW), np.uint16)

        def get_mask(self):
            return None

    acc = kb.Accumulators.zeros(A)
    integ.integrate(_Reader(), range(0, F), acc)
    # blocks [0-3], [4-7], [8-11]: chunk z [0,2) touches only the first,
    # chunk z [8,10) only the last -> exactly 2 device steps
    assert len(steps) == 2


def test_finalize_device_matches_host():
    """finalize_device: one fused XLA program == the host numpy finalize
    (same math; erf implementations agree to f64 rounding)."""
    import numpy as np

    from ffs_tpu.integration import finalize as fin
    from ffs_tpu.integration.kabsch import Accumulators
    from ffs_tpu.models.crystal import Crystal
    from ffs_tpu.models.geometry import (
        Goniometer,
        MonochromaticBeam,
        Scan,
        simple_panel,
    )

    rng = np.random.default_rng(23)
    N = 4096
    acc = Accumulators.zeros(N)
    acc.fg_sum[:] = rng.poisson(500.0, N).astype(float)
    acc.fg_sum[:32] = 0.0  # unmeasured rows exercise the fallbacks
    acc.fg_count[:] = rng.integers(0, 60, N)
    acc.fg_count[:32] = 0
    acc.bg_count[:] = rng.integers(0, 400, N)
    acc.sum_ix[:] = acc.fg_sum * rng.uniform(100, 2000, N)
    acc.sum_iy[:] = acc.fg_sum * rng.uniform(100, 2000, N)
    acc.sum_iz[:] = acc.fg_sum * rng.uniform(0, 100, N)
    bg_mean = rng.uniform(3.5, 4.5, N)
    bg_wsum = rng.uniform(250, 350, N)
    bg_valid = rng.random(N) > 0.05
    s1 = rng.normal(size=(N, 3))
    s1 /= np.linalg.norm(s1, axis=1, keepdims=True) * 0.976
    bb = np.zeros((N, 6), dtype=np.int64)
    bb[:, 1] = bb[:, 3] = 20
    bb[:, 4] = rng.integers(0, 96, N)
    bb[:, 5] = bb[:, 4] + 4
    kw = dict(
        acc=acc, bg_mean=bg_mean, bg_wsum=bg_wsum, bg_valid=bg_valid,
        bboxes=bb, s1=s1, phi=np.deg2rad(rng.uniform(0, 10, N)),
        hkl=rng.integers(-40, 41, size=(N, 3)),
        zeta=rng.uniform(0.05, 1.0, N),
        scan=Scan(image_range=(1, 100), oscillation=(0.0, 0.1)),
        beam=MonochromaticBeam(wavelength=0.976),
        gonio=Goniometer(),
        crystal=Crystal(*np.diag([57.78, 57.78, 150.0])),
        sigma_m=np.deg2rad(0.1),
    )
    want = fin.finalize(**kw)
    got = fin.finalize_device(**kw)
    assert got.n_background_failures == want.n_background_failures
    assert (got.valid == want.valid).all()
    for f in (
        "intensity", "variance", "background_mean", "background_sum",
        "xyzobs_px", "partiality", "lp", "d",
    ):
        a, b = getattr(got, f), getattr(want, f)
        np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-14, err_msg=f)


def test_bbox_device_matches_host():
    """compute_kabsch_bounding_boxes_device == the host numpy extents,
    including parallax-corrected panels and degenerate-zeta rows."""
    import numpy as np

    from ffs_tpu.integration import extent
    from ffs_tpu.models.geometry import MonochromaticBeam, Scan, simple_panel

    rng = np.random.default_rng(31)
    N = 4096
    beam = MonochromaticBeam(wavelength=0.976)
    scan = Scan(image_range=(1, 100), oscillation=(0.0, 0.1))
    m2 = np.array([1.0, 0.0, 0.0])
    for parallax in (False, True):
        panel = simple_panel(
            200.0, (1034, 1082), (0.075, 0.075), (2068, 2164),
            mu=0.3974, thickness=0.45, parallax=parallax,
        )
        x = rng.uniform(50, 2000, N)
        y = rng.uniform(50, 2100, N)
        xmm, ymm = panel.px_to_mm(x, y)
        lab = panel.get_lab_coord(xmm, ymm)
        s1 = lab / np.linalg.norm(lab, axis=1, keepdims=True) / beam.wavelength
        # a few rows nearly parallel to the rotation axis (zeta ~ 0)
        phi = np.deg2rad(rng.uniform(0, 10, N))
        args = (
            np.asarray(beam.s0), m2, s1, phi,
            np.deg2rad(0.03), np.deg2rad(0.1), panel, scan,
        )
        want = extent.compute_kabsch_bounding_boxes(*args)
        got = extent.compute_kabsch_bounding_boxes_device(*args)
        assert got.shape == want.shape
        mismatch = (got != want).any(axis=1)
        # floor/ceil at an exact f64 boundary may differ by the erf-free
        # math reassociating: require bit-equality (the device math is
        # the same op order)
        assert not mismatch.any(), (
            f"parallax={parallax}: {int(mismatch.sum())} rows differ, "
            f"first {np.argwhere(mismatch)[:3].ravel()}"
        )
