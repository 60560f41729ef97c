"""Cross-validation of the two independently-derived spotfinding oracles.

``ffs_tpu.ops.reference`` evaluates the DIALS boxed-inequality form in f64
(the production parity contract); ``ffs_tpu.ops.reference_division`` is a
second, independent implementation in the reference GPU kernel's literal
f32 mean/variance division form (reference: thresholding.cu:104-124).  The
forms are algebraically identical, so any disagreement must be floating
point — these tests characterise exactly when that can happen:

* on frames whose f64 predicate margins are comfortably away from zero the
  two forms agree pixel-for-pixel (fuzzed over scales up to the uint16
  range, where f32 rounding of sum/sumsq is live);
* disagreements are only permitted on pixels whose f64 relative margin is
  inside the f32 rounding envelope of the division form;
* exact integer ties on the predicate boundary reject in BOTH forms
  (strict ``>``), pinned by hand-built tie vectors.

A shared-derivation bug in the boxed form (e.g. a flipped tie behaviour vs
the division the GPU computes) would fail these tests while passing every
self-consistent kernel/oracle comparison.
"""

import numpy as np
import pytest

from ffs_tpu.ops import reference as box
from ffs_tpu.ops import reference_division as div
from ffs_tpu.constants import DEFAULT_NSIG_B, DEFAULT_NSIG_S

TRUSTED = float(np.iinfo(np.uint16).max)


def _margins(image, mask, radius=3):
    """f64 relative margins of the two dispersion predicates."""
    m, x, y = box.local_statistics(image, mask, radius)
    mf, xf, yf = (v.astype(np.float64) for v in (m, x, y))
    src = image.astype(np.float64)
    a = mf * yf - xf * xf - xf * (mf - 1)
    c = xf * DEFAULT_NSIG_B * np.sqrt(2 * (mf - 1))
    b = mf * src - xf
    d = DEFAULT_NSIG_S * np.sqrt(xf * mf)
    eps = np.finfo(np.float64).tiny
    mbg = (a - c) / np.maximum(np.maximum(np.abs(a), np.abs(c)), eps)
    msig = (b - d) / np.maximum(np.maximum(np.abs(b), np.abs(d)), eps)
    return mbg, msig


def _assert_agreement(image, mask, *, tol=2e-6):
    """Both forms agree except inside the f32 rounding envelope."""
    want = box.dispersion(image, mask, TRUSTED)
    got = div.dispersion_division_f32(image, mask, TRUSTED)
    diff = want != got
    if not diff.any():
        return 0
    mbg, msig = _margins(image, mask)
    # a disagreeing pixel must be a genuine near-tie on at least one
    # predicate: |relative margin| within the f32 envelope (a few ulps of
    # the division-form arithmetic, which rounds sum/sumsq/mean/variance)
    near = np.minimum(np.abs(mbg), np.abs(msig)) < tol
    bad = diff & ~near
    assert not bad.any(), (
        f"{bad.sum()} disagreements outside the near-tie envelope; "
        f"worst margins bg={np.abs(mbg[bad]).min() if bad.any() else 0} "
        f"sig={np.abs(msig[bad]).min() if bad.any() else 0}"
    )
    return int(diff.sum())


@pytest.mark.parametrize("lam", [2.0, 30.0, 400.0, 3000.0])
def test_fuzz_dispersion_forms_random(lam):
    rng = np.random.default_rng(int(lam))
    total_px = 0
    total_diff = 0
    for trial in range(4):
        image = rng.poisson(lam, size=(96, 128)).astype(np.uint16)
        mask = np.ones_like(image, dtype=np.uint8)
        mask[rng.random(image.shape) < 0.02] = 0
        total_diff += _assert_agreement(image, mask)
        total_px += image.size
    # near-tie disagreement should be vanishingly rare on random frames
    assert total_diff <= total_px * 1e-4


def test_fuzz_dispersion_forms_adversarial():
    """Frames engineered to straddle the predicate boundaries."""
    rng = np.random.default_rng(99)
    for trial in range(6):
        # flat background whose dispersion sits near 1 plus pixels scaled
        # to sit near the signal threshold: mean lam, threshold ~
        # lam + 3*sqrt(lam) -> sprinkle values at exactly that boundary
        lam = float(rng.uniform(5, 50))
        image = rng.poisson(lam, size=(64, 96)).astype(np.float64)
        thr = lam + DEFAULT_NSIG_S * np.sqrt(lam)
        sel = rng.random(image.shape) < 0.3
        image[sel] = np.round(thr) + rng.integers(-1, 2, size=int(sel.sum()))
        image = image.astype(np.uint16)
        mask = np.ones_like(image, dtype=np.uint8)
        _assert_agreement(image, mask)


def test_exact_tie_rejects_in_both_forms():
    """An exact integer tie a == c on the variance test: strict > in both
    forms must reject (DIALS semantics).  Window: 33 valid pixels (mask
    carved), values {14x1, 2x22, 1x8, 0x2}: m=33, x=66, y=292 gives
    a = 33*292 - 66^2 - 32*66 = 3168 = 66*6*8 = x*nsig_b*sqrt(2*32) = c.
    """
    h = w = 9
    image = np.zeros((h, w), np.uint16)
    mask = np.zeros((h, w), np.uint8)
    # 33 valid positions in the 7x7 window centred at (4, 4)
    vals = [14] + [2] * 22 + [1] * 8 + [0] * 2
    pos = [(r, c) for r in range(1, 8) for c in range(1, 8)][: len(vals)]
    for (r, c), v in zip(pos, vals):
        image[r, c] = v
        mask[r, c] = 1
    m, x, y = box.local_statistics(image, mask, 3)
    assert m[4, 4] == 33 and x[4, 4] == 66 and y[4, 4] == 292
    a = 33 * 292 - 66 * 66 - 32 * 66
    c = 66 * 6 * int(np.sqrt(2 * 32))
    assert a == c == 3168
    assert not box.dispersion(image, mask, TRUSTED)[4, 4]
    assert not div.dispersion_division_f32(image, mask, TRUSTED)[4, 4]


def test_signal_tie_rejects_in_both_forms():
    """Exact tie on the signal test: mean = 4 (n=49, x=196), threshold =
    4 + 3*2 = 10, centre pixel = 10 -> strict > rejects in both forms."""
    image = np.full((13, 13), 4, np.uint16)
    image[6, 6] = 10
    # rebalance the centre window sum back to 196: drop 6 from a corner
    image[3, 3] = 0
    image[3, 4] = 2
    mask = np.ones_like(image, dtype=np.uint8)
    m, x, _ = box.local_statistics(image, mask, 3)
    assert m[6, 6] == 49 and x[6, 6] == 196
    assert not box.dispersion(image, mask, TRUSTED)[6, 6]
    assert not div.dispersion_division_f32(image, mask, TRUSTED)[6, 6]


def test_extended_forms_agree(small_frame):
    image, mask = small_frame
    want = box.dispersion_extended(image, mask, TRUSTED)
    got = div.dispersion_extended_division_f32(image, mask, TRUSTED)
    diff = int((want != got).sum())
    # the 11x11 second pass divides x/n in f32; allow only isolated
    # near-tie flips, not systematic divergence
    assert diff <= 3, f"extended forms diverge on {diff} pixels"


def test_division_form_reproduces_sample_anchor():
    """The division form independently reproduces the module-edge anchor
    count on deterministic sample image 5 (2388 strong pixels) — the same
    value the boxed oracle and both Pallas kernels pin."""
    from ffs_tpu.io import sample_data

    image = sample_data.generate_sample_image(5)
    mask = sample_data.generate_mask()
    got = div.dispersion_division_f32(image, mask, 65535.0)
    assert int(got.sum()) == 2388
