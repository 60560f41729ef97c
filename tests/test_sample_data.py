"""Sample-data generator: bit-parity with the reference's PCG32 stream."""

import numpy as np

from ffs_tpu.constants import E2XE_16M_FAST, E2XE_16M_SLOW
from ffs_tpu.io import sample_data


def _pcg32_scalar(n, state=0, inc=1):
    """Direct scalar port of the reference PCG32 (h5read.c:187-200)."""
    out = []
    state = state & 0xFFFFFFFFFFFFFFFF
    for _ in range(n):
        old = state
        state = (old * 6364136223846793005 + (inc | 1)) & 0xFFFFFFFFFFFFFFFF
        xorshifted = (((old >> 18) ^ old) >> 27) & 0xFFFFFFFF
        rot = old >> 59
        out.append(((xorshifted >> rot) | (xorshifted << ((-rot) & 31))) & 0xFFFFFFFF)
    return out


def test_pcg32_vectorised_matches_scalar():
    n = 1000
    states = sample_data._pcg32_states(n)
    got = sample_data._pcg32_output(states)
    want = _pcg32_scalar(n)
    np.testing.assert_array_equal(got, np.array(want, dtype=np.uint32))


def test_mask_shape_and_gap_structure():
    mask = sample_data.generate_mask()
    assert mask.shape == (E2XE_16M_SLOW, E2XE_16M_FAST)
    # 4x8 modules of 1028x512
    assert int(mask.sum()) == 4 * 8 * 1028 * 512
    # gap rows/cols fully masked
    assert mask[512, :].sum() == 0
    assert mask[:, 1028].sum() == 0


def test_sample_images():
    img1 = sample_data.generate_sample_image(1)
    mask = sample_data.generate_mask()
    np.testing.assert_array_equal(img1, mask)

    img2 = sample_data.generate_sample_image(2)
    assert img2[0, 0] == 100 and img2[42, 42] == 100 and img2[1, 0] == 0

    img3 = sample_data.generate_sample_image(3)
    assert img3[100, 77] == 77

    img5 = sample_data.generate_sample_image(5)
    # first module row starts with the first PCG32 outputs mod 10
    want = np.array([v % 10 for v in _pcg32_scalar(8)], dtype=np.uint16)
    np.testing.assert_array_equal(img5[0, :8], want)
    # gaps stay zero
    assert img5[mask == 0].sum() == 0
    assert img5.max() == 9
