"""Utility parity tests: mt19937 vs libstdc++, writeout, module views."""

import numpy as np

from ffs_tpu.utils.mt19937 import MT19937Cpp, random_selection


def test_mt19937_matches_stdcpp():
    # ground truth from std::mt19937(43) compiled with g++
    want = [
        494155588, 2134003008, 2615920895, 442015537, 572909845,
        638974010, 1033324560, 739303731, 1405051537, 3483374779,
    ]
    mt = MT19937Cpp(43)
    got = [mt() for _ in range(10)]
    assert got == want


def test_random_selection_deterministic():
    a = random_selection(100, 10, seed=43)
    b = random_selection(100, 10, seed=43)
    np.testing.assert_array_equal(a, b)
    assert len(np.unique(a)) == 10
    assert (np.diff(a) > 0).all()  # sorted
    assert a.min() >= 0 and a.max() < 100


def test_writeout_pngs(tmp_path):
    from ffs_tpu.utils.writeout import write_image_png, write_mask_png

    rng = np.random.default_rng(0)
    image = rng.poisson(3, (64, 96)).astype(np.uint16)
    strong = np.zeros((64, 96), bool)
    strong[30, 40] = True
    mask = np.ones((64, 96), np.uint8)
    mask[10:12] = 0
    assert write_mask_png(str(tmp_path / "mask.png"), mask)
    assert write_image_png(
        str(tmp_path / "img.png"),
        image,
        strong,
        boxes=np.array([[38, 42, 28, 32]]),
    )
    from PIL import Image

    im = np.asarray(Image.open(tmp_path / "img.png"))
    assert tuple(im[30, 40]) == (255, 0, 0)  # strong pixel red
    m = np.asarray(Image.open(tmp_path / "mask.png"))
    assert tuple(m[10, 0]) == (255, 0, 0) and tuple(m[0, 0]) == (255, 255, 255)


def test_image_modules_view():
    from ffs_tpu.io.sample_data import generate_sample_image
    from ffs_tpu.io.modules import image_modules

    img = generate_sample_image(3)  # I = x
    mods = image_modules(img, "16M")
    assert mods.shape == (8, 4, 512, 1028)
    # module (0, 1) starts at fast offset 1040
    assert mods[0, 1, 0, 0] == 1040
    assert mods[3, 0, 100, 77] == 77
