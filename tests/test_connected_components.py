"""Device 2D CC + host 3D merge vs scipy.ndimage reference labelling."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy import ndimage

from ffs_tpu.ops import cc3d
from ffs_tpu.ops import connected_components as cc

S4 = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])  # 4-connectivity
S6 = np.zeros((3, 3, 3), int)  # 6-connectivity
S6[1] = S4
S6[0, 1, 1] = S6[2, 1, 1] = 1


def _partition(labels, mask):
    """Canonical partition: map each component to its sorted pixel tuple."""
    out = {}
    for lab in np.unique(labels[mask]):
        out.setdefault(lab, [])
    ys, xs = np.nonzero(mask)
    for y, x in zip(ys, xs):
        out[labels[y, x]].append((y, x))
    return sorted(tuple(sorted(v)) for v in out.values())


def _sparse_label_image(strong, image):
    """Root-linear-index label image from the sparse device path."""
    pixels, root_slot = _label(strong, image)
    root_lin = np.asarray(pixels.linear_index[root_slot])
    lin = np.asarray(pixels.linear_index)
    n = int(pixels.count)
    out = np.full(strong.shape, -1, dtype=np.int64)
    out.reshape(-1)[lin[:n]] = root_lin[:n]
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_label_sparse_matches_scipy(seed):
    rng = np.random.default_rng(seed)
    strong = rng.random((64, 96)) < 0.2
    image = rng.integers(1, 100, size=strong.shape).astype(np.uint16)
    got = _sparse_label_image(strong, image)
    want, _ = ndimage.label(strong, structure=S4)
    assert _partition(got, strong) == _partition(want, strong)


def test_label_dense_matches_scipy():
    rng = np.random.default_rng(0)
    strong = rng.random((64, 96)) < 0.2
    got = np.asarray(cc.label_components_2d(jnp.asarray(strong)))
    want, _ = ndimage.label(strong, structure=S4)
    assert _partition(got, strong) == _partition(want, strong)


def test_label_2d_spiral():
    # a long snaking component stresses the propagation convergence
    strong = np.zeros((32, 32), bool)
    strong[0, :] = True
    strong[:, -1] = True
    strong[-1, :] = True
    strong[2:-1, 0] = True  # broken at (1, 0): still one component? no - two
    image = np.ones((32, 32), np.uint16)
    got = _sparse_label_image(strong, image)
    want, _ = ndimage.label(strong, structure=S4)
    assert _partition(got, strong) == _partition(want, strong)


def _label(strong, image, max_pixels=4096):
    pixels = cc.compact_strong_pixels(
        jnp.asarray(strong), jnp.asarray(image), max_pixels=max_pixels
    )
    root_slot = cc.label_compact_pixels(pixels, width=strong.shape[1])
    return pixels, root_slot


def _frame_pixels(strong, image):
    pixels, root_slot = _label(strong, image)
    root_lin = pixels.linear_index[root_slot]
    n = int(pixels.count)
    return cc3d.FramePixels(
        linear_index=np.asarray(pixels.linear_index[:n]),
        intensity=np.asarray(pixels.intensity[:n]),
        root=np.asarray(root_lin[:n]),
    )


def test_spot_table_2d(rng):
    strong = rng.random((48, 80)) < 0.15
    image = rng.integers(1, 1000, size=(48, 80)).astype(np.uint16)
    pixels, root_slot = _label(strong, image)
    table = cc.spot_table_from_pixels(pixels, root_slot, width=80, max_spots=1024)

    want, n_want = ndimage.label(strong, structure=S4)
    assert int(table.n_spots) == n_want

    # stats vs direct computation per component, matched by bounding box
    got = {}
    for i in range(n_want):
        ys, xs = np.nonzero(want == i + 1)
        inten = image[ys, xs].astype(np.float64)
        key = (ys.min(), xs.min(), ys.max(), xs.max())
        got[key] = (
            len(ys),
            inten.sum(),
            (inten * (xs + 0.5)).sum() / inten.sum(),
            (inten * (ys + 0.5)).sum() / inten.sum(),
        )
    for s in range(n_want):
        key = (
            int(table.y_min[s]),
            int(table.x_min[s]),
            int(table.y_max[s]),
            int(table.x_max[s]),
        )
        n_px, sum_i, comx, comy = got[key]
        assert int(table.n_pixels[s]) == n_px
        assert float(table.sum_intensity[s]) == pytest.approx(sum_i)
        assert float(table.com_x[s]) == pytest.approx(comx)
        assert float(table.com_y[s]) == pytest.approx(comy)


def test_peak_tie_break():
    # two pixels with equal max intensity: pick smallest (z, y, x)
    strong = np.zeros((8, 8), bool)
    strong[2, 2:5] = True
    image = np.zeros((8, 8), np.uint16)
    image[2, 2:5] = [7, 9, 9]
    pixels, root_slot = _label(strong, image, max_pixels=64)
    table = cc.spot_table_from_pixels(pixels, root_slot, width=8, max_spots=16)
    assert int(table.n_spots) == 1
    assert (int(table.peak_x[0]), int(table.peak_y[0])) == (3, 2)


@pytest.mark.parametrize("seed", [0, 3])
def test_3d_merge_matches_scipy(seed):
    rng = np.random.default_rng(seed)
    nz, h, w = 6, 40, 56
    stack = rng.random((nz, h, w)) < 0.12
    image = rng.integers(1, 500, size=(nz, h, w)).astype(np.uint16)

    frames = [_frame_pixels(stack[z], image[z]) for z in range(nz)]
    spots = cc3d.merge_frames(frames, width=w)

    want, n_want = ndimage.label(stack, structure=S6)
    assert len(spots) == n_want

    # match components by their full pixel sets
    want_parts = {}
    for lab in range(1, n_want + 1):
        zs, ys, xs = np.nonzero(want == lab)
        want_parts[tuple(sorted(zip(zs, ys, xs)))] = lab
    for s in range(len(spots)):
        sel = spots.pixel_spot == s
        part = tuple(
            sorted(
                zip(spots.pixel_z[sel], spots.pixel_y[sel], spots.pixel_x[sel])
            )
        )
        assert part in want_parts

    # COM spot check against direct per-component computation
    for s in [0, len(spots) - 1]:
        sel = spots.pixel_spot == s
        inten = spots.pixel_intensity[sel]
        assert spots.com_z[s] == pytest.approx(
            (inten * (spots.pixel_z[sel] + 0.5)).sum() / inten.sum()
        )


def test_filters():
    strong = np.zeros((16, 16), bool)
    strong[2, 2] = True  # size-1 spot
    strong[8:11, 8:11] = True  # 9-pixel spot
    image = np.ones((16, 16), np.uint16)
    image[8, 8] = 100  # peak far from COM? COM pulled toward (8,8)
    frames = [_frame_pixels(strong, image)]
    spots = cc3d.merge_frames(frames, width=16)
    keep, n_size, n_sep = cc3d.filter_spots(spots, 3, 2.0)
    assert n_size == 1 and keep.sum() == 1

    # device-side filters agree
    pixels, root_slot = _label(strong, image, max_pixels=256)
    table = cc.spot_table_from_pixels(pixels, root_slot, width=16, max_spots=64)
    keep_d, n_size_d, n_sep_d = cc.filter_spots(table, 3, 2.0)
    assert int(n_size_d) == 1
    assert int(keep_d.sum()) == 1
