"""Host compaction from packed strong words (ops/compact_host).

The compact_backend="host" production split ends the device's job at the
fused kernel's [pc | w32] rows; these tests pin the bit-scan semantics
against an independent packer and assert end-to-end FrameResult parity
with the device-compaction path (reference architecture analogue: the
CPU pixel scan in connected_components.cc:24-31).
"""

import numpy as np
import pytest

from .test_spotfind_batch import _assert_frame_equal, _cfg
from .util import synthetic_rotation_stack


def _pack_pcw_independent(strong: np.ndarray, nwl: int) -> np.ndarray:
    """Reference packer (LSB-first within each 32-column word), sharing no
    code with ops/dispersion_pallas._pack_pcw or ops/compact_host."""
    h, w = strong.shape
    words = np.zeros((h, nwl), np.uint32)
    ys, xs = np.nonzero(strong)
    np.bitwise_or.at(
        words,
        (ys, xs // 32),
        (np.uint32(1) << (xs % 32).astype(np.uint32)),
    )
    pops = np.zeros((h, nwl), np.int64)
    for t in range(32):
        pops += (words >> np.uint32(t)) & 1
    pc = np.cumsum(pops, axis=1)
    return np.concatenate([pc, words.view(np.int32)], axis=1).astype(np.int32)


def test_wrapper_matches_truth_native_and_numpy():
    from ffs_tpu.ops.compact_host import _compact_pcw_numpy, compact_pcw_host
    from ffs_tpu.utils.native import lib

    rng = np.random.default_rng(11)
    h, w = 96, 300
    strong = rng.random((h, w)) < 0.01
    strong[0, 0] = strong[0, 31] = strong[0, 32] = True  # word boundaries
    strong[-1, w - 1] = True  # last column of a partial word
    image = rng.integers(0, 60000, size=(h, w)).astype(np.uint16)
    nwl = (w + 31) // 32
    pcw = _pack_pcw_independent(strong, nwl)

    ys, xs = np.nonzero(strong)  # raster order ground truth
    want_lin = (ys * w + xs).astype(np.int32)
    want_val = image[ys, xs].astype(np.int32)

    lin, val = compact_pcw_host(pcw, image, w)
    np.testing.assert_array_equal(lin, want_lin)
    np.testing.assert_array_equal(val, want_val)

    lin2, val2 = _compact_pcw_numpy(pcw, image, w, h, nwl)
    np.testing.assert_array_equal(lin2, want_lin)
    np.testing.assert_array_equal(val2, want_val)

    assert lib() is not None and hasattr(lib(), "ffs_compact_pcw"), (
        "native scan should build here; the NumPy fallback was exercised "
        "above regardless"
    )


@pytest.mark.parametrize(
    "dtype,big", [(np.uint16, 65535), (np.uint32, 2**31 - 1)]
)
def test_wrapper_dtype_widening(dtype, big):
    """Intensities widen to i32 for both pixel depths (the spotfinder32
    protocol's u32 frames included)."""
    from ffs_tpu.ops.compact_host import compact_pcw_host

    h, w = 16, 64
    strong = np.zeros((h, w), bool)
    strong[3, 5] = strong[10, 63] = True
    image = np.zeros((h, w), dtype)
    image[3, 5] = big
    image[10, 63] = 7
    pcw = _pack_pcw_independent(strong, (w + 31) // 32)
    lin, val = compact_pcw_host(pcw, image, w)
    np.testing.assert_array_equal(lin, [3 * w + 5, 10 * w + 63])
    np.testing.assert_array_equal(val, [big, 7])


def test_wrapper_non_native_dtypes_match_device_convention():
    """f32 / signed sub-32-bit frames must route around the native byte
    scan (which would bit-reinterpret/zero-extend them) and produce the
    device path's astype(int32) semantics."""
    from ffs_tpu.ops.compact_host import compact_pcw_host

    h, w = 8, 64
    strong = np.zeros((h, w), bool)
    strong[2, 10] = True
    pcw = _pack_pcw_independent(strong, (w + 31) // 32)
    for dtype, value, want in [
        (np.float32, 7.0, 7),
        (np.int16, -5, -5),
        (np.int32, -9, -9),
    ]:
        image = np.zeros((h, w), dtype)
        image[2, 10] = value
        lin, val = compact_pcw_host(pcw, image, w)
        np.testing.assert_array_equal(lin, [2 * w + 10])
        np.testing.assert_array_equal(val, [want])


def test_wrapper_accepts_leading_singleton_axis():
    from ffs_tpu.ops.compact_host import compact_pcw_host

    h, w = 8, 64
    strong = np.zeros((h, w), bool)
    strong[0, 1] = strong[5, 40] = True
    pcw = _pack_pcw_independent(strong, (w + 31) // 32)
    image = np.arange(h * w, dtype=np.uint16).reshape(1, h, w)
    lin, val = compact_pcw_host(pcw, image, w)
    np.testing.assert_array_equal(lin, [1, 5 * w + 40])
    np.testing.assert_array_equal(val, [1, 5 * w + 40])


def test_cli_env_default_validated(monkeypatch):
    """Invalid FFS_SPOTFIND_COMPACT falls back to 'device' with a warning
    (argparse does not validate choices against env-derived defaults)."""
    from ffs_tpu.pipeline.spotfinder import _build_parser

    monkeypatch.setenv("FFS_SPOTFIND_COMPACT", "true")
    args = _build_parser("test").parse_args(["--sample"])
    assert args.compact_backend == "device"
    monkeypatch.setenv("FFS_SPOTFIND_COMPACT", "host")
    args = _build_parser("test").parse_args(["--sample"])
    assert args.compact_backend == "host"


def test_processor_parity_host_vs_device_compaction():
    """compact_backend='host' FrameResults are identical to the device
    compaction path, frame by frame (counts, pixels, roots, centroids)."""
    from ffs_tpu.spotfind import SpotfindProcessor

    stack, mask = synthetic_rotation_stack()
    # an empty frame exercises the n=0 path
    stack = np.concatenate([stack, np.zeros_like(stack[:1])], axis=0)
    h, w = stack.shape[1:]
    tm = float(np.iinfo(np.uint16).max)
    proc_dev = SpotfindProcessor(w, h, mask, tm, _cfg("host"))
    proc_host = SpotfindProcessor(
        w, h, mask, tm, _cfg("host", compact_backend="host")
    )
    assert not proc_dev.host_compact and proc_host.host_compact
    for n in range(stack.shape[0]):
        want = proc_dev.process_frame(n, stack[n], want_com=True)
        got = proc_host.process_frame(n, stack[n], want_com=True)
        _assert_frame_equal(got, want)


def test_processor_parity_extended_algorithm():
    from ffs_tpu.spotfind import SpotfindProcessor

    stack, mask = synthetic_rotation_stack(nimg=2)
    h, w = stack.shape[1:]
    tm = float(np.iinfo(np.uint16).max)
    kw = dict(algorithm="dispersion_extended")
    proc_dev = SpotfindProcessor(w, h, mask, tm, _cfg("host", **kw))
    proc_host = SpotfindProcessor(
        w, h, mask, tm, _cfg("host", compact_backend="host", **kw)
    )
    for n in range(stack.shape[0]):
        want = proc_dev.process_frame(n, stack[n], want_com=True)
        got = proc_host.process_frame(n, stack[n], want_com=True)
        _assert_frame_equal(got, want)


def test_profiled_path_parity_and_stages():
    from ffs_tpu.spotfind import SpotfindProcessor

    stack, mask = synthetic_rotation_stack(nimg=1)
    h, w = stack.shape[1:]
    tm = float(np.iinfo(np.uint16).max)
    proc = SpotfindProcessor(
        w, h, mask, tm, _cfg("host", compact_backend="host")
    )
    want = proc.process_frame(0, stack[0], want_com=True)
    got, timings = proc.process_frame_profiled(0, stack[0], want_com=True)
    _assert_frame_equal(got, want)
    assert {"upload", "kernel", "compact", "post"} <= set(timings)


def test_capacity_overflow_raises():
    from ffs_tpu.spotfind import SpotfindConfig, SpotfindProcessor

    stack, mask = synthetic_rotation_stack(nimg=1)
    h, w = stack.shape[1:]
    image = stack[0].copy()
    image[:32, :32] = 60000  # >> 64 strong pixels
    cfg = SpotfindConfig(
        precision="f32",
        use_pallas=True,
        pallas_interpret=True,
        cc_backend="host",
        compact_backend="host",
        max_strong_pixels=64,
        min_spot_size=1,
    )
    proc = SpotfindProcessor(w, h, mask, float(np.iinfo(np.uint16).max), cfg)
    with pytest.raises(RuntimeError, match="exceed the configured capacity"):
        proc.process_frame(0, image)


def test_contradictory_config_rejected():
    from ffs_tpu.spotfind import SpotfindProcessor

    stack, mask = synthetic_rotation_stack(nimg=1)
    h, w = stack.shape[1:]
    with pytest.raises(ValueError, match="cannot feed"):
        SpotfindProcessor(
            w,
            h,
            mask,
            65535.0,
            _cfg("device", compact_backend="host"),
        )


def test_host_compaction_requires_packed_path():
    """Explicit compact_backend='host' without the Pallas packed kernel
    (e.g. f64 precision) is a contradiction, not a silent fallback to
    device compaction."""
    from ffs_tpu.spotfind import SpotfindConfig, SpotfindProcessor

    stack, mask = synthetic_rotation_stack(nimg=1)
    h, w = stack.shape[1:]
    cfg = SpotfindConfig(
        precision="f64", compact_backend="host", cc_backend="host"
    )
    with pytest.raises(ValueError, match="packed kernel path"):
        SpotfindProcessor(w, h, mask, 65535.0, cfg)
