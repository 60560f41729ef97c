"""Batched collection mode: SpotfindProcessor.dispatch_batch/collect_batch
and the spotfinder CLI ``--batch`` flag.

The batched path is the exact configuration bench.py's throughput metrics
measure (packed kernel -> segmented per-frame compaction -> batch CC ->
multi-frame spot table), exposed as a production path; these tests pin its
contract: per-frame results identical to the per-frame path (reference
parity surface: spotfinder/spotfinder.cc:751-1008 per-image results are
independent of batching), transparent per-frame fallback on capacity
overflow, and the CLI wiring.
"""

import os
import re
import subprocess
import sys

import numpy as np
import pytest

from .util import synthetic_rotation_stack, write_nexus

PIXELS_RE = r"image\s+(\d+).*?(\d+)\s+strong pixels"


def _cfg(cc_backend, **kw):
    from ffs_tpu.spotfind import SpotfindConfig

    return SpotfindConfig(
        precision="f32",
        use_pallas=True,
        pallas_interpret=True,
        cc_backend=cc_backend,
        max_strong_pixels=4096,
        max_spots=2048,
        min_spot_size=1,
        **kw,
    )


def _assert_frame_equal(got, want):
    assert got.image_number == want.image_number
    assert got.n_strong_pixels == want.n_strong_pixels
    assert got.n_spots == want.n_spots
    assert got.n_spots_prefilter == want.n_spots_prefilter
    assert got.n_strong_pixels_filtered == want.n_strong_pixels_filtered
    np.testing.assert_array_equal(
        got.pixels.linear_index, want.pixels.linear_index
    )
    np.testing.assert_array_equal(got.pixels.intensity, want.pixels.intensity)
    np.testing.assert_array_equal(got.pixels.root, want.pixels.root)
    # spot-table row order may differ between the single-frame and batch
    # tables; compare the centroid sets
    assert got.centers_of_mass.shape == want.centers_of_mass.shape
    order_g = np.lexsort(got.centers_of_mass.T)
    order_w = np.lexsort(want.centers_of_mass.T)
    np.testing.assert_allclose(
        got.centers_of_mass[order_g],
        want.centers_of_mass[order_w],
        rtol=0,
        atol=1e-5,
    )


@pytest.mark.parametrize("cc_backend", ["host", "device"])
def test_collect_batch_matches_per_frame(cc_backend):
    """Batched results must match the per-frame path frame by frame
    (counts exactly, pixel/root arrays bit-for-bit)."""
    from ffs_tpu.spotfind import SpotfindProcessor

    stack, mask = synthetic_rotation_stack()
    h, w = stack.shape[1:]
    tm = float(np.iinfo(np.uint16).max)
    proc = SpotfindProcessor(w, h, mask, tm, _cfg(cc_backend))
    assert proc.batch_supported()

    nums = list(range(stack.shape[0]))
    want = [proc.process_frame(n, stack[n], want_com=True) for n in nums]
    got = proc.collect_batch(
        nums, proc.dispatch_batch(stack), images=stack, want_com=True
    )
    assert len(got) == len(want)
    for g, p in zip(got, want):
        _assert_frame_equal(g, p)
    assert sum(g.n_strong_pixels for g in got) > 0
    assert any(len(g.centers_of_mass) for g in got)


def test_collect_batch_partial_tail_zero_padding():
    """A zero-padded tail batch (the CLI's partial-flush shape) must
    return results for the real frames only, unaffected by pad frames."""
    from ffs_tpu.spotfind import SpotfindProcessor

    stack, mask = synthetic_rotation_stack()
    h, w = stack.shape[1:]
    tm = float(np.iinfo(np.uint16).max)
    proc = SpotfindProcessor(w, h, mask, tm, _cfg("device"))

    padded = np.concatenate([stack[:2], np.zeros_like(stack[:2])])
    got = proc.collect_batch(
        [0, 1], proc.dispatch_batch(padded), images=stack[:2], want_com=True
    )
    want = [proc.process_frame(n, stack[n], want_com=True) for n in (0, 1)]
    assert len(got) == 2
    for g, p in zip(got, want):
        _assert_frame_equal(g, p)


@pytest.mark.parametrize("cc_backend", ["host", "device"])
def test_collect_batch_overflow_falls_back(cc_backend):
    """A frame past the batched per-frame capacity must transparently take
    the per-frame tiered path (same result), and raise without host
    frames to fall back on."""
    from ffs_tpu.spotfind import SpotfindProcessor

    stack, mask = synthetic_rotation_stack()
    h, w = stack.shape[1:]
    tm = float(np.iinfo(np.uint16).max)
    proc = SpotfindProcessor(
        w, h, mask, tm, _cfg(cc_backend, batch_max_px_per_frame=16)
    )
    want = [
        proc.process_frame(n, stack[n], want_com=True)
        for n in range(len(stack))
    ]
    overflowing = [n for n, r in enumerate(want) if r.n_strong_pixels > 16]
    assert overflowing, "fixture must overflow the tiny batch capacity"

    dev = proc.dispatch_batch(stack)
    got = proc.collect_batch(
        range(len(stack)), dev, images=stack, want_com=True
    )
    for g, p in zip(got, want):
        _assert_frame_equal(g, p)

    with pytest.raises(RuntimeError, match="exceed the batched"):
        proc.collect_batch(range(len(stack)), proc.dispatch_batch(stack))


def test_collect_batch_uint32_matches_per_frame():
    """32-bit data (the spotfinder32 protocol) takes the two-op peak path
    (peak_key_slots needs intensities < 2^16); results must still match
    the per-frame path, including intensities beyond the u16 range."""
    from ffs_tpu.spotfind import SpotfindConfig, SpotfindProcessor

    stack, mask = synthetic_rotation_stack()
    stack32 = stack.astype(np.uint32)
    stack32[2, 50:53, 10:13] = 70000  # beyond u16
    h, w = stack.shape[1:]
    cfg = SpotfindConfig(
        precision="f32",
        use_pallas=True,
        pallas_interpret=True,
        cc_backend="device",
        max_strong_pixels=4096,
        max_spots=2048,
        min_spot_size=1,
    )
    proc = SpotfindProcessor(w, h, mask, float(2**31 - 1), cfg)
    nums = list(range(len(stack32)))
    want = [proc.process_frame(n, stack32[n], want_com=True) for n in nums]
    got = proc.collect_batch(
        nums, proc.dispatch_batch(stack32), images=stack32, want_com=True
    )
    assert any(
        (np.asarray(r.pixels.intensity) > 65535).any() for r in want
    ), "fixture must exercise intensities beyond u16"
    for g, p in zip(got, want):
        _assert_frame_equal(g, p)


def test_batch_unsupported_without_pallas():
    """The dense jnp path has no segmented compaction: batch_supported()
    is False and dispatch_batch raises."""
    from ffs_tpu.spotfind import SpotfindConfig, SpotfindProcessor

    stack, mask = synthetic_rotation_stack()
    h, w = stack.shape[1:]
    proc = SpotfindProcessor(
        w, h, mask, 65535.0, SpotfindConfig(precision="f64")
    )
    assert not proc.batch_supported()
    with pytest.raises(ValueError, match="Pallas packed path"):
        proc.dispatch_batch(stack)


# ---------------------------------------------------------------------------
# CLI --batch
# ---------------------------------------------------------------------------


def _run_cli(args, cwd, env_extra=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.update(env_extra or {})
    cmd = [sys.executable, "-m", "ffs_tpu.pipeline.spotfinder", *args]
    return subprocess.run(cmd, capture_output=True, cwd=cwd, env=env)


@pytest.fixture(scope="module")
def rotation_nexus(tmp_path_factory):
    d = tmp_path_factory.mktemp("nxs_batch")
    stack, mask = synthetic_rotation_stack()
    path = d / "rot.nxs"
    write_nexus(path, stack, oscillation=(0.0, 0.1), mask=mask)
    return path, stack, mask


def _per_image_counts(log):
    return {
        int(m.group(1)): int(m.group(2)) for m in re.finditer(PIXELS_RE, log)
    }


def test_cli_batch_mode(rotation_nexus, tmp_path):
    """--batch 4 over 6 frames (one full + one zero-padded tail batch) on
    the interpret-mode packed path must reproduce the per-frame run's
    per-image strong-pixel counts and the 3D spot epilogue."""
    path, stack, mask = rotation_nexus
    env = {"FFS_PALLAS_INTERPRET": "1"}
    base = _run_cli(
        [str(path), "--precision", "f32", "--validate"], tmp_path, env
    )
    assert base.returncode == 0, base.stdout.decode() + base.stderr.decode()
    batched = _run_cli(
        [str(path), "--precision", "f32", "--validate", "--batch", "4"],
        tmp_path,
        env,
    )
    assert batched.returncode == 0, (
        batched.stdout.decode() + batched.stderr.decode()
    )
    blog = batched.stdout.decode()
    assert "falling back to per-frame" not in blog
    # per-pixel mask validation lines identical between the runs (the
    # strongest CLI-level batch == per-frame check: same full masks)
    val_re = r"Image\s+\d+: Compared:.*"
    base_val = sorted(re.findall(val_re, base.stdout.decode()))
    batch_val = sorted(re.findall(val_re, blog))
    assert batch_val == base_val and len(batch_val) == stack.shape[0]
    # identical rotation epilogue (3D merge runs on the same FramePixels)
    spots_re = r"Calculated\s+(\d+)\s+spots"
    assert re.search(spots_re, blog).group(1) == re.search(
        spots_re, base.stdout.decode()
    ).group(1)


def test_cli_batch_fallback_notice(rotation_nexus, tmp_path):
    """Without the Pallas packed path, --batch prints the fallback notice
    and still produces correct per-frame results."""
    path, stack, mask = rotation_nexus
    proc = _run_cli([str(path), "--batch", "4"], tmp_path)
    assert proc.returncode == 0, proc.stdout.decode() + proc.stderr.decode()
    log = proc.stdout.decode()
    assert "Batched mode unavailable" in log
    assert len(_per_image_counts(log)) == stack.shape[0]
