"""Time the 3D merges at full-collection scale (VERDICT r4 item 5).

Builds a synthetic 3600-frame rotation collection's per-frame compact
pixel lists (Eiger-like: ~1-3k strong pixels/frame, several hundred
multi-frame spots alive at any z, plus singles) and times:

  * the batch merge (cc3d.merge_frames) — materialises all pixels;
  * the streaming merge (cc3d.StreamingMerger3D, stats-only production
    mode) — per-frame push, closed-spot pixels freed as it goes;

and reports the streaming high-water pixel retention.  The acquisition
budget for a 3600-frame collection at 500 Hz is 7.2 s; the streaming
merge must fit inside it (it runs concurrently with acquisition in the
service shape).  Bit-parity of the two merges is asserted first.

Usage: python tools/measure_cc3d_stream.py [N_FRAMES]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ffs_tpu.ops.cc2d_host import cc2d  # noqa: E402
from ffs_tpu.ops.cc3d import (  # noqa: E402
    FramePixels,
    StreamingMerger3D,
    merge_frames,
)

N_FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 3600
W, H = 4148, 4362


def build_collection(rng, n_frames):
    """~250 live multi-frame spots at any z (2x2 px, 6-30 frame spans) +
    ~800 per-frame singles: ≈ 1800 strong px/frame, reference-like."""
    n_live = 250
    spans = []
    # seed initial live spots, replenish as they expire
    frames = []
    t_spot = 0
    for z in range(n_frames):
        while len(spans) < n_live:
            spans.append(
                (
                    z,
                    z + int(rng.integers(6, 30)),
                    int(rng.integers(2, W - 4)),
                    int(rng.integers(2, H - 4)),
                )
            )
            t_spot += 1
        pts = {}
        for z0, z1, x, y in spans:
            if z0 <= z < z1:
                for dx in range(2):
                    for dy in range(2):
                        pts[(y + dy) * W + (x + dx)] = True
        spans = [s for s in spans if s[1] > z + 1]
        singles = rng.integers(0, W * H, size=800)
        for s in singles:
            pts[int(s)] = True
        lin = np.asarray(sorted(pts), np.int64)
        inten = (lin % 91 + 1 + z % 7).astype(np.int64)
        t = cc2d(lin, inten, W)
        frames.append(
            FramePixels(linear_index=lin, intensity=inten, root=t.root_lin)
        )
    return frames


def main():
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    frames = build_collection(rng, N_FRAMES)
    n_px = sum(len(f.linear_index) for f in frames)
    print(
        f"built {N_FRAMES} frames, {n_px} strong px total "
        f"({time.perf_counter() - t0:.1f}s host prep)"
    )

    t0 = time.perf_counter()
    batch = merge_frames(frames, width=W)
    t_batch = time.perf_counter() - t0
    print(f"batch merge: {t_batch:.2f}s, {len(batch)} spots")

    m = StreamingMerger3D(W)
    high_water = 0
    t0 = time.perf_counter()
    for f in frames:
        m.push_frame(f)
        high_water = max(high_water, m.retained_pixels)
    got = m.finalize()
    t_stream = time.perf_counter() - t0
    print(
        f"streaming merge: {t_stream:.2f}s, {len(got)} spots, "
        f"high-water open pixels {high_water} "
        f"({100.0 * high_water / n_px:.2f}% of collection)"
    )

    for field in (
        "n_pixels", "sum_intensity", "com_x", "com_y", "com_z",
        "x_min", "x_max", "y_min", "y_max", "z_min", "z_max",
        "peak_x", "peak_y", "peak_z", "peak_intensity",
    ):
        np.testing.assert_array_equal(
            getattr(got, field), getattr(batch, field), err_msg=field
        )
    print("bit-parity: OK")
    budget = 7.2 * (N_FRAMES / 3600.0)
    print(
        f"acquisition budget {budget:.1f}s -> streaming merge "
        f"{'FITS' if t_stream <= budget else 'EXCEEDS'} "
        f"({t_stream:.2f}s)"
    )


if __name__ == "__main__":
    main()
