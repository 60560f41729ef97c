"""Generate the bench hardware-anchor golden (tests/data/bench_anchor_golden.npz).

Independent f64 host oracle for the two deterministic sample frames the
bench validates on real hardware: the boxed-f64 dispersion oracle
(ops/reference.py — the rebuild's equivalent of the reference's
StandaloneSpotfinder used by `--validate`, spotfinder.cc:1011-1053)
produces the strong-pixel list, and the host union-find CC
(ops/cc2d_host.cc2d) produces every per-spot column.  bench.py compares
the REAL-CHIP pixel list and spot table bit-for-bit against this file —
the guard the documented v5e silent-MXU-bit-drop precedent demands
(counts alone passed while specific products were dropped).

Deterministic: re-running this tool reproduces the file byte-for-byte
(sample data is PCG32-seeded).  Runtime ~2-4 min on one CPU (full-frame
f64 window sums).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ffs_tpu.io import sample_data  # noqa: E402
from ffs_tpu.ops import reference  # noqa: E402
from ffs_tpu.ops.cc2d_host import cc2d  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "data", "bench_anchor_golden.npz",
)


def main() -> None:
    mask = sample_data.generate_mask()
    out: dict[str, np.ndarray] = {}
    for tag, idx in (("img2", 2), ("img5", 5)):
        img = sample_data.generate_sample_image(idx)
        strong = reference.dispersion(img, mask, 65535.0)
        ys, xs = np.nonzero(strong)
        inten = img[ys, xs].astype(np.int64)
        w = img.shape[1]
        table = cc2d((ys.astype(np.int64) * w + xs), inten, w)
        out[f"{tag}_y"] = ys.astype(np.int32)
        out[f"{tag}_x"] = xs.astype(np.int32)
        out[f"{tag}_intensity"] = inten.astype(np.int32)
        for col in (
            "n_pixels", "sum_intensity", "com_x", "com_y",
            "x_min", "x_max", "y_min", "y_max",
            "peak_x", "peak_y", "peak_intensity",
        ):
            out[f"{tag}_{col}"] = np.asarray(getattr(table, col))
        print(
            f"{tag}: {len(ys)} strong px, {table.n_spots} spots",
            flush=True,
        )
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")


if __name__ == "__main__":
    main()
