"""Host-side cost of the compact_backend="host" bit scan (pure CPU).

Times ops/compact_host.compact_pcw_host (native csrc scan + NumPy
fallback) on Eiger-16M-scale packed rows at realistic strong-pixel
densities, plus the downstream host union-find, to back the claim that
the host split's CPU work is sub-millisecond per frame — the d2h of the
packed words (~2-4 MB/frame; ~0.2 ms at PCIe rates, ~60 ms over the dev
tunnel) is the only real cost of the split.

Run anywhere (no TPU): python tools/measure_compact_host.py
"""

import time

import numpy as np

from ffs_tpu.ops.cc2d_host import cc2d
from ffs_tpu.ops.compact_host import _compact_pcw_numpy, compact_pcw_host

H, W = 4362, 4148  # Eiger 16M
NWL = (W + 31) // 32


def make_pcw(n_strong: int, seed: int):
    rng = np.random.default_rng(seed)
    lin = np.sort(
        rng.choice(H * W, size=n_strong, replace=False).astype(np.int64)
    )
    ys, xs = lin // W, lin % W
    words = np.zeros((H, NWL), np.uint32)
    np.bitwise_or.at(
        words, (ys, xs // 32), (np.uint32(1) << (xs % 32).astype(np.uint32))
    )
    pops = np.zeros((H, NWL), np.int64)
    for t in range(32):
        pops += (words >> np.uint32(t)) & 1
    pc = np.cumsum(pops, axis=1).astype(np.int32)
    pcw = np.concatenate([pc, words.view(np.int32)], axis=1)
    return pcw, lin.astype(np.int32)


def timeit(fn, reps=20):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    return (time.perf_counter() - t0) / reps * 1e3, out


def main():
    image = np.random.default_rng(0).integers(
        0, 1000, size=(H, W)
    ).astype(np.uint16)
    for n_strong in (3_000, 9_506, 65_536):
        pcw, want_lin = make_pcw(n_strong, seed=n_strong)
        ms_native, (lin, inten) = timeit(
            lambda: compact_pcw_host(pcw, image, W)
        )
        assert np.array_equal(lin, want_lin)
        ms_numpy, _ = timeit(
            lambda: _compact_pcw_numpy(pcw, image, W, H, NWL), reps=5
        )
        ms_cc, table = timeit(lambda: cc2d(lin, inten, W))
        print(
            f"K={n_strong:6d}: native scan {ms_native:7.3f} ms  "
            f"numpy fallback {ms_numpy:7.3f} ms  host CC {ms_cc:7.3f} ms  "
            f"({table.n_spots} spots)"
        )


if __name__ == "__main__":
    main()
