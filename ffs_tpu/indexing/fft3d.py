"""3D FFT of reciprocal-lattice points for basis-vector discovery.

Equivalent of the reference fft3d (reference: baseline/indexer/fft3d.cc:
37-182): rlps are binned onto an n^3 grid with B-factor weights
exp(-b_iso |v|^2 / 4), transformed c2c, and the squared real part returned.
The transform runs on device via jnp.fft.fftn (XLA's native TPU FFT — the
reference's pocketfft multithreading maps to this, SURVEY.md P7); grid
binning stays in NumPy (it is a tiny sparse scatter over ~10^4 points).
"""

from __future__ import annotations

import numpy as np


def b_iso_from_d_min(d_min: float) -> float:
    """b_iso = -4 d_min^2 ln(0.05) (reference: baseline/indexer/indexer.cc:205)."""
    return -4.0 * d_min * d_min * np.log(0.05)


def map_centroids_to_grid(
    rlp: np.ndarray,
    d_min: float,
    b_iso: float = 0.0,
    n_points: int = 256,
) -> tuple[np.ndarray, np.ndarray]:
    """Bin rlps to the FFT grid (reference: fft3d.cc:37-91).

    Returns (grid real f64 (n, n, n) with index order [vx, vy, vz],
    used_in_indexing bool (N,)).
    """
    rlp = np.asarray(rlp, dtype=np.float64)
    rlgrid = 2.0 / (d_min * n_points)
    half = n_points // 2
    v_len = np.linalg.norm(rlp, axis=1)
    d_spacing = np.divide(1.0, v_len, out=np.full(len(rlp), np.inf), where=v_len > 0)
    sel = d_spacing >= d_min

    coords = np.round(rlp / rlgrid).astype(np.int64) + half
    in_grid = (coords >= 0).all(axis=1) & (coords < n_points).all(axis=1)
    sel &= in_grid

    weights = np.exp(-b_iso * v_len**2 / 4.0) if b_iso != 0 else np.ones(len(rlp))
    grid = np.zeros((n_points, n_points, n_points), dtype=np.float64)
    c = coords[sel]
    # last write wins in the reference's loop; identical here since the
    # value only depends on |v| ~ the same grid point
    grid[c[:, 0], c[:, 1], c[:, 2]] = weights[sel]
    return grid, sel


_fft_jit = None


def _device_fft():
    """Module-cached jitted FFT: a fresh jit(lambda) per call would
    recompile the 16M-point c2c transform on every indexing job."""
    global _fft_jit
    if _fft_jit is None:
        import jax
        import jax.numpy as jnp

        _fft_jit = jax.jit(lambda g: jnp.square(jnp.real(jnp.fft.fftn(g))))
    return _fft_jit


def fft3d(
    rlp: np.ndarray,
    d_min: float,
    b_iso: float = 0.0,
    n_points: int = 256,
    use_device: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """Grid + FFT -> (Re(FFT)^2 grid (n,n,n), used_in_indexing).

    Grid index order matches the reference's flattened layout
    (index = vz + n*vy + n^2*vx, fft3d.cc:84-86): axis 0 = vx.
    """
    grid, used = map_centroids_to_grid(rlp, d_min, b_iso, n_points)
    # The device path requires x64: a complex64 FFT of a 256^3 grid
    # accumulates ~1e-3 relative error, flipping grid points across the
    # flood_fill binarisation threshold vs the reference's double pocketfft.
    # Without x64 the host FFT below IS the double-precision parity path.
    if use_device:
        try:
            import jax

            if jax.config.jax_enable_x64:
                out = np.asarray(
                    _device_fft()(grid.astype(np.complex128))
                ).astype(np.float64)
                return out, used
        except Exception:
            pass
    out = np.square(np.real(np.fft.fftn(grid)))
    return out, used
