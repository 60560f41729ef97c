"""Serial-crystallography (stills) indexing with a known unit cell.

TPU-native replacement for the external PSI ffbidx CUDA indexer the
reference wraps (reference: src/ffs/ssx_index.py:40-159, fetched at build
time per CMakeLists.txt:91-96), plus a port of the reference's own
`ffs.index.index_from_ssx_cells` candidate-selection/prediction/rmsd logic
(reference: baseline/indexer/index_module.cpp:49-201).

The vector search: for each known cell-vector length, score every direction
on a Fibonacci half-sphere by the lattice fitness

    score(v) = sum_spots cos(2 pi rlp . v)

which is one (directions x spots) matmul + elementwise cos — MXU-shaped
work, replacing ffbidx's CUDA half-sphere sampler.  Top-scoring directions
are locally refined and assembled into candidate cells consistent with the
target cell's angles.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..models.crystal import Crystal
from ..prediction.stills import predict_stills
from .assign import assign_indices_global


def fibonacci_half_sphere(n: int) -> np.ndarray:
    """n approximately uniform directions with z >= 0."""
    i = np.arange(n, dtype=np.float64)
    golden = (1 + np.sqrt(5)) / 2
    z = i / n  # upper half only
    r = np.sqrt(1 - z * z)
    theta = 2 * np.pi * i / golden
    return np.stack([r * np.cos(theta), r * np.sin(theta), z], axis=1)


_score_jit = None


def _get_score_jit():
    """Module-cached jitted scorer: a fresh @jax.jit closure per call would
    defeat jit's function-identity cache and recompile the (32768, N)
    matmul on every image of the SSX service loop."""
    global _score_jit
    if _score_jit is None:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def f(rlp, vecs):
            proj = rlp @ vecs.T
            return jnp.sum(jnp.cos(2 * jnp.pi * proj), axis=0)

        _score_jit = f
    return _score_jit


def _score_directions(rlp: np.ndarray, vectors: np.ndarray, use_device: bool) -> np.ndarray:
    """score[j] = sum_i cos(2 pi rlp_i . v_j) for candidate vectors v."""
    if use_device:
        try:
            import jax.numpy as jnp

            f = _get_score_jit()
            return np.asarray(f(jnp.asarray(rlp), jnp.asarray(vectors)))
        except Exception:
            pass
    proj = rlp @ vectors.T
    return np.cos(2 * np.pi * proj).sum(axis=0)


def _refine_vector(rlp: np.ndarray, v: np.ndarray, steps: int = 40) -> np.ndarray:
    """Gradient ascent on score(v) (smooth), small steps."""
    v = v.copy()
    for _ in range(steps):
        proj = rlp @ v
        g = -2 * np.pi * (np.sin(2 * np.pi * proj)[:, None] * rlp).sum(axis=0)
        h = (2 * np.pi) ** 2 * len(rlp)  # crude curvature bound
        v = v + g / h
    return v


def find_candidate_cells(
    rlp: np.ndarray,
    cell: tuple[float, float, float, float, float, float],
    *,
    num_halfsphere_points: int = 32768,
    num_candidate_vectors: int = 32,
    max_output_cells: int = 32,
    angle_tolerance: float = 3.0,
    length_tolerance: float = 0.05,
    use_device: bool = True,
) -> list[np.ndarray]:
    """Candidate real-space cells (each a (3, 3) row matrix [a; b; c])."""
    a, b, c, alpha, beta, gamma = cell
    dirs = fibonacci_half_sphere(num_halfsphere_points)

    # score each unique length once (equal lengths share a search: for a
    # cubic/tetragonal target the 32768-direction scoring + refinement
    # would otherwise repeat identically per axis, per image)
    lengths = [a, b, c]
    cand: list[list[np.ndarray]] = [[], [], []]
    searched: dict[float, list[np.ndarray]] = {}
    for li, length in enumerate(lengths):
        key = round(float(length), 9)
        if key in searched:
            cand[li] = searched[key]
            continue
        scores = _score_directions(rlp, dirs * length, use_device)
        order = np.argsort(scores)[::-1]
        picked: list[np.ndarray] = []
        for j in order:
            d = dirs[j]
            if any(abs(d @ p / np.linalg.norm(p) * length) > 0.95 * length for p in picked):
                continue
            v = _refine_vector(rlp, d * length)
            if abs(np.linalg.norm(v) - length) / length > length_tolerance:
                v = v / np.linalg.norm(v) * length
            picked.append(v)
            if len(picked) >= num_candidate_vectors:
                break
        searched[key] = picked
        cand[li] = picked

    def angle(u, v):
        cosv = u @ v / (np.linalg.norm(u) * np.linalg.norm(v))
        return np.degrees(np.arccos(np.clip(cosv, -1, 1)))

    cells: list[np.ndarray] = []
    for va in cand[0]:
        for vb in cand[1]:
            if abs(angle(va, vb) - gamma) > angle_tolerance and abs(
                180 - angle(va, vb) - gamma
            ) > angle_tolerance:
                continue
            vb_s = vb if abs(angle(va, vb) - gamma) <= angle_tolerance else -vb
            for vc in cand[2]:
                for vc_s in (vc, -vc):
                    if abs(angle(va, vc_s) - beta) > angle_tolerance:
                        continue
                    if abs(angle(vb_s, vc_s) - alpha) > angle_tolerance:
                        continue
                    m = np.stack([va, vb_s, vc_s])
                    if np.linalg.det(m) < 0:
                        # negating the WHOLE triple preserves every mutual
                        # angle and flips handedness; negating one vector
                        # would turn the just-checked alpha/beta into
                        # their supplements (and -vc is enumerated by the
                        # loop anyway)
                        m = -m
                    cells.append(m)
                    if len(cells) >= max_output_cells:
                        return cells
    return cells


@dataclass
class SSXIndexingResult:
    cell_parameters: list
    a_matrix: np.ndarray
    miller_indices: np.ndarray
    xyzobs_px: np.ndarray
    xyzcal_px: np.ndarray
    s1: np.ndarray
    delpsi: np.ndarray
    rmsds: list = field(default_factory=list)


def index_from_ssx_cells(
    cells: list[np.ndarray],
    rlp: np.ndarray,
    xyzobs_px: np.ndarray,
    s0: np.ndarray,
    panel,
) -> SSXIndexingResult | None:
    """Pick the max-indexed candidate cell, predict stills positions,
    filter >2 px outliers, compute rmsds
    (reference: index_module.cpp:49-201)."""
    if not cells:
        return None
    best = None
    for m in cells:
        crystal = Crystal(m[0], m[1], m[2])
        hkl, n_indexed = assign_indices_global(crystal.a_matrix, rlp, xyzobs_px)
        if best is None or n_indexed > best[1]:
            best = (crystal, n_indexed, hkl)
    crystal, n_indexed, hkl = best
    if n_indexed == 0:
        return None

    sel = ~(hkl == 0).all(axis=1)
    hkl_sel = hkl[sel]
    obs_sel = np.asarray(xyzobs_px)[sel]
    A = crystal.a_matrix  # == U @ B without the extra inversion round trip

    pred = predict_stills(hkl_sel, s0, A, panel)
    dx = obs_sel[:, 0] - pred["xyzcal_px"][:, 0]
    dy = obs_sel[:, 1] - pred["xyzcal_px"][:, 1]
    good = np.sqrt(dx * dx + dy * dy) < 2.0
    rmsds = []
    if good.any():
        rmsds = [
            float(np.sqrt(np.mean(dx[good] ** 2))),
            float(np.sqrt(np.mean(dy[good] ** 2))),
            float(np.sqrt(np.mean(pred["delpsi"][good] ** 2))),
        ]

    return SSXIndexingResult(
        cell_parameters=list(crystal.unit_cell),
        a_matrix=A,
        miller_indices=hkl_sel[good],
        xyzobs_px=obs_sel[good],
        xyzcal_px=pred["xyzcal_px"][good],
        s1=pred["s1"][good],
        delpsi=pred["delpsi"][good],
        rmsds=rmsds,
    )


class SSXIndexer:
    """Drop-in equivalent of the reference GPUIndexer
    (reference: ssx_index.py:40-159)."""

    def __init__(self, min_spots: int = 10, use_device: bool = True):
        self.min_spots = min_spots
        self.use_device = use_device
        self.panel = None
        self.cell = None  # (a, b, c, alpha, beta, gamma)
        self._wavelength = None
        self.s0 = None

    @property
    def wavelength(self):
        return self._wavelength

    @wavelength.setter
    def wavelength(self, wl):
        self._wavelength = wl
        self.s0 = np.array([0.0, 0.0, -1.0 / wl])

    def index(self, xyzobs_px: np.ndarray):
        """Returns (SSXIndexingResult | None, n_unindexed)."""
        from .rlp import ssx_xyz_to_rlp

        xyzobs_px = np.asarray(xyzobs_px, dtype=np.float64).reshape(-1, 3)
        n_initial = len(xyzobs_px)
        if n_initial < self.min_spots:
            return None, n_initial
        rlp = ssx_xyz_to_rlp(xyzobs_px, self.panel, self.wavelength)
        cells = find_candidate_cells(rlp, self.cell, use_device=self.use_device)
        result = index_from_ssx_cells(cells, rlp, xyzobs_px, self.s0, self.panel)
        if result is None:
            return None, n_initial
        return result, n_initial - len(result.delpsi)
