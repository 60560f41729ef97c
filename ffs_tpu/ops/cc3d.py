"""Host-side 3D connected-component merge across frames.

The per-frame pixel-parallel work (thresholding, 2D labelling, compaction)
happens on device (ops/connected_components.py); what reaches the host is
only the compact strong-pixel list of each frame (a few thousand entries).
This module merges those per-frame fragments into 3D spots — the equivalent
of the reference's global Boost-graph merge (reference:
spotfinder/connected_components/connected_components.cc:270-471) — using a
vectorised union-find over *fragments* (per-frame 2D components) instead of
pixels: intra-frame connectivity is already folded on device, and two
fragments in adjacent frames merge iff they share a strong pixel at the
same (x, y), which is exactly the reference's inter-slice edge rule
(connected_components.cc:350-370).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class FramePixels:
    """Compact strong pixels of one frame (host arrays, raster order)."""

    linear_index: np.ndarray  # (n,) int
    intensity: np.ndarray  # (n,) int
    root: np.ndarray  # (n,) int — 2D component root linear index


@dataclass
class Spots3D:
    """Per-spot statistics, one row per 3D (or 2D) connected component."""

    n_pixels: np.ndarray
    sum_intensity: np.ndarray
    com_x: np.ndarray  # +0.5 pixel-centre convention, intensity weighted
    com_y: np.ndarray
    com_z: np.ndarray
    x_min: np.ndarray
    x_max: np.ndarray
    y_min: np.ndarray
    y_max: np.ndarray
    z_min: np.ndarray
    z_max: np.ndarray
    peak_x: np.ndarray
    peak_y: np.ndarray
    peak_z: np.ndarray
    peak_intensity: np.ndarray
    # pixel-level membership, needed for per-spot variance calculations
    pixel_spot: np.ndarray  # (N,) spot id per pixel
    pixel_x: np.ndarray
    pixel_y: np.ndarray
    pixel_z: np.ndarray
    pixel_intensity: np.ndarray

    def __len__(self) -> int:
        return len(self.n_pixels)

    def peak_centroid_distance(self) -> np.ndarray:
        dx = self.peak_x + 0.5 - self.com_x
        dy = self.peak_y + 0.5 - self.com_y
        dz = self.peak_z + 0.5 - self.com_z
        return np.sqrt(dx * dx + dy * dy + dz * dz)


class _UnionFind:
    def __init__(self, n: int):
        self.parent = np.arange(n, dtype=np.int64)

    def find(self, i: int) -> int:
        p = self.parent
        root = i
        while p[root] != root:
            root = p[root]
        while p[i] != root:
            p[i], i = root, p[i]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # keep the smaller root: deterministic labelling
            if ra < rb:
                self.parent[rb] = ra
            else:
                self.parent[ra] = rb

    def find_all(self, idx: np.ndarray) -> np.ndarray:
        # full path compression pass, then vectorised lookup
        p = self.parent
        while True:
            pp = p[p]
            if np.array_equal(pp, p):
                break
            p = pp
        self.parent = p
        return p[idx]

    def union_edges(self, u: np.ndarray, v: np.ndarray) -> None:
        """Batch union of edge arrays via iterated min-hooking.

        Vectorised replacement for a per-edge Python loop (r1 review weak
        #5: a 3600-frame collection with dense inter-slice edges): each
        round fully compresses, hooks every still-split edge's larger root
        onto the smallest root contending for it (np.minimum.at resolves
        conflicts), and repeats — O(log n) rounds.  Produces the same
        min-root partition as sequential keep-smaller-root unions.
        """
        if len(u) == 0:
            return
        u = np.asarray(u, dtype=np.int64)
        v = np.asarray(v, dtype=np.int64)
        while True:
            p = self.parent
            while True:
                pp = p[p]
                if np.array_equal(pp, p):
                    break
                p = pp
            self.parent = p
            ru, rv = p[u], p[v]
            split = ru != rv
            if not split.any():
                return
            lo = np.minimum(ru[split], rv[split])
            hi = np.maximum(ru[split], rv[split])
            np.minimum.at(self.parent, hi, lo)


def merge_frames(
    frames: list[FramePixels],
    width: int,
) -> Spots3D:
    """Merge per-frame 2D fragments into 3D components and compute stats.

    ``frames`` must be in acquisition order; frame index becomes z.
    """
    # dense per-frame fragment ids and the global fragment numbering
    frag_ids = []
    frag_offsets = []
    total_frags = 0
    frame_roots = []
    for f in frames:
        roots, inv = np.unique(f.root, return_inverse=True)
        frag_ids.append(inv)
        frag_offsets.append(total_frags)
        frame_roots.append(roots)
        total_frags += len(roots)

    uf = _UnionFind(total_frags)
    edges_u, edges_v = [], []
    for z in range(len(frames) - 1):
        a, b = frames[z], frames[z + 1]
        if len(a.linear_index) == 0 or len(b.linear_index) == 0:
            continue
        common, ia, ib = np.intersect1d(
            a.linear_index, b.linear_index, assume_unique=True, return_indices=True
        )
        edges_u.append(frag_ids[z][ia] + frag_offsets[z])
        edges_v.append(frag_ids[z + 1][ib] + frag_offsets[z + 1])
    if edges_u:
        uf.union_edges(np.concatenate(edges_u), np.concatenate(edges_v))

    # flatten pixels with global fragment ids
    all_frag = np.concatenate(
        [frag_ids[z] + frag_offsets[z] for z in range(len(frames))]
    ) if frames else np.zeros(0, dtype=np.int64)
    all_lin = np.concatenate([f.linear_index for f in frames]) if frames else np.zeros(0, int)
    all_int = np.concatenate([f.intensity for f in frames]) if frames else np.zeros(0, int)
    all_z = np.concatenate(
        [np.full(len(f.linear_index), z, dtype=np.int64) for z, f in enumerate(frames)]
    ) if frames else np.zeros(0, int)

    spot_of_frag = uf.find_all(np.arange(total_frags))
    pixel_root = spot_of_frag[all_frag] if total_frags else all_frag
    # dense spot numbering, deterministic (ordered by min fragment id, which
    # is ordered by (frame, root linear index) — matching the reference's
    # slice-then-map iteration order)
    uniq, spot = np.unique(pixel_root, return_inverse=True)
    n_spots = len(uniq)

    x = (all_lin % width).astype(np.int64)
    y = (all_lin // width).astype(np.int64)
    inten = all_int.astype(np.float64)

    sum_i = np.bincount(spot, weights=inten, minlength=n_spots)
    n_pix = np.bincount(spot, minlength=n_spots)
    com_x = np.bincount(spot, weights=inten * x, minlength=n_spots) / sum_i + 0.5
    com_y = np.bincount(spot, weights=inten * y, minlength=n_spots) / sum_i + 0.5
    com_z = np.bincount(spot, weights=inten * all_z, minlength=n_spots) / sum_i + 0.5

    big = np.iinfo(np.int64).max

    def _extreme(vals, take_min):
        out = np.full(n_spots, big if take_min else -big, dtype=np.int64)
        (np.minimum if take_min else np.maximum).at(out, spot, vals)
        return out

    x_min, x_max = _extreme(x, True), _extreme(x, False)
    y_min, y_max = _extreme(y, True), _extreme(y, False)
    z_min, z_max = _extreme(all_z, True), _extreme(all_z, False)

    # peak: max intensity, ties -> smallest (z, y, x)
    # (reference: connected_components.cc:143-157)
    order = np.lexsort((x, y, all_z, -inten, spot))
    first = np.searchsorted(spot[order], np.arange(n_spots), side="left")
    peak_idx = order[first]

    return Spots3D(
        n_pixels=n_pix,
        sum_intensity=sum_i,
        com_x=com_x,
        com_y=com_y,
        com_z=com_z,
        x_min=x_min,
        x_max=x_max,
        y_min=y_min,
        y_max=y_max,
        z_min=z_min,
        z_max=z_max,
        peak_x=x[peak_idx],
        peak_y=y[peak_idx],
        peak_z=all_z[peak_idx],
        peak_intensity=inten[peak_idx],
        pixel_spot=spot,
        pixel_x=x,
        pixel_y=y,
        pixel_z=all_z,
        pixel_intensity=inten,
    )


def filter_spots(
    spots: Spots3D, min_spot_size: int, max_peak_centroid_separation: float
) -> tuple[np.ndarray, int, int]:
    """(keep mask, n_filtered_by_size, n_filtered_by_separation), matching
    reference filter order (connected_components.cc:207-236)."""
    keep = np.ones(len(spots), dtype=bool)
    n_size = 0
    if min_spot_size > 0:
        size_ok = spots.n_pixels >= min_spot_size
        n_size = int((~size_ok).sum())
        keep &= size_ok
    n_sep = 0
    if max_peak_centroid_separation > 0:
        sep_ok = spots.peak_centroid_distance() <= max_peak_centroid_separation
        n_sep = int((keep & ~sep_ok).sum())
        keep &= sep_ok
    return keep, n_size, n_sep


def variances_in_kabsch_space(
    spots: Spots3D,
    panel,
    scan,
    s0: np.ndarray,
    m2: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-spot (sigma_b_variance, sigma_m_variance, bbox_depth).

    Vectorised port of the per-pixel Kabsch-frame variance accumulation
    (reference: connected_components.cc:159-203): intensity-weighted
    variances of the e1/e2-plane displacement (averaged per dials#2851) and
    the e3 (rotation) displacement, per 3D spot.
    """
    # per-spot reference vectors at the centroid
    xmm, ymm = panel.px_to_mm(spots.com_x, spots.com_y)
    s1 = panel.get_lab_coord(xmm, ymm)  # (S, 3)
    e1 = np.cross(s1, s0)
    e1 /= np.linalg.norm(e1, axis=-1, keepdims=True)
    e2 = np.cross(s1, e1)
    e2 /= np.linalg.norm(e2, axis=-1, keepdims=True)
    mags1 = np.linalg.norm(s1, axis=-1)
    zeta = e1 @ m2
    osc_start, osc_width = scan.oscillation
    image_range_0 = scan.image_range[0]
    phi = np.deg2rad(osc_start + (spots.com_z - image_range_0) * osc_width)

    # per-pixel displacements
    pxmm, pymm = panel.px_to_mm(spots.pixel_x + 0.5, spots.pixel_y + 0.5)
    s1p = panel.get_lab_coord(pxmm, pymm)  # (N, 3)
    sid = spots.pixel_spot
    delta = s1p - s1[sid]
    eps1 = np.einsum("ij,ij->i", delta, e1[sid]) / mags1[sid]
    eps2 = np.einsum("ij,ij->i", delta, e2[sid]) / mags1[sid]
    phi_px = np.deg2rad(
        osc_start + (spots.pixel_z + 0.5 - image_range_0) * osc_width
    )
    eps3 = (phi_px - phi[sid]) * zeta[sid]

    w = spots.pixel_intensity
    n = len(spots)
    tot = np.bincount(sid, weights=w, minlength=n)
    varx = np.bincount(sid, weights=w * eps1 * eps1, minlength=n) / tot
    vary = np.bincount(sid, weights=w * eps2 * eps2, minlength=n) / tot
    varz = np.bincount(sid, weights=w * eps3 * eps3, minlength=n) / tot
    depth = spots.z_max - spots.z_min + 1
    # (varx + vary)/2: see dials/dials#2851
    return (varx + vary) / 2.0, varz, depth
