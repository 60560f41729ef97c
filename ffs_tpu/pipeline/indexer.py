"""baseline_indexer CLI — FFT rotation indexing.

Equivalent of the reference `baseline_indexer` executable (reference:
baseline/indexer/indexer.cc:50-620): strong reflections + experiment JSON
in; candidate lattice vectors via a 3D FFT of the rlps; candidate crystals
scored by assign/correct/filter/refine; macro-cycles of joint refinement at
stepped d_min; `indexed.expt` + `indexed.refl` out.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _entering_flags(s1, s0, axis):
    vec = np.cross(s0, axis)
    return (s1 @ vec) < 0.0


def run(argv=None) -> int:
    from ..utils.jaxinit import setup

    setup(x64=True)

    from ..indexing import combinations as comb_mod
    from ..indexing import fft3d as fft_mod
    from ..indexing import flood_fill as ff_mod
    from ..indexing import peaks as peaks_mod
    from ..indexing.assign import assign_indices_global
    from ..indexing.predict import predict_scan_static
    from ..indexing.refine import refine_candidate
    from ..indexing.rlp import xyz_to_rlp
    from ..indexing.score import evaluate_crystal, score_solutions
    from ..models.experiment import Experiment
    from ..models.reflection_table import INDEXED, STRONG, ReflectionTable

    p = argparse.ArgumentParser(prog="baseline_indexer")
    p.add_argument("-e", "--expt", required=True, help="Path to the DIALS expt file")
    p.add_argument("-r", "--refl", required=True, help="Path to the reflection h5")
    p.add_argument("--dmin", type=float, default=None)
    p.add_argument("--max-cell", type=float, required=True)
    p.add_argument("--max-refine", type=int, default=50)
    p.add_argument("--macro-cycles", type=int, default=5)
    p.add_argument("--test", action="store_true")
    p.add_argument("--no-output", action="store_true")
    p.add_argument("--fft-npoints", type=int, default=256)
    p.add_argument("--nthreads", type=int, default=None)
    args = p.parse_args(argv)

    expt = Experiment.load(args.expt)
    strong = ReflectionTable.read(args.refl)
    xyzobs_px = np.asarray(strong["xyzobs.px.value"], dtype=np.float64)

    res = xyz_to_rlp(xyzobs_px, expt.panel, expt.beam, expt.scan, expt.goniometer)
    rlp, s1, xyzobs_mm = res["rlp"], res["s1"], res["xyzobs_mm"]
    print(f"Number of reflections: {len(rlp)}")

    n_points = args.fft_npoints
    d_values = 1.0 / np.linalg.norm(rlp, axis=1)
    d_min_data = float(d_values.min())
    if args.dmin is not None:
        d_min = args.dmin
    else:
        # d_min = 5 max_cell / n_points (Campbell 1998; indexer.cc:185-200)
        d_min = max(5.0 * args.max_cell / n_points, d_min_data)
        print(f"Setting dmin to {d_min:.5f}")
    b_iso = fft_mod.b_iso_from_d_min(d_min)
    print(f"Setting b_iso = {b_iso:.3f}")

    grid, used = fft_mod.fft3d(rlp, d_min, b_iso, n_points)
    vols, coms = ff_mod.flood_fill(grid, 15.0, n_points)
    vols, coms = ff_mod.flood_fill_filter(vols, coms, 0.15)
    vectors = peaks_mod.peaks_to_rlvs(
        coms, vols, d_min, 3.0, args.max_cell, n_points
    )
    print("Candidate basis vectors:")
    for i, v in enumerate(vectors):
        print(f"{i} {np.linalg.norm(v):.5f}")

    if len(vectors) < 3:
        print("Insufficient number of candidate vectors to make a crystal model.")
        return 0

    if args.test:
        pad = len(str(max(len(vectors) - 1, 0)))
        with open("candidate_vectors.json", "w") as f:
            json.dump(
                {str(i).zfill(pad): [float(x) for x in v] for i, v in enumerate(vectors)},
                f,
                indent=4,
            )
        print("Saved candidate vectors to candidate_vectors.json")

    flags = np.full(len(rlp), STRONG, dtype=np.uint64)
    entering = _entering_flags(s1, expt.beam.s0, expt.goniometer.rotation_axis)

    # dmin + oscillation-trim selection (indexer.cc:262-276)
    osc_trim = expt.scan.oscillation[0] + 360.0
    sel = (d_values > d_min) & (np.degrees(xyzobs_mm[:, 2]) <= osc_trim)

    n_images = expt.scan.image_range[1] - expt.scan.image_range[0] + 1
    scan_width = expt.scan.oscillation[0] + expt.scan.oscillation[1] * n_images

    import itertools
    from concurrent.futures import ThreadPoolExecutor

    gen = comb_mod.candidate_orientation_matrices(vectors, 1000)
    print(f"Scoring up to {args.max_refine} candidate crystals")
    crystals = list(itertools.islice(gen, args.max_refine))

    def _score(crystal):
        return evaluate_crystal(
            crystal,
            rlp=rlp[sel],
            xyzobs_mm=xyzobs_mm[sel],
            flags=flags[sel],
            s1=s1[sel],
            entering=entering[sel],
            beam=expt.beam,
            panel=expt.panel,
            gonio=expt.goniometer,
            scan_width_degrees=scan_width,
            n_ref_per_degree=20,
        )

    # Candidate scoring runs on a small thread pool (the reference threads
    # this loop too, sized from --nthreads, indexer.cc:215-220,299-304 /
    # SURVEY P6): host-side model prep overlaps the per-candidate device
    # refinement dispatches; results keep generator order for
    # deterministic scoring output.
    nthreads = args.nthreads if args.nthreads else min(4, len(crystals))
    if len(crystals) > 1 and nthreads > 1:
        with ThreadPoolExecutor(max_workers=nthreads) as ex:
            scores = list(ex.map(_score, crystals))
    else:
        scores = [_score(c) for c in crystals]
    candidates = []
    for score in scores:
        if score is not None:
            candidates.append(score)
            print(f"Scored candidate crystal {len(candidates)}")

    if not candidates:
        print("No viable candidate crystals.")
        return 0

    score_solutions(candidates)
    candidates.sort(key=lambda c: c.score)
    print(
        "| Unit cell                                 | volume & score | #indexed % & "
        "score | rmsd_xy & score | overall score |"
    )
    for c in candidates:
        a, b, cc_, al, be, ga = c.crystal.unit_cell
        print(
            f"| {a:>6.2f} {b:>6.2f} {cc_:>6.2f} {al:>6.2f} {be:>6.2f} {ga:>6.2f} "
            f"| {c.crystal.volume:>8.0f}  {c.volume_score:.2f} "
            f"| {c.num_indexed:>7.0f}  {c.fraction_indexed * 100:>3.0f}  {c.indexed_score:.2f} "
            f"| {c.rmsdxy:>6.2f}    {c.rmsd_score:>5.2f} |        {c.score:>6.2f} |"
        )

    if args.test:
        pad = len(str(len(candidates) - 1))
        out = {}
        for i, c in enumerate(candidates):
            a, b, cc_, al, be, ga = c.crystal.unit_cell
            out[str(i).zfill(pad)] = {
                "crystal": c.crystal.to_json(),
                "unit_cell": [a, b, cc_, al, be, ga],
                "num_indexed": c.num_indexed,
                "fraction_indexed": c.fraction_indexed,
                "rmsdxy": c.rmsdxy,
                "score": c.score,
            }
        with open("candidate_crystals.json", "w") as f:
            json.dump(out, f, indent=4)
        print("Saved candidate crystals to candidate_crystals.json")

    best = candidates[0]
    expt.crystal = best.crystal
    expt.beam.wavelength = 1.0 / np.linalg.norm(best.s0)
    expt.beam.direction = -best.s0 / np.linalg.norm(best.s0)
    expt.update_panel_frame(*best.panel_frame)

    # macro cycles of refinement at stepped d_min (indexer.cc:401-447)
    if args.macro_cycles:
        from ..indexing.filter import reflection_filter_preevaluation

        d_step = (d_min - d_min_data) / args.macro_cycles
        print(
            f"Performing {args.macro_cycles} macro cycles with a dmin step of "
            f"{d_step:.3f}"
        )
        for cycle in range(args.macro_cycles):
            d_cycle = d_min - (cycle + 1) * d_step
            print(f"Performing macro cycle {cycle + 1} with d_min={d_cycle:.3f}")
            res = xyz_to_rlp(
                xyzobs_px, expt.panel, expt.beam, expt.scan, expt.goniometer
            )
            rlp_c, s1_c, xyz_c = res["rlp"], res["s1"], res["xyzobs_mm"]
            d_vals = 1.0 / np.linalg.norm(rlp_c, axis=1)
            sel_c = (d_vals > d_cycle) & (np.degrees(xyz_c[:, 2]) <= osc_trim)
            hkl_c, n_idx = assign_indices_global(
                expt.crystal.a_matrix, rlp_c[sel_c], xyz_c[sel_c]
            )
            print(f"Indexed {n_idx}/{int(sel_c.sum())} reflections")
            filt = reflection_filter_preevaluation(
                hkl=hkl_c,
                flags=flags[sel_c],
                s1=s1_c[sel_c],
                xyzobs_mm=xyz_c[sel_c],
                entering=entering[sel_c],
                crystal=expt.crystal,
                beam=expt.beam,
                panel=expt.panel,
                gonio=expt.goniometer,
                scan_width_degrees=scan_width,
                n_ref_per_degree=100,
            )
            if len(filt.indices) < 10:
                continue
            refined, s0_new, frame, _ = refine_candidate(
                expt.crystal,
                expt.beam,
                expt.panel,
                expt.goniometer,
                filt.hkl,
                filt.entering,
                filt.xyzobs_mm,
            )
            expt.crystal = refined
            expt.beam.wavelength = 1.0 / np.linalg.norm(s0_new)
            expt.beam.direction = -s0_new / np.linalg.norm(s0_new)
            expt.update_panel_frame(*frame)

    expt.save("indexed.expt")
    print("Saved experiment list to indexed.expt")

    if not args.no_output:
        res = xyz_to_rlp(xyzobs_px, expt.panel, expt.beam, expt.scan, expt.goniometer)
        strong["xyzobs.mm.value"] = res["xyzobs_mm"]
        strong["s1"] = res["s1"]
        strong["rlp"] = res["rlp"]
        if "panel" not in strong:
            strong["panel"] = np.zeros(len(rlp), dtype=np.uint64)
        if "xyzobs.px.variance" in strong:
            var_px = np.asarray(strong["xyzobs.px.variance"], dtype=np.float64)
            px, py = expt.panel.pixel_size
            osc_w = np.deg2rad(expt.scan.oscillation[1])
            strong["xyzobs.mm.variance"] = var_px * np.array(
                [px * px, py * py, osc_w * osc_w]
            )
        hkl, n_indexed = assign_indices_global(
            expt.crystal.a_matrix, res["rlp"], res["xyzobs_mm"]
        )
        pct = 100.0 * n_indexed / len(xyzobs_px)
        print(
            f"Indexed {n_indexed}/{len(xyzobs_px)} reflections using the refined "
            f"models ({pct:.2f}% indexed)"
        )
        a, b, cc_, al, be, ga = expt.crystal.unit_cell
        print(f"Crystal:\n  Unit cell: {a:.4f} {b:.4f} {cc_:.4f} {al:.4f} {be:.4f} {ga:.4f}")
        print("  Space group: P 1")

        strong["miller_index"] = hkl
        new_flags = np.asarray(
            strong["flags"] if "flags" in strong else np.full(len(rlp), STRONG, np.uint64),
            dtype=np.uint64,
        )
        new_flags = np.where(
            ~(hkl == 0).all(axis=1), new_flags | np.uint64(INDEXED), new_flags
        )
        strong["flags"] = new_flags
        strong["entering"] = _entering_flags(
            res["s1"], expt.beam.s0, expt.goniometer.rotation_axis
        ).astype(np.uint8)
        pred = predict_scan_static(
            hkl,
            strong["entering"].astype(bool),
            res["xyzobs_mm"][:, 2],
            s0=expt.beam.s0,
            fixed_rotation=expt.goniometer.fixed_rotation,
            setting_rotation=expt.goniometer.setting_rotation,
            rotation_axis=expt.goniometer.rotation_axis,
            ub=expt.crystal.a_matrix,
            d_matrix=expt.d_matrix,
        )
        strong["xyzcal.mm"] = pred["xyzcal_mm"]
        strong.identifiers = [expt.identifier]
        strong.experiment_ids = [0]
        strong.write("indexed.refl")
        print("Saved reflection table to indexed.refl")
    return 0


def main() -> None:
    sys.exit(run())


if __name__ == "__main__":
    sys.exit(run())
