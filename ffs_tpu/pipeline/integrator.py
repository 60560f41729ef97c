"""integrator CLI — summation integration.

Equivalent of the reference GPU `integrator` executable (reference:
integrator/integrator.cc:320-1334): reflections + experiment (+ images) in;
sigma estimation unless given; prediction if the table is not predicted;
Kabsch bounding boxes; per-frame foreground/background classification on
device; background reduction (Tukey or robust-Poisson GLM) over bounded
histograms; summation intensities with DIALS variances; integrated.refl out.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


class _StreamingReader:
    """Availability-waiting, prefetching facade over a frame reader.

    Honors the CLI's ``--timeout`` (SWMR wait for frames a live
    collection hasn't written yet — the spotfinder's intake semantics)
    and ``--threads`` (a decode pool prefetching upcoming frames so host
    HDF5/decompression overlaps the device steps; reference: the
    integrator's reader threads streaming images through the kernel,
    integrator.cc:820-991)."""

    def __init__(self, reader, image_numbers, timeout=30.0, threads=0):
        from concurrent.futures import ThreadPoolExecutor

        self._r = reader
        self._timeout = float(timeout)
        self._order = list(image_numbers)
        self._pos = {n: i for i, n in enumerate(self._order)}
        self._threads = int(threads)
        self._ex = (
            ThreadPoolExecutor(self._threads) if self._threads > 0 else None
        )
        self._futs: dict = {}

    def get_mask(self):
        return self._r.get_mask()

    def get_number_of_images(self):
        return self._r.get_number_of_images()

    def _fetch(self, n):
        avail = getattr(self._r, "is_image_available", None)
        if avail is not None:
            deadline = time.monotonic() + self._timeout
            while not avail(n):
                if time.monotonic() >= deadline:
                    raise TimeoutError(
                        f"timed out after {self._timeout:g} s waiting for "
                        f"image {n}"
                    )
                time.sleep(0.1)
        return self._r.get_image(n)

    def get_image(self, n):
        if self._ex is None:
            return self._fetch(n)
        i = self._pos.get(n)
        ahead = [n] if i is None else self._order[i : i + 1 + self._threads]
        for m in ahead:
            if m not in self._futs:
                self._futs[m] = self._ex.submit(self._fetch, m)
        return self._futs.pop(n).result()

    def close(self):
        if self._ex is not None:
            self._ex.shutdown(wait=False, cancel_futures=True)
        if hasattr(self._r, "close"):
            self._r.close()


def run(argv=None) -> int:
    from ..utils.jaxinit import setup

    setup(x64=True)

    from ..integration import background as bg_mod
    from ..integration import extent as extent_mod
    from ..integration import finalize as fin_mod
    from ..integration import kabsch as kabsch_mod
    from ..integration.sigma import estimate_sigmas
    from ..models.experiment import Experiment
    from ..models.reflection_table import INTEGRATED_SUM, PREDICTED, ReflectionTable
    from ..prediction.rotation import predict_rotation

    from ..utils.cli import add_common_arguments, apply_verbosity, expand_common_args

    p = argparse.ArgumentParser(prog="integrator")
    add_common_arguments(p)
    # the reference integrator derives from CUDAArgumentParser, which adds
    # the device-selection surface (cuda_arg_parser.cc:30-41)
    p.add_argument("--list-devices", action="store_true")
    p.add_argument("--device", type=int, default=0)
    p.add_argument("--reflection", "-r", required=False, metavar="strong.refl")
    p.add_argument("--experiment", "-e", required=False, metavar="experiments.expt")
    p.add_argument("--images", "-i", default=None, metavar="images.nxs")
    p.add_argument("-n", "--threads", type=int, default=0)
    p.add_argument("--timeout", type=float, default=30.0)
    p.add_argument("--sigma_m", "-sm", type=float, default=None)
    p.add_argument("--sigma_b", "-sb", type=float, default=None)
    p.add_argument(
        "--sigma_estimation.min_bbox_depth",
        "--min_bbox_depth",
        dest="min_bbox_depth",
        type=int,
        default=6,
    )
    p.add_argument("-a", "--algorithm", default="ellipsoid", choices=["ellipsoid", "dials"])
    p.add_argument(
        "--background", default="constant",
        choices=["constant", "glm", "dials"],
        help="constant = shared-core Tukey; glm = robust-Poisson GLM; "
        "dials = the independent dials-faithful Tukey cross-check "
        "(reference: baseline/integrator/integrator.cc:112-116)",
    )
    p.add_argument(
        "--bg-device",
        action="store_true",
        help="Run the background reduction AND finalisation on the "
        "accelerator (one (N, bins) IRLS program + one fused finalize "
        "program; reference GPU reduction: background.cu:29-99).  The "
        "host finalize is ~25 numpy passes over the whole collection — "
        "3.1 s at 1.67M reflections on one CPU vs milliseconds on device.",
    )
    p.add_argument("--min_zeta", type=float, default=0.05)
    p.add_argument("--output", default="integrated.refl")
    p.add_argument("--sample", action="store_true", help="Use generated test data")
    p.add_argument(
        "--profile",
        action="store_true",
        help="Print a per-stage wall-clock breakdown at the end (the "
        "spotfinder --profile analogue; reference per-stage CUDA events: "
        "integrator.cc:925-991)",
    )
    args = p.parse_args(expand_common_args(argv))
    apply_verbosity(args)

    if args.list_devices:
        import jax

        for i, d in enumerate(jax.devices()):
            print(f"{i}: {d.device_kind}")
        return 0
    if not args.reflection or not args.experiment:
        p.error("the following arguments are required: --reflection/-r, --experiment/-e")

    stage_t: dict[str, float] = {}
    t_last = time.monotonic()

    def mark(stage: str) -> None:
        nonlocal t_last
        now = time.monotonic()
        stage_t[stage] = stage_t.get(stage, 0.0) + (now - t_last)
        t_last = now

    expt = Experiment.load(args.experiment)
    table = ReflectionTable.read(args.reflection)
    if expt.crystal is None:
        print("Error: experiment has no crystal model")
        return 1
    mark("load")

    # sigma estimation (integrator.cc:397-444)
    if args.sigma_b is not None and args.sigma_m is not None:
        sigma_b, sigma_m = args.sigma_b, args.sigma_m
    else:
        sigma_b, sigma_m = estimate_sigmas(table, expt, args.min_bbox_depth)
    print(
        f"Using sigma_b={np.degrees(sigma_b):.6f} deg, "
        f"sigma_m={np.degrees(sigma_m):.6f} deg"
    )

    # reuse predictions if flagged, else predict (integrator.cc:446-527)
    flags = np.asarray(table["flags"], np.uint64) if "flags" in table else None
    if (
        flags is not None
        and "s1" in table
        and "xyzcal.mm" in table
        and "miller_index" in table
        and ((flags & PREDICTED) != 0).any()
    ):
        sel = (flags & PREDICTED) != 0
        s1 = np.asarray(table["s1"], np.float64)[sel]
        phi = np.asarray(table["xyzcal.mm"], np.float64)[sel][:, 2]
        xyzcal_mm = np.asarray(table["xyzcal.mm"], np.float64)[sel]
        hkl = np.asarray(table["miller_index"], np.int64)[sel]
        ids = (
            np.asarray(table["id"])[sel]
            if "id" in table
            else np.zeros(sel.sum(), np.int64)
        )
    else:
        # scan-varying model states (A/s0/setting at scan points) from the
        # expt JSON, exactly like the reference's extract_scan_varying_data
        # -> predict_rotation handoff (integrator.cc:474-492); a DIALS
        # scan-varying-refined experiment predicted with only the static
        # matrices would drift shoeboxes across the scan
        import json as _json

        from ..prediction.rotation import parse_scan_varying

        with open(args.experiment) as f:
            elist = _json.load(f)
        n_images = expt.scan.image_range[1] - expt.scan.image_range[0] + 1
        sv = parse_scan_varying(elist, n_images)
        if sv:
            print("Monochromatic scan-varying prediction")
        else:
            print("Monochromatic static prediction")
        pred = predict_rotation(expt, sv)
        s1 = pred.s1
        xyzcal_mm = pred.xyzcal_mm
        phi = pred.xyzcal_mm[:, 2]
        hkl = pred.hkl
        ids = np.zeros(len(s1), np.int64)
    n = len(s1)
    print(f"Integrating {n} reflections")
    mark("sigma+predict")

    # bounding boxes + coordinate systems + min_zeta skip
    bbox_fn = (
        extent_mod.compute_kabsch_bounding_boxes_device
        if args.bg_device
        else extent_mod.compute_kabsch_bounding_boxes
    )
    bboxes = bbox_fn(
        expt.beam.s0,
        expt.goniometer.rotation_axis,
        s1,
        phi,
        sigma_b,
        sigma_m,
        expt.panel,
        expt.scan,
    )
    cs = extent_mod.coordinate_systems(
        expt.beam.s0,
        expt.goniometer.rotation_axis / np.linalg.norm(expt.goniometer.rotation_axis),
        s1,
    )
    integrate_sel = np.abs(cs.zeta) >= args.min_zeta
    n_skipped = int((~integrate_sel).sum())
    if n_skipped:
        print(f"min_zeta={args.min_zeta:g}: skipping {n_skipped} of {n} reflections")

    # clip bboxes to the detector (off-panel pixels cannot contribute)
    w, h = expt.panel.image_size
    bboxes[:, 0] = np.clip(bboxes[:, 0], 0, w - 1)
    bboxes[:, 1] = np.clip(bboxes[:, 1], 0, w - 1)
    bboxes[:, 2] = np.clip(bboxes[:, 2], 0, h - 1)
    bboxes[:, 3] = np.clip(bboxes[:, 3], 0, h - 1)

    # reader
    if args.sample:
        from ..io.sample_data import SampleReader

        reader = SampleReader()
    elif args.images:
        from ..io.nexus import NexusReader

        reader = NexusReader(args.images)
    else:
        print("Error: must provide --images or --sample")
        return 1

    delta_b = extent_mod.DEFAULT_N_SIGMA * sigma_b * extent_mod.DEFAULT_SIGMA_B_MULTIPLIER
    delta_m = extent_mod.DEFAULT_N_SIGMA * sigma_m

    # min_zeta-skipped reflections get an empty sentinel bbox (shared by
    # the integrator and the fill-histogram diagnostic below)
    masked_bboxes = np.where(
        integrate_sel[:, None], bboxes, np.array([[0, -1, 0, -1, 0, -1]])
    )
    integ = kabsch_mod.KabschIntegrator(
        panel=expt.panel,
        beam=expt.beam,
        gonio=expt.goniometer,
        scan=expt.scan,
        s1=s1,
        phi=phi,
        bboxes=masked_bboxes,
        delta_b=delta_b,
        delta_m=delta_m,
        algorithm=args.algorithm,
        # 2048-reflection chunks amortise the per-dispatch fixed work:
        # 1.25M slices/s vs 1.02M at 1024 on v5e (tools/bench_integrator).
        # ~300 MB of device window buffers at 24x128 boxes — fine in HBM.
        max_active=min(2048, max(128, (int(integrate_sel.sum()) + 127) // 128 * 128)),
    )
    # shoebox occupancy diagnostic (reference: integrator.cc:76-153,630-634
    # logs its pass-count histogram at debug level)
    if args.profile or os.environ.get("LOG_LEVEL", "").lower() in (
        "debug",
        "trace",
    ):
        hist = kabsch_mod.format_shoebox_fill_histogram(
            masked_bboxes,
            integ.box_w,
            integ.box_h,
            integ.max_active,
        )
        if hist:
            print(hist)
    mark("bbox+setup")

    acc = kabsch_mod.Accumulators.zeros(n)
    z0, z1 = expt.scan.image_range
    n_images = min(z1 - z0 + 1, reader.get_number_of_images())
    image_numbers = range(z0 - 1, z0 - 1 + n_images)
    stream = _StreamingReader(
        reader, image_numbers, timeout=args.timeout, threads=args.threads
    )
    try:
        integ.integrate(stream, image_numbers, acc)
    finally:
        stream.close()
    mark("kabsch")

    fin_mod.check_overflow(acc.bg_count, acc.bg_overflow)
    bg_model = {"constant": "tukey", "glm": "glm", "dials": "dials"}[
        args.background
    ]
    if args.bg_device and bg_model == "dials":
        # the dials cross-check variant is host-only by design (it exists
        # to independently check the device/shared reductions)
        print("note: --background dials runs on host; ignoring --bg-device for the background stage")
    if args.bg_device and bg_model != "dials":
        # device reduction: whole reflection batch as one (N, bins) XLA
        # program (reference: integrator/background.cu:29-99)
        from ..integration.background_jax import estimate_background_device

        bg_mean, bg_wsum, bg_valid = (
            np.asarray(v)
            for v in estimate_background_device(
                acc.bg_hist, acc.bg_overflow, bg_model
            )
        )
    else:
        bg_mean, bg_wsum, bg_valid = bg_mod.estimate_background(
            acc.bg_hist, acc.bg_overflow, bg_model
        )
    mark("background")
    finalize_fn = (
        fin_mod.finalize_device if args.bg_device else fin_mod.finalize
    )
    result = finalize_fn(
        acc=acc,
        bg_mean=bg_mean,
        bg_wsum=bg_wsum,
        bg_valid=bg_valid,
        bboxes=bboxes,
        s1=s1,
        phi=phi,
        hkl=hkl,
        zeta=cs.zeta,
        scan=expt.scan,
        beam=expt.beam,
        gonio=expt.goniometer,
        crystal=expt.crystal,
        sigma_m=sigma_m,
    )
    n_valid = int(result.valid.sum())
    print(
        f"Summation integration complete: {n_valid} valid reflections out of {n}"
    )
    if result.n_background_failures:
        print(
            f"Background estimate rejected for {result.n_background_failures} "
            f"of {n} reflections with foreground pixels"
        )
    if n_valid:
        ints = result.intensity[result.valid]
        sig = np.sqrt(np.maximum(result.variance[result.valid], 0))
        print(
            f"Intensity statistics: min={ints.min():.1f}, max={ints.max():.1f}, "
            f"mean={ints.mean():.1f}"
        )
        pos = sig > 0
        if pos.any():
            print(f"Mean I/sigma(I)={np.mean(ints[pos] / sig[pos]):.2f}")

    out = ReflectionTable()
    out.experiment_ids = list(table.experiment_ids)
    out.identifiers = list(table.identifiers)
    out["intensity.sum.value"] = result.intensity
    out["intensity.sum.variance"] = np.where(result.variance < 0, 0.0, result.variance)
    out["partiality"] = result.partiality
    out["miller_index"] = hkl.astype(np.int32)
    out["lp"] = result.lp
    out["d"] = result.d
    out["xyzcal.mm"] = xyzcal_mm
    out["xyzobs.px.value"] = result.xyzobs_px
    out["s1"] = s1
    out["id"] = np.asarray(ids, np.int64)
    out["num_pixels.background"] = acc.bg_count
    out["num_pixels.foreground"] = acc.fg_count
    out["background.sum.value"] = result.background_sum
    out["background.mean"] = result.background_mean
    out["flags"] = np.where(
        result.valid, np.uint64(INTEGRATED_SUM), np.uint64(0)
    ).astype(np.uint64)
    out.write(args.output)
    print(f"Saved integrated reflections to {args.output}")
    mark("finalize+write")
    if args.profile:
        total = sum(stage_t.values())
        print("Stage breakdown:")
        for stage, dt in stage_t.items():
            print(f"    {stage:>14s}: {dt * 1000:8.1f} ms")
        print(f"    {'total':>14s}: {total * 1000:8.1f} ms")
    return 0


def main() -> None:
    sys.exit(run())


if __name__ == "__main__":
    sys.exit(run())
