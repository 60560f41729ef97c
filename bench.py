"""Benchmark: Eiger 16M + Jungfrau 1M spotfinding throughput on one TPU chip.

Pipeline under test (all on device): MXU bit-packed dispersion threshold
(ops/dispersion_pallas.dispersion_packed_raw -> combined [pc | w32] rows) ->
segmented batch word compaction (ops/compact.compact_from_pcw_segmented;
ONE set of sparse ops for the whole frame batch, per-frame slot segments
so each intensity-gather round touches only its own frames' indices) ->
sparse 2D connected components -> multi-frame spot table + filters.
Strong-pixel and spot counts are validated against the deterministic
sample-data anchors, then throughput is measured with chained
loop-dependent reps and every output consumed.

Prints one JSON line per metric, each IMMEDIATELY after it is measured
(r3's driver capture timed out output-less because every metric printed
at the end, after a possibly 50-minute integrator child on a cold compile
cache — BENCH_r03.json rc=124).  The FINAL line re-emits the headline
Eiger 16M metric so the driver's last-line parse still lands on it.
Baseline: the reference's real-time goals of 500 Hz Eiger 16M and
2500 Hz Jungfrau 1M on one GPU — reference: README.md:131-133, BASELINE.md.

Budget robustness:
  * FFS_BENCH_BUDGET_S (default 2400 s) is a global wall-clock budget.
    Each stage is guarded: if the remaining budget cannot plausibly cover
    it (cold axon compiles take 25+ min per program), the stage is skipped
    with a stderr note instead of starving later metrics.
  * SIGTERM/SIGALRM handlers flush stdout and exit with rc=0 if at least
    one metric has been printed — `timeout` sends SIGTERM first, so even
    an external kill preserves whatever was measured.
  * The backend-outage wait is capped against the same budget.
  * FFS_BENCH_SMOKE=1 shrinks the detectors to toy shapes, skips the
    anchors, and tags every metric {"smoke": true} — a CPU-runnable test
    of this file's control flow, never a performance claim.

Measurement notes (hard-won; full history in CLAUDE.md):
  * REPS batch-steps chain inside ONE jit with a loop-counter-dependent
    input — XLA hoists loop-invariant bodies and lies by ~REPS x otherwise.
  * Every claimed output is consumed, or XLA DCEs the gather stages.
  * Gathers into fresh tables are fast only while the table is
    VMEM-stageable; the intensity fetch therefore runs per frame.
  * The dev tunnel costs ~45 ms per dispatch and ~40 MB/s d2h, so the
    production host-CC split measures slower here than the all-device
    path despite winning on local hardware; the bench runs all-device.
"""

import json
import os
import signal
import subprocess
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/ffs_tpu_xla")
)

import numpy as np

_T0 = time.monotonic()
BUDGET_S = float(os.environ.get("FFS_BENCH_BUDGET_S", "2400"))
SMOKE = os.environ.get("FFS_BENCH_SMOKE", "") not in ("", "0")

_N_PRINTED = 0
_VALIDATION_FAILED = False


def _remaining() -> float:
    return BUDGET_S - (time.monotonic() - _T0)


def _emit(metric: str, value: float, unit: str, vs_baseline) -> None:
    """Print a metric line NOW and remember it for the final headline re-emit."""
    global _N_PRINTED
    d = {
        "metric": metric,
        "value": value,
        "unit": unit,
        "vs_baseline": vs_baseline,
    }
    if SMOKE:
        d["smoke"] = True
    print(json.dumps(d), flush=True)
    _N_PRINTED += 1


def _note(msg: str) -> None:
    print(f"bench[{time.monotonic() - _T0:.0f}s]: {msg}", file=sys.stderr, flush=True)


def _fail_validation(msg: str) -> None:
    """Record a validation failure where the SIGTERM/SIGALRM handler can
    see it (a budget-killed run that measured garbage must exit nonzero)."""
    global _VALIDATION_FAILED
    _VALIDATION_FAILED = True
    _note(msg)


def _flush_and_exit(signum, frame):
    # timeout(1) sends SIGTERM before SIGKILL; our own SIGALRM fires at the
    # budget.  Whatever was measured is already on stdout (incremental
    # emission) — flush, report, and exit 0 if anything useful got out.
    _note(f"terminated by signal {signum}; {_N_PRINTED} metric(s) already emitted")
    sys.stdout.flush()
    sys.stderr.flush()
    # A budget-killed run that already FAILED validation must not exit 0:
    # mirror the normal path's `0 if ok else 1` (ADVICE r4).
    os._exit(0 if (_N_PRINTED and not _VALIDATION_FAILED) else 1)


def _wait_for_backend(budget_s: float) -> None:
    """Wait out TPU-tunnel outages before the main process touches JAX.

    The axon service has full outages where backend init raises UNAVAILABLE
    and in-flight programs hang blocked for 25+ minutes — so probe
    ``jax.devices()`` in a cheap killable subprocess and retry until the
    service returns (bounded by its share of the global budget).  A
    CPU-only run (no tunnel configured) passes the probe immediately.
    """
    deadline = time.monotonic() + budget_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=120,
            )
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() > deadline:
            _note(f"backend probe still failing after {attempt} attempts; proceeding anyway")
            return
        _note(f"backend probe attempt {attempt} failed; retrying in 60 s")
        time.sleep(60)


def _make_frames(rng, h, w, n, mask, n_spots=300, amp=60.0):
    """Beamline-like frames: Poisson background + ~n_spots 3x3 spots."""
    base = rng.poisson(2.0, size=(h, w)).astype(np.uint16)
    frames = []
    for _ in range(n):
        f = base.copy()
        ys = rng.integers(8, h - 8, n_spots)
        xs = rng.integers(8, w - 8, n_spots)
        for yy, xx in zip(ys, xs):
            f[yy - 1 : yy + 2, xx - 1 : xx + 2] += rng.poisson(
                amp, size=(3, 3)
            ).astype(np.uint16)
        f[mask == 0] = 0
        frames.append(f)
    return np.stack(frames)


def _load_anchor_golden():
    """f64 host-oracle golden for the two sample anchor frames
    (tests/data/bench_anchor_golden.npz; regenerate with
    tools/make_anchor_golden.py — deterministic)."""
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tests", "data", "bench_anchor_golden.npz",
    )
    return np.load(path)


def _check_anchor_bitparity(
    golden, tag, w, pitch, frame, lin, inten, table, fp32_rtol=1e-5
):
    """Compare one frame's device pixel list + spot-table columns against
    the f64 host-oracle golden.  Returns a list of mismatch strings
    (empty = bit-parity).

    Integer data (pixel coordinates, intensities, pixel counts, bboxes,
    peaks, integer-valued sums) must match EXACTLY — the v5e silent-MXU
    precedent dropped single bits while counts stayed right, which is
    exactly what a count-only anchor misses.  The two centre-of-mass
    columns are f32 divisions of exact integer sums, so they get a tight
    relative band instead of bit equality against the f64 oracle.
    """
    errs = []
    g_y, g_x = golden[f"{tag}_y"], golden[f"{tag}_x"]
    # tall linear indices use the (h+1)-row gap pitch between frames
    # (ops/compact.compact_from_pcw_segmented contract)
    y = lin // w - frame * pitch
    x = lin % w
    if len(lin) != len(g_y):
        errs.append(f"{tag}: pixel count {len(lin)} != {len(g_y)}")
        return errs
    if not (np.array_equal(y, g_y) and np.array_equal(x, g_x)):
        errs.append(f"{tag}: strong-pixel coordinate list differs")
    if not np.array_equal(
        inten.astype(np.int64), golden[f"{tag}_intensity"].astype(np.int64)
    ):
        errs.append(f"{tag}: strong-pixel intensities differ")

    # device table rows for this frame (flat-batch z = frame index)
    sel = (np.asarray(table.valid)) & (np.asarray(table.z_min) == frame)
    n_g = len(golden[f"{tag}_n_pixels"])
    if int(sel.sum()) != n_g:
        errs.append(f"{tag}: spot count {int(sel.sum())} != {n_g}")
        return errs
    exact_cols = (
        ("n_pixels", "n_pixels"), ("x_min", "x_min"), ("x_max", "x_max"),
        ("y_min", "y_min"), ("y_max", "y_max"),
        ("peak_x", "peak_x"), ("peak_y", "peak_y"),
    )
    for dev_name, g_name in exact_cols:
        d = np.asarray(getattr(table, dev_name))[sel].astype(np.int64)
        g = golden[f"{tag}_{g_name}"].astype(np.int64)
        if not np.array_equal(d, g):
            errs.append(f"{tag}: column {dev_name} differs")
    # integer-valued f32 sum: exact (sums here are far below 2^24)
    d = np.asarray(table.sum_intensity)[sel].astype(np.float64)
    g = golden[f"{tag}_sum_intensity"].astype(np.float64)
    if not np.array_equal(d, g):
        errs.append(f"{tag}: column sum_intensity differs")
    for col in ("com_x", "com_y"):
        d = np.asarray(getattr(table, col))[sel].astype(np.float64)
        g = golden[f"{tag}_{col}"].astype(np.float64)
        if not np.allclose(d, g, rtol=fp32_rtol, atol=1e-4):
            errs.append(f"{tag}: column {col} outside f32 band")
    d = np.asarray(table.com_z)[sel]
    if not np.allclose(d, frame + 0.5, rtol=0, atol=1e-6):
        errs.append(f"{tag}: column com_z != frame+0.5")
    return errs


def main() -> int:
    signal.signal(signal.SIGTERM, _flush_and_exit)
    signal.signal(signal.SIGALRM, _flush_and_exit)
    # Last-resort alarm slightly past the budget: stage guards degrade
    # gracefully first; the alarm only fires if a compile/execute HANGS
    # (tunnel outage) past the stage guard that admitted it.
    signal.alarm(int(BUDGET_S) + 60)

    _wait_for_backend(min(900.0, 0.3 * BUDGET_S))

    import jax
    import jax.numpy as jnp

    from ffs_tpu.constants import E2XE_16M_FAST, E2XE_16M_SLOW
    from ffs_tpu.io import sample_data
    from ffs_tpu.ops import connected_components as cc
    from ffs_tpu.ops.cc2d_host import cc2d
    from ffs_tpu.ops.compact import compact_from_pcw_segmented
    from ffs_tpu.ops.dispersion_extended_pallas import (
        dispersion_extended_packed_raw,
        mask_box_count_extended,
    )
    from ffs_tpu.ops.dispersion_pallas import dispersion_packed_raw, mask_box_count

    on_tpu = jax.default_backend() == "tpu"
    interp = not on_tpu  # CPU smoke-run uses Mosaic interpret mode

    if SMOKE:
        H, W = 256, 256
        BATCH = int(os.environ.get("FFS_BENCH_BATCH", "2"))
        REPS = int(os.environ.get("FFS_BENCH_REPS", "2"))
        K = int(os.environ.get("FFS_BENCH_MAX_PX", "2048"))
        S = int(os.environ.get("FFS_BENCH_MAX_SPOTS", "1024"))
        mask_np = np.ones((H, W), dtype=np.uint8)
    else:
        H, W = E2XE_16M_SLOW, E2XE_16M_FAST
        BATCH = int(os.environ.get("FFS_BENCH_BATCH", "8"))
        # REPS amortises the ~45 ms dev-tunnel dispatch (a tunnel artifact
        # real deployments never pay): at 16 it still pollutes the measure
        # by ~7%.  Every rep does the full pipeline on a loop-dependent
        # input regardless.
        REPS = int(os.environ.get("FFS_BENCH_REPS", "128"))
        K = int(os.environ.get("FFS_BENCH_MAX_PX", "24576"))
        S = int(os.environ.get("FFS_BENCH_MAX_SPOTS", "12288"))
        mask_np = sample_data.generate_mask()
    mask = jnp.asarray(mask_np)
    mbox = jax.block_until_ready(mask_box_count(mask)) if on_tpu else None

    def make_full_step(
        per_frame_px, max_spots, extended=False, msk=None, mb=None
    ):
        """SEGMENTED compaction throughout (per-frame slot capacity):
        each intensity-gather round statically slices only its own
        frames' indices — measured 14.3 -> 13.4 ms/batch on the Eiger
        pipeline (tools/measure_segmented.py) and 33.5 -> 31.2 on
        Jungfrau at honest per-frame capacity Kf=640 (small frames still
        pool 15 per gather table; tools/measure_segmented_jf.py)."""
        msk = mask if msk is None else msk

        jf_strip = int(os.environ.get("FFS_BENCH_JF_STRIP", "128"))

        def step(batch):
            if extended:
                pcw = dispersion_extended_packed_raw(
                    batch, msk, 65535.0, mbox=mb, strip=jf_strip,
                    interpret=interp, trim=False,
                )
            else:
                pcw = dispersion_packed_raw(
                    batch, msk, 65535.0, mbox=mb, trim=False,
                    strip=int(os.environ.get("FFS_BENCH_STRIP", "128")),
                    interpret=interp,
                )
            hp = pcw.shape[1]
            w = batch.shape[-1]
            p, nbu, nbd, counts = compact_from_pcw_segmented(
                batch, pcw, max_pixels_per_frame=per_frame_px,
                with_neighbors=True,
            )
            root = cc.label_compact_pixels(p, width=w, neighbors=(nbu, nbd))
            # peak_key_slots folds the peak tie-break into the bbox
            # segment_max (bit-identical for u16 data; measured -0.31
            # ms/batch Eiger, -0.99 JF — tools/measure_cc_variants.py)
            t = cc.spot_table_from_pixels(
                p, root, width=w, max_spots=max_spots,
                dtype=jnp.float32, frame_rows=hp,
                peak_key_slots=per_frame_px,
            )
            keep, _, _ = cc.filter_spots(t, 3, 2.0)
            return p, t, keep, hp, counts

        return step

    # --- correctness anchors (deterministic sample frames) -------------------
    # Upgraded r5: full BIT-PARITY of the real-chip pixel list and every
    # spot-table column against the f64 host oracle golden
    # (tools/make_anchor_golden.py) — the reference pixel-compares every
    # image under --validate (spotfinder.cc:1011-1053), and count-only
    # anchors are exactly what the observed v5e MXU bit-drop passed.
    # FFS_BENCH_FAULT=1 plants a one-bit fault to prove the compare fails.
    ok = True
    if not SMOKE:
        golden = _load_anchor_golden()
        img2 = sample_data.generate_sample_image(2)
        img5 = sample_data.generate_sample_image(5)
        if os.environ.get("FFS_BENCH_FAULT", "") not in ("", "0"):
            img2 = img2.copy()
            img2[100, 200] ^= 1
            _note("FFS_BENCH_FAULT: planted a one-bit fault in img2")
        VKF = 16384  # validation per-frame capacity (img2 holds 9506)
        val_step = jax.jit(
            lambda b: tuple(
                v
                for p, t, keep, hp, counts in [
                    make_full_step(VKF, 16384, mb=mbox)(b)
                ]
                for v in (
                    p.linear_index, p.intensity, counts, t,
                    jnp.sum(keep.astype(jnp.int32)), hp,
                )
            )
        )
        lin_v, int_v, counts_v, table_v, n_keep, hp_v = jax.device_get(
            val_step(jnp.stack([jnp.asarray(img2), jnp.asarray(img5)]))
        )
        hp_v = int(hp_v)
        per_frame = [int(counts_v[0]), int(counts_v[1])]
        errs = []
        for frame, (tag, npx) in enumerate(
            (("img2", per_frame[0]), ("img5", per_frame[1]))
        ):
            seg0 = frame * VKF
            errs += _check_anchor_bitparity(
                golden, tag, W, hp_v + 1, frame,
                lin_v[seg0 : seg0 + npx], int_v[seg0 : seg0 + npx],
                table_v,
            )
        if errs:
            ok = False
            _fail_validation("ANCHOR BIT-PARITY FAILED: " + "; ".join(errs))

        # host-CC cross-check (the production CLI backend) on the same
        # pixels (frame 0 occupies the first per-frame slot segment)
        lin0 = lin_v[: per_frame[0]]
        host_table = cc2d(lin0 % ((hp_v + 1) * W), int_v[: per_frame[0]], W)
        if host_table.n_spots != 9506:
            _fail_validation(f"HOST-CC MISMATCH: {host_table.n_spots}")
            ok = False
        _note(
            "anchors validated (table bit-parity) ok=%s" % ok
            if ok
            else f"anchors FAILED: {errs}"
        )

    # --- Eiger 16M throughput -------------------------------------------------
    rng = np.random.default_rng(12)
    batch = jax.device_put(
        jnp.asarray(
            _make_frames(rng, H, W, BATCH, mask_np, n_spots=20 if SMOKE else 300)
        )
    )
    KF = K // BATCH  # per-frame capacity (segmented compaction)
    step = make_full_step(KF, S, mb=mbox)

    def consume_all(p, t, keep, counts):
        """Sum EVERY SpotTable column + the filter mask + capacities:
        production writes every column to the reflection table, so an
        honest fps claim must not let XLA DCE any of them (the heavy
        segment ops are shared, but the per-column extractions are not)."""
        acc = (
            p.count + jnp.max(counts) + t.n_spots
            + jnp.sum(keep.astype(jnp.int32))
        ).astype(jnp.float32)
        for col in t[1:]:  # every (S,) column incl. valid/bbox/peaks
            acc = acc + jnp.sum(col.astype(jnp.float32))
        return acc

    def consume(b):
        p, t, keep, hp, counts = step(b)
        return consume_all(p, t, keep, counts)

    # capacity check on the realistic frames (per frame: segmented slots)
    # covering every value the warmup AND timed runs see (b+0..b+3: the
    # timed input is value-perturbed, and the chained loop adds i&1)
    counts_k = jnp.maximum(
        jnp.maximum(step(batch)[4], step(batch + jnp.uint16(2))[4]),
        jnp.maximum(
            jnp.maximum(
                step(batch + jnp.uint16(3))[4],
                step(batch + jnp.uint16(4))[4],
            ),
            step(batch + jnp.uint16(5))[4],
        ),
    )
    if int(jnp.max(counts_k)) > KF:
        _fail_validation(
            f"bench frames exceed per-frame capacity: {int(jnp.max(counts_k))} > {KF}"
        )
        ok = False

    def _timed_fps(chained_fn, warm_in, timed_in, n_frames):
        """r5 fencing protocol (v3): the tunnel acks block_until_ready at
        ENQUEUE, memoizes identical (program, input-value) executions,
        and defers a ~1 s executable-load cost to the first REAL
        execution — so (a) fence with a scalar d2h (float()), (b) warm
        with an input that is itself fresh (a memoized warm absorbs
        nothing), and (c) time a further-perturbed input."""
        float(chained_fn(warm_in))
        t0 = time.perf_counter()
        float(chained_fn(timed_in))
        return n_frames / (time.perf_counter() - t0)

    eiger_line = None

    @jax.jit
    def chained(b):
        def body(i, acc):
            return acc + consume(b + (i & 1).astype(b.dtype))

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    eiger_fps = _timed_fps(
        chained, batch + jnp.uint16(2), batch + jnp.uint16(3), BATCH * REPS
    )
    eiger_line = (
        "eiger16m_spotfind_fps" + ("" if ok else "_VALIDATION_FAILED"),
        round(eiger_fps, 2),
        "frames/s/chip",
        round(eiger_fps / 500.0, 4),
    )
    _emit(*eiger_line)

    # --- Eiger 16M ingest-inclusive throughput ---------------------------------
    # Decode enters the SAME chained device program: bitshuffle planes
    # (the host stops at LZ4) -> device untranspose -> Pallas frame
    # assembly -> the full spotfind pipeline, every output consumed.
    # This is the ingest-in-the-loop number the reference's 500 Hz is
    # measured with (spotfinder.cc:823-855 decodes per reader thread).
    if _remaining() < 300.0:
        _note(f"skipping ingest metric: {_remaining():.0f}s budget left")
    else:
        try:
            from ffs_tpu.io import compression
            from ffs_tpu.ops.bitshuffle_device import (
                untranspose_planes_to_wide,
            )
            from ffs_tpu.ops.frame_assemble import (
                frames_from_flat_wide,
                padded_width,
            )

            WP = padded_width(W)
            imask_np = np.zeros((H, WP), np.uint8)
            imask_np[:, :W] = mask_np
            imask = jnp.asarray(imask_np)
            imbox = mask_box_count(imask) if on_tpu else None

            def to_planes(frames_arr):
                pls = []
                for fb in frames_arr:
                    chunk = compression.bshuf_lz4_compress(
                        fb.reshape(-1), 2
                    )
                    planes, tail, _, n_shuf = compression.bshuf_lz4_planes(
                        chunk, fb.size, 2
                    )
                    assert n_shuf == fb.size and not len(tail)
                    pls.append(planes)
                pl = np.stack(pls)
                return jax.device_put(
                    jnp.asarray(
                        pl.reshape(len(pls), pl.shape[1], -1).view(np.uint32)
                    )
                )

            def idecode(pl):
                nb = pl.shape[0]
                el = untranspose_planes_to_wide(
                    pl.reshape(-1, pl.shape[-1]), 2
                )
                return frames_from_flat_wide(
                    el.reshape(nb, -1), H, W, interpret=interp
                )

            istep = make_full_step(KF, S, msk=imask, mb=imbox)
            iok = ok

            if not SMOKE:
                # ingest anchors: the sample frames routed through the
                # decode path must reproduce the SAME oracle bit-parity
                # (frame width padded to WP; x/y coordinates unchanged)
                ival_step = jax.jit(
                    lambda pl: tuple(
                        v
                        for p, t, keep, hp, counts in [
                            make_full_step(
                                16384, 16384, msk=imask, mb=imbox
                            )(idecode(pl))
                        ]
                        for v in (p.linear_index, p.intensity, counts, t, hp)
                    )
                )
                ilin, iint, icounts_v, itable, ihp = jax.device_get(
                    ival_step(to_planes(np.stack([img2, img5])))
                )
                ihp = int(ihp)
                iper = [int(icounts_v[0]), int(icounts_v[1])]
                ierrs = []
                for frame, (tag, npx) in enumerate(
                    (("img2", iper[0]), ("img5", iper[1]))
                ):
                    seg0 = frame * 16384
                    ierrs += _check_anchor_bitparity(
                        golden, tag, WP, ihp + 1, frame,
                        ilin[seg0 : seg0 + npx], iint[seg0 : seg0 + npx],
                        itable,
                    )
                if ierrs:
                    iok = False
                    _fail_validation(
                        "INGEST ANCHOR BIT-PARITY FAILED: " + "; ".join(ierrs)
                    )
                else:
                    _note("ingest anchors validated (table bit-parity)")

            iplanes = to_planes(np.asarray(jax.device_get(batch)))
            # loop perturbation restricted to the LOWEST bit plane
            # (s=0, kk=0: the first 512 bytes = first 128 u32 words of
            # each block): an unrestricted word XOR flips high bit
            # planes too (+-32768 per pixel) and the frames stop being
            # beamline-like (caught by the smoke run's capacity check)
            wpb = iplanes.shape[-1]
            ppat = np.zeros((1, 1, wpb), np.uint32)
            ppat[..., : min(128, wpb)] = 1
            ppat_dev = jnp.asarray(ppat)

            def iconsume(pl):
                p, t, keep, hp, counts = istep(idecode(pl))
                return consume_all(p, t, keep, counts)

            # capacity over every value warmup+timed runs see
            ic = None
            for d in range(4):
                c = istep(idecode(iplanes ^ ppat_dev * jnp.uint32(d)))[4]
                ic = c if ic is None else jnp.maximum(ic, c)
            if int(jnp.max(ic)) > KF:
                _fail_validation(
                    f"ingest frames exceed per-frame capacity: "
                    f"{int(jnp.max(ic))} > {KF}"
                )
                iok = False

            @jax.jit
            def ichained(pl):
                def body(i, acc):
                    return acc + iconsume(
                        pl ^ ppat_dev * (i & 1).astype(jnp.uint32)
                    )

                return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

            ingest_fps = _timed_fps(
                ichained, iplanes ^ ppat_dev * jnp.uint32(2),
                iplanes ^ ppat_dev * jnp.uint32(3),
                BATCH * REPS,
            )
            _emit(
                "eiger16m_ingest_spotfind_fps"
                + ("" if iok else "_VALIDATION_FAILED"),
                round(ingest_fps, 2),
                "frames/s/chip (bitshuffle-plane input; device decode in-loop)",
                round(ingest_fps / 500.0, 4),
            )
        except Exception as e:  # best-effort: never starve later metrics
            _note(f"ingest metric skipped: {type(e).__name__}: {e}")

    # --- Jungfrau 1M throughput (extended algorithm) ---------------------------
    if _remaining() < 120.0:
        _note(f"skipping Jungfrau metric: {_remaining():.0f}s budget left")
    else:
        JH, JW = (256, 256) if SMOKE else (1066, 1030)
        JB = int(os.environ.get("FFS_BENCH_JF_BATCH", "2" if SMOKE else "112"))
        jmask_np = np.ones((JH, JW), dtype=np.uint8)
        jmask_np[JH // 2 : JH // 2 + 42, :] = 0  # module gap band
        jmask = jnp.asarray(jmask_np)
        jbatch = jax.device_put(
            jnp.asarray(_make_frames(rng, JH, JW, JB, jmask_np, n_spots=60))
        )
        jmbox = (
            jax.block_until_ready(
                mask_box_count_extended(
                    jmask, strip=int(os.environ.get("FFS_BENCH_JF_STRIP", "128"))
                )
            )
            if on_tpu
            else None
        )
        # Honest capacity: every frame of the 112-frame batch carries up to
        # ~560 strong pixels; the segmented per-frame capacity must HOLD the
        # max frame (not truncate it), with margin for the loop-varied
        # inputs — checked loudly below against the exact per-frame counts.
        JKF = int(os.environ.get("FFS_BENCH_JF_MAX_PX_PER_FRAME", "640"))
        jok = ok
        jstep = make_full_step(
            JKF,
            int(os.environ.get("FFS_BENCH_JF_MAX_SPOTS", "8192")),
            extended=True, msk=jmask, mb=jmbox,
        )
        jcounts = jnp.maximum(
            jnp.maximum(jstep(jbatch)[4], jstep(jbatch + jnp.uint16(2))[4]),
            jnp.maximum(
                jnp.maximum(
                    jstep(jbatch + jnp.uint16(3))[4],
                    jstep(jbatch + jnp.uint16(4))[4],
                ),
                jstep(jbatch + jnp.uint16(5))[4],
            ),
        )
        if int(jnp.max(jcounts)) > JKF:
            _fail_validation(
                f"JF bench frames exceed per-frame capacity: {int(jnp.max(jcounts))} > {JKF}"
            )
            jok = False
            ok = False

        def jconsume(b):
            p, t, keep, hp, counts = jstep(b)
            return consume_all(p, t, keep, counts)

        @jax.jit
        def jchained(b):
            def body(i, acc):
                return acc + jconsume(b + (i & 1).astype(b.dtype))

            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

        jf_fps = _timed_fps(
            jchained, jbatch + jnp.uint16(2), jbatch + jnp.uint16(3),
            JB * REPS,
        )
        _emit(
            "jungfrau1m_extended_spotfind_fps"
            + ("" if jok else "_VALIDATION_FAILED"),
            round(jf_fps, 2),
            "frames/s/chip",
            round(jf_fps / 2500.0, 4),
        )

    # --- integrator metric (subprocess: needs x64 on, Mosaic needs it off) ---
    # Generous timeout when the budget allows: on a cold XLA cache the
    # tunnel compile service can take 20+ minutes for the chained
    # integrator program — but never let the child starve the final
    # headline re-emit (it runs AFTER the spotfind metrics now, and its
    # timeout is clamped to the remaining budget).
    child_timeout = min(3000.0, _remaining() - 30.0)
    if child_timeout < 60.0:
        _note(f"skipping integrator metric: {_remaining():.0f}s budget left")
    else:
        try:
            env = dict(os.environ)
            if SMOKE:
                env.setdefault("FFS_BENCH_INT_REFL", "64")
                env.setdefault("FFS_BENCH_INT_REPS", "2")
                env.setdefault("FFS_BENCH_INT_EFF_SCALE", "0.01")
            r = subprocess.run(
                [
                    sys.executable,
                    os.path.join(
                        os.path.dirname(os.path.abspath(__file__)),
                        "tools", "bench_integrator.py",
                    ),
                ],
                capture_output=True, timeout=child_timeout, text=True, env=env,
            )
            emitted = False
            for line in r.stdout.splitlines():
                if line.startswith("{"):
                    d = json.loads(line)
                    _emit(d["metric"], d["value"], d["unit"], d["vs_baseline"])
                    emitted = True
            if not emitted:
                _note(
                    f"integrator bench produced no metric (rc={r.returncode}): "
                    f"{r.stderr[-400:]}"
                )
        except Exception as e:  # integrator metric is best-effort
            _note(f"integrator bench skipped: {e}")

    # --- SSX indexing metric (subprocess; cheap: two small jit programs) ---
    ssx_timeout = min(900.0, _remaining() - 30.0)
    if ssx_timeout < 60.0:
        _note(f"skipping SSX metric: {_remaining():.0f}s budget left")
    else:
        try:
            env = dict(os.environ)
            if SMOKE:
                env.setdefault("FFS_BENCH_SSX_IMAGES", "4")
                env.setdefault("FFS_BENCH_SSX_BATCH", "4")
                env.setdefault("FFS_BENCH_SSX_REPS", "1")
            r = subprocess.run(
                [
                    sys.executable,
                    os.path.join(
                        os.path.dirname(os.path.abspath(__file__)),
                        "tools", "bench_ssx.py",
                    ),
                ],
                capture_output=True, timeout=ssx_timeout, text=True, env=env,
            )
            emitted = False
            for line in r.stdout.splitlines():
                if line.startswith("{"):
                    d = json.loads(line)
                    _emit(d["metric"], d["value"], d["unit"], d["vs_baseline"])
                    emitted = True
            if not emitted:
                _note(
                    f"SSX bench produced no metric (rc={r.returncode}): "
                    f"{r.stderr[-400:]}"
                )
        except Exception as e:  # best-effort
            _note(f"SSX bench skipped: {e}")

    # Final line = headline Eiger metric (repeated deliberately: metrics
    # stream out as measured for timeout robustness, and the driver's
    # last-line parse should still land on the headline number).
    if eiger_line is not None:
        _emit(*eiger_line)

    signal.alarm(0)
    return 0 if (ok and not _VALIDATION_FAILED) else 1


if __name__ == "__main__":
    sys.exit(main())
