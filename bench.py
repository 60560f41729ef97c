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
    ok = True
    if not SMOKE:
        img2 = sample_data.generate_sample_image(2)
        img5 = sample_data.generate_sample_image(5)
        VKF = 16384  # validation per-frame capacity (img2 holds 9506)
        val_step = jax.jit(
            lambda b: tuple(
                v
                for p, t, keep, hp, counts in [
                    make_full_step(VKF, 16384, mb=mbox)(b)
                ]
                for v in (
                    p.linear_index, p.intensity, counts, t.n_spots,
                    jnp.sum(keep.astype(jnp.int32)), hp,
                )
            )
        )
        lin_v, int_v, counts_v, n_spots, n_keep, hp_v = jax.device_get(
            val_step(jnp.stack([jnp.asarray(img2), jnp.asarray(img5)]))
        )
        hp_v = int(hp_v)
        per_frame = [int(counts_v[0]), int(counts_v[1])]
        ok = per_frame == [9506, 2388] and int(n_spots) == 9506 + 2311
        if not ok:
            _fail_validation(
                f"VALIDATION MISMATCH: px={per_frame} spots={int(n_spots)}"
            )

        # host-CC cross-check (the production CLI backend) on the same
        # pixels (frame 0 occupies the first per-frame slot segment)
        lin0 = lin_v[: per_frame[0]]
        host_table = cc2d(lin0 % ((hp_v + 1) * W), int_v[: per_frame[0]], W)
        if host_table.n_spots != 9506:
            _fail_validation(f"HOST-CC MISMATCH: {host_table.n_spots}")
            ok = False
        _note(f"anchors validated ok={ok}")

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
    # check BOTH loop parities (the chained loop runs batch and batch+1)
    counts_k = jnp.maximum(step(batch)[4], step(batch + jnp.uint16(1))[4])
    if int(jnp.max(counts_k)) > KF:
        _fail_validation(
            f"bench frames exceed per-frame capacity: {int(jnp.max(counts_k))} > {KF}"
        )
        ok = False

    eiger_line = None

    @jax.jit
    def chained(b):
        def body(i, acc):
            return acc + consume(b + (i & 1).astype(b.dtype))

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    jax.block_until_ready(chained(batch))
    t0 = time.perf_counter()
    jax.block_until_ready(chained(batch))
    eiger_fps = BATCH * REPS / (time.perf_counter() - t0)
    eiger_line = (
        "eiger16m_spotfind_fps" + ("" if ok else "_VALIDATION_FAILED"),
        round(eiger_fps, 2),
        "frames/s/chip",
        round(eiger_fps / 500.0, 4),
    )
    _emit(*eiger_line)

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
        jcounts = jnp.maximum(jstep(jbatch)[4], jstep(jbatch + jnp.uint16(1))[4])
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

        jax.block_until_ready(jchained(jbatch))
        t0 = time.perf_counter()
        jax.block_until_ready(jchained(jbatch))
        jf_fps = JB * REPS / (time.perf_counter() - t0)
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
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
