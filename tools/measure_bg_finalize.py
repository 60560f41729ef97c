"""Collection-scale cost of the NON-classification integrator stages.

The kabsch_integrate_refl_per_s metric times the blocked classification /
accumulation step; the 928k-slices/s bar (BASELINE.md) is about keeping
pace with a WHOLE collection.  This harness measures everything else the
integrator does for a reference-scale rotation collection (3600 frames at
500 fps = 7.2 s acquisition, 464 predictions/image, ~1.67M reflections,
~6.7M reflection-image slices):

  * prediction  — scan-static rotation prediction (device), measured on an
    image-span slice and scaled linearly (per-image block structure);
  * bboxes      — Kabsch bounding-box extents (host, vectorised);
  * background  — the (N, 256) histogram IRLS reduction, device program
    (pipeline --bg-device path) AND the host numpy path, chained
    loop-dependent reps with all outputs consumed;
  * finalize    — intensities/variances/partiality/LP on the full 1.67M
    rows (host numpy).

Prints per-stage seconds for the whole collection and the EFFECTIVE
slices/s once these stages are added to the measured block-step rate
(pass the block rate via FFS_BLOCK_RATE, default the r4 bench reading).

Run standalone (TPU): python tools/measure_bg_finalize.py
NEVER concurrently with any other compute job (CLAUDE.md measurement
rules — host CPU contention corrupts the host stages).
"""

import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/ffs_tpu_xla")
)

import numpy as np

sys.path.insert(0, ".")

# the reference-scale collection (BASELINE.md derivation)
N_IMAGES = 3600
PRED_PER_IMAGE = 464
N_REFL = N_IMAGES * PRED_PER_IMAGE  # 1,670,400
Z_EXTENT = 4
N_SLICES = N_REFL * Z_EXTENT  # ~6.7M
ACQ_S = N_IMAGES / 500.0  # 7.2 s


def main() -> int:
    import jax
    import jax.numpy as jnp

    from ffs_tpu.integration import background as bg_mod
    from ffs_tpu.integration import extent, finalize as fin_mod
    from ffs_tpu.integration.background_jax import estimate_background_device
    from ffs_tpu.integration.kabsch import NUM_BG_BINS, Accumulators
    from ffs_tpu.models.crystal import Crystal
    from ffs_tpu.models.experiment import Experiment
    from ffs_tpu.models.geometry import (
        Goniometer,
        MonochromaticBeam,
        Scan,
        simple_panel,
    )
    from ffs_tpu.prediction.rotation import predict_rotation

    jax.config.update("jax_enable_x64", True)
    rng = np.random.default_rng(17)
    out = {}

    # --- prediction (device): a PRED_SPAN-image slice, scaled linearly ----
    PRED_SPAN = int(os.environ.get("FFS_BG_PRED_SPAN", "100"))
    W, H = 2068, 2164
    panel = simple_panel(200.0, (W / 2, H / 2), (0.075, 0.075), (W, H))
    beam = MonochromaticBeam(wavelength=0.976)
    gonio = Goniometer()
    # thaumatin-like tetragonal cell (the 464/image golden scale)
    cell = np.diag([57.78, 57.78, 150.0])
    expt = Experiment(
        beam=beam, panel=panel, goniometer=gonio,
        scan=Scan(image_range=(1, PRED_SPAN), oscillation=(0.0, 0.1)),
        crystal=Crystal(cell[0], cell[1], cell[2]),
    )
    pred = predict_rotation(expt, use_device=True)  # warm compile
    t0 = time.perf_counter()
    pred = predict_rotation(expt, use_device=True)
    t_pred_span = time.perf_counter() - t0
    per_image = len(pred.hkl) / PRED_SPAN
    out["predict_s_collection"] = t_pred_span * (N_IMAGES / PRED_SPAN)
    print(
        f"prediction: {len(pred.hkl)} refl over {PRED_SPAN} images "
        f"({per_image:.0f}/image) in {t_pred_span:.2f} s -> "
        f"{out['predict_s_collection']:.2f} s / collection", file=sys.stderr,
    )

    # --- bounding boxes (host, vectorised) on the predicted slice ---------
    t0 = time.perf_counter()
    bboxes = extent.compute_kabsch_bounding_boxes(
        np.asarray(beam.s0), gonio.rotation_axis,
        np.asarray(pred.s1), np.asarray(pred.xyzcal_mm[:, 2]),
        sigma_b=np.deg2rad(0.03), sigma_m=np.deg2rad(0.1),
        panel=panel, scan=expt.scan,
    )
    t_bbox_span = time.perf_counter() - t0
    out["bbox_s_collection"] = t_bbox_span * (N_REFL / max(len(bboxes), 1))
    print(
        f"bboxes: {len(bboxes)} in {t_bbox_span:.3f} s -> "
        f"{out['bbox_s_collection']:.2f} s / collection", file=sys.stderr,
    )

    # --- background reduction: (N, 256) IRLS ------------------------------
    # realistic histograms: ~380 background pixels/reflection from a
    # Poisson(4) detector (21x21 box minus foreground)
    NB = int(os.environ.get("FFS_BG_N", "65536"))
    counts = rng.poisson(4.0, size=(NB, 380))
    idx = np.clip(counts, 0, NUM_BG_BINS - 1)
    flat = (np.arange(NB)[:, None] * NUM_BG_BINS + idx).ravel()
    hist = (
        np.bincount(flat, minlength=NB * NUM_BG_BINS)
        .reshape(NB, NUM_BG_BINS)
        .astype(np.int64)
    )
    overflow = np.zeros(NB, dtype=np.int64)

    for model in ("tukey", "glm"):
        # device path (pipeline --bg-device): data resident, chained
        # loop-dependent reps, all three outputs consumed
        hist_d = jax.device_put(jnp.asarray(hist))
        ovf_d = jax.device_put(jnp.asarray(overflow))

        @jax.jit
        def chained(h, o):
            def body(i, acc):
                m, w, v = estimate_background_device(h + (i & 1), o, model)
                return acc + jnp.sum(m) + jnp.sum(w) + jnp.sum(v)

            return jax.lax.fori_loop(0, 4, body, jnp.float64(0.0))

        jax.block_until_ready(chained(hist_d, ovf_d))
        t0 = time.perf_counter()
        jax.block_until_ready(chained(hist_d, ovf_d))
        t_dev = (time.perf_counter() - t0) / 4
        out[f"bg_{model}_device_s_collection"] = t_dev * (N_REFL / NB)

        t0 = time.perf_counter()
        bg_mod.estimate_background(hist, overflow, model)
        t_host = time.perf_counter() - t0
        out[f"bg_{model}_host_s_collection"] = t_host * (N_REFL / NB)
        print(
            f"background[{model}]: device {t_dev * 1e3:.1f} ms / {NB} refl "
            f"-> {out[f'bg_{model}_device_s_collection']:.2f} s / collection; "
            f"host {t_host:.2f} s -> "
            f"{out[f'bg_{model}_host_s_collection']:.2f} s", file=sys.stderr,
        )

    # --- finalize: full-collection host pass ------------------------------
    N = N_REFL
    acc = Accumulators.zeros(N)
    acc.fg_sum[:] = rng.poisson(500.0, N).astype(float)
    acc.fg_count[:] = rng.integers(20, 60, N)
    acc.bg_count[:] = rng.integers(300, 400, N)
    acc.sum_ix[:] = acc.fg_sum * rng.uniform(100, 2000, N)
    acc.sum_iy[:] = acc.fg_sum * rng.uniform(100, 2000, N)
    acc.sum_iz[:] = acc.fg_sum * rng.uniform(0, 3600, N)
    bg_mean = rng.uniform(3.5, 4.5, N)
    bg_wsum = rng.uniform(250, 350, N)
    bg_valid = np.ones(N, dtype=bool)
    s1 = rng.normal(size=(N, 3))
    s1 /= np.linalg.norm(s1, axis=1, keepdims=True) / (1.0 / 0.976)
    phi = np.deg2rad(rng.uniform(0, 360, N))
    hkl = rng.integers(-40, 41, size=(N, 3))
    zeta = rng.uniform(0.1, 1.0, N)
    fbb = np.zeros((N, 6), dtype=np.int64)
    fbb[:, 1] = fbb[:, 3] = 20
    fbb[:, 4] = rng.integers(0, 3596, N)
    fbb[:, 5] = fbb[:, 4] + Z_EXTENT
    scan_full = Scan(image_range=(1, N_IMAGES), oscillation=(0.0, 0.1))
    fin_mod.check_overflow(acc.bg_count, acc.bg_overflow)
    t0 = time.perf_counter()
    fin_mod.finalize(
        acc=acc, bg_mean=bg_mean, bg_wsum=bg_wsum, bg_valid=bg_valid,
        bboxes=fbb, s1=s1, phi=phi, hkl=hkl, zeta=zeta,
        scan=scan_full, beam=beam, gonio=gonio,
        crystal=Crystal(cell[0], cell[1], cell[2]),
        sigma_m=np.deg2rad(0.1),
    )
    out["finalize_s_collection"] = time.perf_counter() - t0
    print(
        f"finalize: {out['finalize_s_collection']:.2f} s for {N} refl",
        file=sys.stderr,
    )

    # --- effective rate ----------------------------------------------------
    block_rate = float(os.environ.get("FFS_BLOCK_RATE", "2.32e6"))
    t_block = N_SLICES / block_rate
    extra = (
        out["predict_s_collection"] + out["bbox_s_collection"]
        + out["bg_tukey_device_s_collection"] + out["finalize_s_collection"]
    )
    eff = N_SLICES / (t_block + extra)
    out.update(
        block_s_collection=t_block, total_s_collection=t_block + extra,
        acquisition_s=ACQ_S, effective_slices_per_s=eff,
        vs_baseline=eff / 928000.0,
    )
    print(json.dumps({k: round(v, 3) for k, v in out.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
