"""Kabsch integrator device-step throughput (separate process: x64 on).

Prints ONE JSON line {"metric": "kabsch_integrate_refl_per_s", ...}.
Invoked by bench.py as a subprocess (the main bench keeps x64 off for the
Mosaic kernels; the integrator's f64 accumulation needs it on).
"""

import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/ffs_tpu_xla")
)

import numpy as np


def main() -> int:
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from ffs_tpu.integration import kabsch as kb
    from ffs_tpu.models.geometry import Goniometer, MonochromaticBeam, Scan, simple_panel

    A = int(os.environ.get("FFS_BENCH_INT_REFL", "512"))
    REPS = int(os.environ.get("FFS_BENCH_INT_REPS", "8"))
    H, W = 2164, 2068  # Eiger 4M-ish frame

    rng = np.random.default_rng(3)
    panel = simple_panel(0.2 * 1000, (W / 2, H / 2), (0.075, 0.075), (W, H))
    beam = MonochromaticBeam(wavelength=0.976)
    gonio = Goniometer()
    scan = Scan(image_range=(1, 100), oscillation=(0.0, 0.1))

    x = rng.uniform(50, W - 50, A)
    y = rng.uniform(50, H - 50, A)
    xmm, ymm = panel.px_to_mm(x, y)
    lab = panel.get_lab_coord(xmm, ymm)
    s1 = lab / np.linalg.norm(lab, axis=1, keepdims=True) / beam.wavelength
    phi = np.deg2rad(rng.uniform(0, 1, A))
    half = 10
    bboxes = np.stack(
        [
            np.clip(x - half, 0, W - 1), np.clip(x + half, 0, W - 1),
            np.clip(y - half, 0, H - 1), np.clip(y + half, 0, H - 1),
            np.zeros(A), np.full(A, 3),
        ],
        axis=1,
    ).astype(np.int64)

    integ = kb.KabschIntegrator(
        panel=panel, beam=beam, gonio=gonio, scan=scan,
        s1=s1, phi=phi, bboxes=bboxes,
        delta_b=np.deg2rad(0.3), delta_m=np.deg2rad(1.0), max_active=A,
    )

    image = rng.poisson(4.0, size=(H, W)).astype(np.uint16)
    pad_img = np.pad(image, ((integ.box_h, integ.box_h), (integ.box_w, integ.box_w)))
    pad_mask = np.pad(
        np.ones((H, W), np.uint8), ((integ.box_h, integ.box_h), (integ.box_w, integ.box_w))
    )

    cs_e1 = np.cross(s1, beam.s0)
    cs_e1 /= np.linalg.norm(cs_e1, axis=1, keepdims=True)
    cs_e2 = np.cross(s1, cs_e1)
    cs_e2 /= np.linalg.norm(cs_e2, axis=1, keepdims=True)
    zeta = cs_e1 @ (gonio.rotation_axis / np.linalg.norm(gonio.rotation_axis))

    args = (
        jnp.asarray(pad_img), jnp.asarray(pad_mask),
        jnp.asarray(bboxes[:, 0]), jnp.asarray(bboxes[:, 2]),
        jnp.asarray(bboxes), jnp.asarray(s1), jnp.asarray(phi),
        jnp.asarray(cs_e1), jnp.asarray(cs_e2), jnp.asarray(zeta),
        jnp.ones(A, dtype=bool), 0.0, np.deg2rad(0.1), 1.0,
    )

    @jax.jit
    def chained(img, *rest):
        def body(i, acc):
            out = integ._step(integ.corner_field(), img + (i & 1).astype(img.dtype), *rest, centre_slices=True)
            return acc + out[0].sum() + out[5].sum() + out[1].sum()

        return jax.lax.fori_loop(0, REPS, body, jnp.float64(0.0))

    jax.block_until_ready(chained(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(chained(*args))
    dt = time.perf_counter() - t0

    rps = A * REPS / dt
    # Baseline: real-time integration of a 500 Hz collection = 464
    # predictions/image x ~4-image z extent x 500 images/s = 928k
    # reflection-image slices/s (derivation in BASELINE.md).
    print(
        json.dumps(
            {
                "metric": "kabsch_integrate_refl_per_s",
                "value": round(rps, 1),
                "unit": "reflection-image slices/s/chip (21x21 shoeboxes)",
                "vs_baseline": round(rps / 928000.0, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
