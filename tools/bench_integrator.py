"""Kabsch integrator blocked device-step throughput (separate process).

Prints ONE JSON line {"metric": "kabsch_integrate_refl_per_s", ...} in
reflection-image slices/s.  Measures the production blocked path: one
jitted step per (reflection chunk, frame block) with multi-plane DMA
window gathers and per-chunk cached corner geometry (the exact code
integrate() drives), on realistic 21x21 shoeboxes spanning 4 frames.

Baseline: real-time integration of a 500 Hz collection = 464
predictions/image x ~4-image z extent x 500 images/s = 928k
reflection-image slices/s (derivation in BASELINE.md).
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

    A = int(os.environ.get("FFS_BENCH_INT_REFL", "2048"))
    F = 4
    REPS = int(os.environ.get("FFS_BENCH_INT_REPS", "16"))
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
            np.zeros(A), np.full(A, F),
        ],
        axis=1,
    ).astype(np.int64)

    integ = kb.KabschIntegrator(
        panel=panel, beam=beam, gonio=gonio, scan=scan,
        s1=s1, phi=phi, bboxes=bboxes,
        delta_b=np.deg2rad(0.3), delta_m=np.deg2rad(1.0), max_active=A,
    )

    cs_e1 = np.cross(s1, beam.s0)
    cs_e1 /= np.linalg.norm(cs_e1, axis=1, keepdims=True)
    cs_e2 = np.cross(s1, cs_e1)
    cs_e2 /= np.linalg.norm(cs_e2, axis=1, keepdims=True)
    zeta = cs_e1 @ (gonio.rotation_axis / np.linalg.norm(gonio.rotation_axis))

    dev = integ._chunk_setup(np.arange(A), cs_e1, cs_e2, zeta)
    image = rng.poisson(4.0, size=(F, H, W)).astype(np.uint16)
    frames = jnp.asarray(integ.pad_frames(image)).astype(jnp.int32)
    phi_lows = jnp.asarray(np.deg2rad(np.arange(F) * 0.1))
    z_values = jnp.asarray(np.arange(F, dtype=np.float64))
    frame_ok = jnp.ones(F, dtype=bool)

    block = jax.jit(integ._block_step_impl, static_argnames=("centre_slices",))
    args = (
        dev["e12"], dev["maskw"], dev["x0"], dev["y0"], dev["bbox"],
        dev["phi"], dev["zeta"],
        dev["active"], phi_lows, float(np.deg2rad(0.1)), z_values, frame_ok,
    )

    @jax.jit
    def chained(fr, *rest):
        def body(i, acc):
            out = block(fr + (i & 1), *rest, centre_slices=True)
            # consume ALL eight outputs: production integrate() uses every
            # one, and any unconsumed output lets XLA DCE its stage (the
            # f64 moment dots were silently dropped by an earlier 3-output
            # reduction, overstating the rate by ~40%)
            return (
                acc
                + out[0].sum()
                + out[1].sum().astype(jnp.float64)
                + out[2].sum()
                + out[3].sum()
                + out[4].sum()
                + out[5].sum().astype(jnp.float64)
                + out[6].sum().astype(jnp.float64)
                + out[7].sum().astype(jnp.float64)
            )

        return jax.lax.fori_loop(0, REPS, body, jnp.float64(0.0))

    jax.block_until_ready(chained(frames, *args))
    t0 = time.perf_counter()
    jax.block_until_ready(chained(frames, *args))
    dt = time.perf_counter() - t0

    rps = A * F * REPS / dt
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
