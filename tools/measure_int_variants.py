"""Integrator block-step variant A/B on the TPU.

Variants of KabschIntegrator._block_step_impl, each a FULL chained
program (cross-program stage deltas mislead; only whole candidate
programs are comparable):

- base          : the production step (= tools/bench_integrator.py program)
- nohist        : histogram + overflow dropped from the consumed outputs
                  (XLA DCEs the one-hot einsum) -> the histogram's
                  marginal cost
- i8hist        : one-hot operands in int8 instead of bfloat16 (halves
                  the ~350 MB/frame one-hot materialisation; products are
                  0/1 so an i32-accumulated s8 dot is exact)
- fold8         : 8 reflections folded into the 128-lane matmul dims —
                  the per-reflection (16, P) @ (P, 16) batched matmuls
                  pad their 16-wide output dims to the 128x128 MXU, so
                  ~98% of each pass is wasted; one (128, P) @ (P, 128)
                  per 8 reflections does the same work in 1/8 the passes
                  and the per-reflection histograms are the 16x16
                  block-diagonal blocks of the 128x128 product
- tfold         : ellipsoid corner classification folded to ONE compare
                  against the per-reflection scalar max threshold
                  max(t_low, t_high, centre_ok ? 1 : -inf)  [e12 is
                  frame-invariant; corner_fg(phi) = e12 <= t(phi)]
- i8hist+tfold  : both

Equality is asserted bitwise on all 8 outputs before timing.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/ffs_tpu_xla")
)

import numpy as np

A = int(os.environ.get("FFS_BENCH_INT_REFL", "2048"))
F = int(os.environ.get("FFS_BENCH_INT_F", "4"))  # frames per block
REPS = int(os.environ.get("FFS_BENCH_INT_REPS", "16"))
H, W = 2164, 2068
NUM_BG_BINS = 256


def make_step(integ, jnp, *, hist_mode="bf16", fold_t=False):
    """A copy of the production per-frame math with the variant knobs.

    hist_mode: "bf16" (production), "i8"
    fold_t: single scalar-threshold compare for the ellipsoid corner test
    """
    import jax

    from ffs_tpu.ops.window_gather import window_gather_planes

    bh, bw = integ.box_h, integ.box_w

    def step(
        frames, fieldw, maskw, x0, y0, bbox, s1_c, phi_c, e1, e2, zeta,
        active, phi_lows, d_osc, z_values, frame_ok,
    ):
        lanes = 128
        windows = window_gather_planes(
            frames, y0.astype(jnp.int32), x0.astype(jnp.int32), bh=bh
        )
        px = x0[:, None] + jnp.arange(lanes)[None, :]
        py = y0[:, None] + jnp.arange(bh)[None, :]
        in_bbox = (
            (px[:, None, :] >= bbox[:, 0, None, None])
            & (px[:, None, :] <= bbox[:, 1, None, None])
            & (py[:, :, None] >= bbox[:, 2, None, None])
            & (py[:, :, None] <= bbox[:, 3, None, None])
        )
        if maskw is not None:
            in_bbox = in_bbox & (maskw != 0)

        s1_hi = s1_c.astype(jnp.float32)
        s1_lo = (s1_c - s1_hi.astype(jnp.float64)).astype(jnp.float32)
        delta = (fieldw[:, 0:3] - s1_hi[:, :, None, None]) + (
            fieldw[:, 3:6] - s1_lo[:, :, None, None]
        )
        s1_len = jnp.linalg.norm(s1_c, axis=-1)
        e1n = (e1 / s1_len[:, None]).astype(jnp.float32)
        e2n = (e2 / s1_len[:, None]).astype(jnp.float32)
        eps1 = jnp.einsum("akhw,ak->ahw", delta, e1n)
        eps2 = jnp.einsum("akhw,ak->ahw", delta, e2n)
        e12 = (eps1 * eps1 + eps2 * eps2) / np.float32(integ._delta_b**2)
        e12 = e12[:, : bh + 1, :]

        def t_of(phi_eval):
            eps3 = zeta * (phi_eval - phi_c)
            return (1.0 - eps3 * eps3 / (integ._delta_m**2)).astype(
                jnp.float32
            )

        def corner_fg(phi_eval):
            return e12 <= t_of(phi_eval)[:, None, None]

        k16 = jnp.arange(16, dtype=jnp.int32)
        cols64 = jnp.arange(lanes, dtype=jnp.float64)
        rows64 = jnp.arange(bh, dtype=jnp.float64)

        outs = []
        for f in range(F):
            phi_low = phi_lows[f]
            phi_high = phi_lows[f] + d_osc
            centre_ok = (phi_c >= jnp.minimum(phi_low, phi_high)) & (
                phi_c <= jnp.maximum(phi_low, phi_high)
            )
            if fold_t:
                t = jnp.maximum(t_of(phi_low), t_of(phi_high))
                t = jnp.maximum(
                    t, jnp.where(centre_ok, jnp.float32(1.0), -jnp.inf)
                )
                corner_in = e12 <= t[:, None, None]
            else:
                corner_in = corner_fg(phi_low) | corner_fg(phi_high)
                corner_in = corner_in | (
                    corner_fg(phi_c) & centre_ok[:, None, None]
                )
            fg4 = corner_in[:, :-1, :] | corner_in[:, 1:, :]
            fg = fg4 | jnp.roll(fg4, -1, axis=2)
            act_f = (
                active
                & frame_ok[f]
                & (bbox[:, 4] <= z_values[f])
                & (bbox[:, 5] > z_values[f])
            )
            valid_px = in_bbox & act_f[:, None, None]
            fg = fg & valid_px
            bg = (~fg) & valid_px

            ivals = jnp.maximum(windows[:, f], 0)
            mi = jnp.where(fg, ivals, 0)
            colsum = jnp.sum(mi, axis=1)
            rowsum = jnp.sum(mi, axis=2)
            fg_sum = jnp.sum(colsum, axis=1).astype(jnp.float64)
            fg_count = jnp.sum(fg, axis=(1, 2)).astype(jnp.int32)
            sum_ix = (x0.astype(jnp.float64) + 0.5) * fg_sum + (
                colsum.astype(jnp.float64) @ cols64
            )
            sum_iy = (y0.astype(jnp.float64) + 0.5) * fg_sum + (
                rowsum.astype(jnp.float64) @ rows64
            )
            sum_iz = fg_sum * (z_values[f] + 0.5)

            in_range = bg & (ivals < NUM_BG_BINS)
            if hist_mode == "fold8":
                G = 8
                # transpose the (A, P) i32 VALUES (16x cheaper than
                # transposing the one-hots), then build the one-hots
                # directly in the folded (A/G, P, G*16) layout
                iv_g = ivals.reshape(A // G, G, bh * lanes).transpose(
                    0, 2, 1
                )
                ir_g = in_range.reshape(A // G, G, bh * lanes).transpose(
                    0, 2, 1
                )
                co_g = (
                    ir_g[..., None] & ((iv_g >> 4)[..., None] == k16)
                ).reshape(A // G, bh * lanes, G * 16)
                fi_g = ((iv_g & 15)[..., None] == k16).reshape(
                    A // G, bh * lanes, G * 16
                )
                big = jax.lax.dot_general(
                    co_g.astype(jnp.bfloat16),
                    fi_g.astype(jnp.bfloat16),
                    (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).reshape(A // G, G, 16, G, 16)
                hist = (
                    jnp.diagonal(big, axis1=1, axis2=3)  # (A/G, 16, 16, G)
                    .transpose(0, 3, 1, 2)
                    .reshape(A, NUM_BG_BINS)
                    .astype(jnp.int32)
                )
                co = fi = None
            else:
                co = (
                    in_range[..., None] & ((ivals >> 4)[..., None] == k16)
                ).reshape(A, bh * lanes, 16)
                fi = ((ivals & 15)[..., None] == k16).reshape(
                    A, bh * lanes, 16
                )
            if hist_mode == "fold8":
                pass
            elif hist_mode == "i8":
                hist = (
                    jax.lax.dot_general(
                        co.astype(jnp.int8),
                        fi.astype(jnp.int8),
                        (((1,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.int32,
                    )
                    .reshape(A, NUM_BG_BINS)
                )
            else:
                hist = (
                    jnp.einsum(
                        "apc,apf->acf",
                        co.astype(jnp.bfloat16),
                        fi.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32,
                    )
                    .reshape(A, NUM_BG_BINS)
                    .astype(jnp.int32)
                )
            overflow = jnp.sum(
                bg & (ivals >= NUM_BG_BINS), axis=(1, 2)
            ).astype(jnp.int32)
            bg_count = jnp.sum(bg, axis=(1, 2)).astype(jnp.int32)
            outs.append(
                (fg_sum, fg_count, sum_ix, sum_iy, sum_iz, hist, overflow,
                 bg_count)
            )
        return tuple(jnp.stack([o[k] for o in outs]) for k in range(8))

    return step


def make_prod_step(integ, jnp, *, dummy_windows=False):
    """A copy of the PRODUCTION frame-summed step (e12 from the chunk
    cache, folded threshold, derived counts) with one probe knob:

    dummy_windows: replace the Pallas window gather with a free broadcast
    of a frame slice — outputs are WRONG, but every downstream stage keeps
    its exact shape/dtype, so base - nowin is the gather's marginal cost
    (including the (A, F, bh, 128) HBM round trip).
    """
    bh = integ.box_h

    def step(
        frames, e12, maskw, x0, y0, bbox, phi_c, zeta, active,
        phi_lows, d_osc, z_values, frame_ok,
    ):
        if dummy_windows:
            windows = jnp.broadcast_to(
                frames[None, :, :bh, :128], (A, F, bh, 128)
            ).astype(jnp.int32)
        else:
            from ffs_tpu.ops.window_gather import window_gather_planes

            windows = window_gather_planes(
                frames, y0.astype(jnp.int32), x0.astype(jnp.int32), bh=bh
            )
        return integ._finish_block_step(
            windows, e12, maskw, x0, y0, bbox, phi_c, zeta, active,
            phi_lows, d_osc, z_values, frame_ok, centre_slices=True,
        )

    return step


def main() -> int:
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from ffs_tpu.integration import kabsch as kb
    from ffs_tpu.models.geometry import (
        Goniometer,
        MonochromaticBeam,
        Scan,
        simple_panel,
    )

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

    # the production _chunk_setup now precomputes e12 and drops fieldw;
    # the historical variants below still consume the raw field windows,
    # so regather them the same way _chunk_setup does
    from ffs_tpu.ops.window_gather import window_gather_planes

    fieldw = window_gather_planes(
        integ.corner_field_f32(),
        dev["y0"].astype(jnp.int32),
        dev["x0"].astype(jnp.int32),
        bh=integ.box_h + 8,
        interpret=integ._interpret,
    )
    args = (
        frames, fieldw, dev["maskw"], dev["x0"], dev["y0"],
        dev["bbox"], dev["s1"], dev["phi"], dev["e1"], dev["e2"],
        dev["zeta"], dev["active"], phi_lows,
        jnp.float64(np.deg2rad(0.1)), z_values, frame_ok,
    )
    production = jax.jit(
        lambda *a: integ._block_step_impl(*a, centre_slices=True)
    )
    # adapter: the production step driven through the OLD argument list
    # so every timing below shares one args tuple (fieldw is unused)
    base = lambda *a: production(
        a[0], dev["e12"], *a[2:6], a[7], a[10], *a[11:]
    )
    def framesum(fn):
        """Adapt a historical per-frame-output variant to the production
        step's frame-summed outputs (exact: every output is an exact
        integer / half-integer, so the sum order cannot change a bit)."""

        def wrapped(*a):
            return tuple(o.sum(axis=0) for o in fn(*a))

        return wrapped

    variants = {
        "i8hist": jax.jit(framesum(make_step(integ, jnp, hist_mode="i8"))),
        "tfold": jax.jit(framesum(make_step(integ, jnp, fold_t=True))),
        "i8hist+tfold": jax.jit(
            framesum(make_step(integ, jnp, hist_mode="i8", fold_t=True))
        ),
        "fold8": jax.jit(framesum(make_step(integ, jnp, hist_mode="fold8"))),
    }
    only = os.environ.get("FFS_BENCH_INT_ONLY")
    if only:
        variants = {k: v for k, v in variants.items() if k in only.split(",")}

    prod_args = (
        frames, dev["e12"], dev["maskw"], dev["x0"], dev["y0"],
        dev["bbox"], dev["phi"], dev["zeta"], dev["active"], phi_lows,
        jnp.float64(np.deg2rad(0.1)), z_values, frame_ok,
    )
    prod_copy = jax.jit(make_prod_step(integ, jnp))
    nowin = jax.jit(make_prod_step(integ, jnp, dummy_windows=True))

    ref = [np.asarray(o) for o in base(*args)]
    got = [np.asarray(o) for o in prod_copy(*prod_args)]
    for k, (r, g) in enumerate(zip(ref, got)):
        assert (r == g).all(), f"prod_copy output {k} mismatch"
    print("prod_copy: all 8 outputs bit-identical", flush=True)
    for name, fn in variants.items():
        got = [np.asarray(o) for o in fn(*args)]
        for k, (r, g) in enumerate(zip(ref, got)):
            assert (r == g).all(), f"{name} output {k} mismatch"
        print(f"{name}: all 8 outputs bit-identical", flush=True)

    if jax.default_backend() != "tpu":
        print("not on TPU; skipping timing")
        return 0

    def timeit(name, step_fn, targs=args):
        @jax.jit
        def chained(fr, *rest):
            def body(i, acc):
                out = step_fn(fr + (i & 1), *rest)
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

        jax.block_until_ready(chained(*targs))
        t0 = time.perf_counter()
        jax.block_until_ready(chained(*targs))
        dt = (time.perf_counter() - t0) / REPS
        rate = A * F / dt
        print(
            f"{name:16s} {dt * 1e3:8.3f} ms/step  {rate / 1e6:6.3f} M slices/s",
            flush=True,
        )
        return dt

    def zero_wrap(step_fn, drop):
        """DCE probe: zero the listed output slots so XLA drops their
        producing stages; the delta vs base is those stages' cost."""

        def fn(*a):
            out = step_fn(*a)
            return tuple(
                jnp.zeros_like(o) if k in drop else o
                for k, o in enumerate(out)
            )

        return fn

    timeit("base", lambda *a: base(*a))
    timeit("prod_copy", lambda *a: prod_copy(*a), targs=prod_args)
    timeit("nowin", lambda *a: nowin(*a), targs=prod_args)
    timeit("nohist", zero_wrap(lambda *a: base(*a), (5, 6)))
    timeit("nomoments", zero_wrap(lambda *a: base(*a), (2, 3, 4)))
    timeit("nocounts", zero_wrap(lambda *a: base(*a), (6, 7)))
    timeit("nofg", zero_wrap(lambda *a: base(*a), (0, 1, 2, 3, 4)))
    for name, fn in variants.items():
        timeit(name, fn)
    return 0


if __name__ == "__main__":
    sys.exit(main())
