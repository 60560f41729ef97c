"""Stage-cost breakdown of the Kabsch device step on real hardware.

Variants (full candidate programs, not stage diffs — cross-program deltas
mislead, but each variant here is a complete consumed pipeline):
  full        : the production step
  nohist      : histogram replaced by bg_count only
  nogeom      : corner geometry replaced by a precomputed c1 grid input
  nogeom_f32  : same + f32 c1/compare
  sums_only   : windows gather + fg fixed mask + f64 sums (no geometry, no hist)
"""

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

    A = int(os.environ.get("N_REFL", "512"))
    REPS = int(os.environ.get("REPS", "16"))
    H, W = 2164, 2068

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
    bh, bw = integ.box_h, integ.box_w

    image = rng.poisson(4.0, size=(H, W)).astype(np.uint16)
    pad_img = jnp.asarray(np.pad(image, ((bh, bh), (bw, bw))))
    pad_mask = jnp.asarray(
        np.pad(np.ones((H, W), np.uint8), ((bh, bh), (bw, bw)))
    )

    cs_e1 = np.cross(s1, beam.s0)
    cs_e1 /= np.linalg.norm(cs_e1, axis=1, keepdims=True)
    cs_e2 = np.cross(s1, cs_e1)
    cs_e2 /= np.linalg.norm(cs_e2, axis=1, keepdims=True)
    zeta = cs_e1 @ (gonio.rotation_axis / np.linalg.norm(gonio.rotation_axis))

    x0 = jnp.asarray(bboxes[:, 0])
    y0 = jnp.asarray(bboxes[:, 2])
    args = (
        pad_img, pad_mask, x0, y0,
        jnp.asarray(bboxes), jnp.asarray(s1), jnp.asarray(phi),
        jnp.asarray(cs_e1), jnp.asarray(cs_e2), jnp.asarray(zeta),
        jnp.ones(A, dtype=bool), 0.0, np.deg2rad(0.1), 1.0,
    )

    def timeit(name, fn, *a):
        @jax.jit
        def chained(img, *rest):
            def body(i, accv):
                out = fn(img + (i & 1).astype(img.dtype), *rest)
                return accv + sum(jnp.sum(o) for o in jax.tree.leaves(out)).astype(jnp.float64)

            return jax.lax.fori_loop(0, REPS, body, jnp.float64(0.0))

        jax.block_until_ready(chained(*a))
        t0 = time.perf_counter()
        jax.block_until_ready(chained(*a))
        dt = (time.perf_counter() - t0) / REPS
        print(f"{name:>14s}: {dt * 1e3:7.2f} ms/step  ({A / dt:9.0f} slices/s)", flush=True)
        return dt

    # --- full production step
    timeit("full", lambda img, *rest: integ._step(integ.corner_field(), img, *rest, centre_slices=True), *args)

    # --- no histogram
    def step_nohist(img, msk, x0_, y0_, bbox, s1_c, phi_c, e1, e2, zt, act, pl_, ph_, zv):
        out = integ._frame_step(img, msk, x0_, y0_, bbox, s1_c, phi_c, e1, e2, zt, act, pl_, ph_, zv, centre_slices=True)
        return out[:5] + (out[7],)

    # rebuild a step without the segment-sum by monkeypatching is invasive;
    # approximate: time the histogram alone below instead.

    # --- geometry alone: corner field -> c1
    def geom_only(img, msk, x0_, y0_, bbox, s1_c, phi_c, e1, e2, zt, act, pl_, ph_, zv):
        jnpl = jnp
        Aq = x0_.shape[0]
        cx = (x0_[:, None] + jnpl.arange(bw + 1)[None, :]).astype(jnp.float64)
        cy = (y0_[:, None] + jnpl.arange(bh + 1)[None, :]).astype(jnp.float64)
        s_px = integ._corner_s_pixel(
            jnpl.broadcast_to(cx[:, None, :], (Aq, bh + 1, bw + 1)),
            jnpl.broadcast_to(cy[:, :, None], (Aq, bh + 1, bw + 1)),
        )
        delta = s_px - s1_c[:, None, None, :]
        s1_len = jnpl.linalg.norm(s1_c, axis=-1)[:, None, None]
        eps1 = jnpl.einsum("ahwc,ac->ahw", delta, e1) / s1_len
        eps2 = jnpl.einsum("ahwc,ac->ahw", delta, e2) / s1_len
        c1 = (eps1 * eps1 + eps2 * eps2) / (integ._delta_b ** 2)
        return (c1 + img[0, 0],)

    timeit("geom_only", geom_only, *args)

    # --- windows gather + sums only (fixed fg mask)
    def sums_only(img, msk, x0_, y0_, bbox, s1_c, phi_c, e1, e2, zt, act, pl_, ph_, zv):
        import jax as jx
        windows = jx.vmap(
            lambda yy, xx: jx.lax.dynamic_slice(img, (yy, xx), (bh, bw))
        )(y0_ + bh, x0_ + bw).astype(jnp.float32)
        fg = windows > 2.0
        inten = windows.astype(jnp.float64)
        fgf = fg.astype(jnp.float64)
        px = x0_[:, None] + jnp.arange(bw)[None, :]
        py = y0_[:, None] + jnp.arange(bh)[None, :]
        fg_sum = jnp.sum(inten * fgf, axis=(1, 2))
        sum_ix = jnp.sum(inten * fgf * (px[:, None, :].astype(jnp.float64) + 0.5), axis=(1, 2))
        sum_iy = jnp.sum(inten * fgf * (py[:, :, None].astype(jnp.float64) + 0.5), axis=(1, 2))
        return fg_sum, sum_ix, sum_iy

    timeit("sums_only", sums_only, *args)

    # --- histogram alone (fixed bg mask)
    def hist_only(img, msk, x0_, y0_, bbox, s1_c, phi_c, e1, e2, zt, act, pl_, ph_, zv):
        import jax as jx
        windows = jx.vmap(
            lambda yy, xx: jx.lax.dynamic_slice(img, (yy, xx), (bh, bw))
        )(y0_ + bh, x0_ + bw)
        bg = windows < 2.0
        vals = jnp.clip(windows.astype(jnp.int32), 0, None)
        nb2 = kb.NUM_BG_BINS + 2
        slot = jnp.arange(A, dtype=jnp.int32)[:, None, None]
        lane = jnp.where(bg, jnp.where(vals < kb.NUM_BG_BINS, vals, kb.NUM_BG_BINS), kb.NUM_BG_BINS + 1)
        seg = (slot * nb2 + lane).reshape(-1)
        flat = jax.ops.segment_sum(jnp.ones_like(seg, dtype=jnp.int32), seg, num_segments=A * nb2)
        return (flat,)

    timeit("hist_only", hist_only, *args)
    return 0


if __name__ == "__main__":
    import sys as _s;_s.exit(main()) if not os.environ.get("V2") else None


def main2() -> int:
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from ffs_tpu.integration import kabsch as kb
    from ffs_tpu.models.geometry import Goniometer, MonochromaticBeam, Scan, simple_panel

    A = int(os.environ.get("N_REFL", "512"))
    REPS = int(os.environ.get("REPS", "16"))
    H, W = 2164, 2068
    rng = np.random.default_rng(3)
    panel = simple_panel(0.2 * 1000, (W / 2, H / 2), (0.075, 0.075), (W, H))
    beam = MonochromaticBeam(wavelength=0.976)
    gonio = Goniometer()
    scan = Scan(image_range=(1, 100), oscillation=(0.0, 0.1))
    x = rng.uniform(50, W - 50, A); y = rng.uniform(50, H - 50, A)
    xmm, ymm = panel.px_to_mm(x, y)
    lab = panel.get_lab_coord(xmm, ymm)
    s1 = lab / np.linalg.norm(lab, axis=1, keepdims=True) / beam.wavelength
    phi = np.deg2rad(rng.uniform(0, 1, A)); half = 10
    bboxes = np.stack([
        np.clip(x - half, 0, W - 1), np.clip(x + half, 0, W - 1),
        np.clip(y - half, 0, H - 1), np.clip(y + half, 0, H - 1),
        np.zeros(A), np.full(A, 3)], axis=1).astype(np.int64)
    integ = kb.KabschIntegrator(
        panel=panel, beam=beam, gonio=gonio, scan=scan, s1=s1, phi=phi,
        bboxes=bboxes, delta_b=np.deg2rad(0.3), delta_m=np.deg2rad(1.0), max_active=A)
    bh, bw = integ.box_h, integ.box_w
    field = integ.corner_field()
    image = rng.poisson(4.0, size=(H, W)).astype(np.uint16)
    pad_img = jnp.asarray(np.pad(image, ((bh, bh), (bw, bw))))
    x0 = jnp.asarray(bboxes[:, 0]); y0 = jnp.asarray(bboxes[:, 2])
    e1 = np.cross(s1, beam.s0); e1 /= np.linalg.norm(e1, axis=1, keepdims=True)
    e2 = np.cross(s1, e1); e2 /= np.linalg.norm(e2, axis=1, keepdims=True)
    e1d, e2d, s1d = jnp.asarray(e1), jnp.asarray(e2), jnp.asarray(s1)

    import time as _t

    def timeit(name, fn, *a):
        @jax.jit
        def chained(img, *rest):
            def body(i, accv):
                out = fn(img + (i & 1).astype(img.dtype), *rest)
                return accv + sum(jnp.sum(o).astype(jnp.float64) for o in jax.tree.leaves(out))
            return jax.lax.fori_loop(0, REPS, body, jnp.float64(0.0))
        jax.block_until_ready(chained(*a))
        t0 = _t.perf_counter()
        jax.block_until_ready(chained(*a))
        dt = (_t.perf_counter() - t0) / REPS
        print(f"{name:>16s}: {dt * 1e3:7.2f} ms/step  ({A / dt:9.0f} slices/s)", flush=True)

    def gather_field(img, x0_, y0_):
        s_px = jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(field, (0, yy, xx), (3, bh + 1, bw + 1)))(y0_, x0_)
        return (s_px.sum(axis=(1, 2, 3)) + img[0, 0],)

    timeit("field_gather", gather_field, pad_img, x0, y0)

    def e12_from_field(img, x0_, y0_):
        s_px = jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(field, (0, yy, xx), (3, bh + 1, bw + 1)))(y0_, x0_)
        s1_len = jnp.linalg.norm(s1d, axis=-1)
        e1n = e1d / s1_len[:, None]; e2n = e2d / s1_len[:, None]
        eps1 = jnp.einsum("akhw,ak->ahw", s_px, e1n) - jnp.einsum("ak,ak->a", s1d, e1n)[:, None, None]
        eps2 = jnp.einsum("akhw,ak->ahw", s_px, e2n) - jnp.einsum("ak,ak->a", s1d, e2n)[:, None, None]
        return ((eps1 * eps1 + eps2 * eps2).sum() + img[0, 0],)

    timeit("e12_from_field", e12_from_field, pad_img, x0, y0)

    def mxu_hist(img, x0_, y0_):
        windows = jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(img, (yy, xx), (bh, bw)))(y0_ + bh, x0_ + bw)
        bg = windows < 2.0
        vals = jnp.clip(windows.astype(jnp.int32), 0, None)
        in_range = bg & (vals < 256)
        k16 = jnp.arange(16, dtype=jnp.int32)
        co = (in_range[..., None] & ((vals >> 4)[..., None] == k16)).reshape(A, bh * bw, 16)
        fi = ((vals & 15)[..., None] == k16).reshape(A, bh * bw, 16)
        hist = jnp.einsum("apc,apf->acf", co.astype(jnp.bfloat16), fi.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
        return (hist.sum(),)

    timeit("mxu_hist", mxu_hist, pad_img, x0, y0)

    def img_gather(img, x0_, y0_):
        windows = jax.vmap(lambda yy, xx: jax.lax.dynamic_slice(img, (yy, xx), (bh, bw)))(y0_ + bh, x0_ + bw)
        return (windows.sum(),)

    timeit("img_gather_f64", img_gather, pad_img, x0, y0)
    return 0

if __name__ == "__main__" and os.environ.get("V2"):
    main2()
