"""pcw row-triple fusion experiment: ONE (K, 3*nwl2) row gather instead of
three (K, nwl2) gathers (own + up + down rows) in the segmented compaction.

Theory: row-slice gathers price like K point gathers with the lane count
~free, so gathering [row | row_up | row_dn] lanes in one op should cost a
third of three separate row gathers, minus the cost of materialising the
3x-wide concat (114 MB at Eiger B=8, built once per rep by XLA roll+concat).

Full bench programs head-to-head, equality asserted (tall linear indices,
intensities, neighbour slots all bit-identical).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/ffs_tpu_xla")
)

import jax
import jax.numpy as jnp
import numpy as np

from bench import _make_frames
from ffs_tpu.constants import E2XE_16M_FAST, E2XE_16M_SLOW
from ffs_tpu.io import sample_data
from ffs_tpu.ops import connected_components as cc
from ffs_tpu.ops.compact import _select_bit, compact_from_pcw_segmented
from ffs_tpu.ops.connected_components import BIG, CompactPixels
from ffs_tpu.ops.dispersion_pallas import dispersion_packed_raw, mask_box_count

JF = bool(os.environ.get("JF"))
if JF:
    H, W = 1066, 1030
else:
    H, W = E2XE_16M_SLOW, E2XE_16M_FAST
B = int(os.environ.get("B", "112" if JF else "8"))
REPS = int(os.environ.get("REPS", "32"))
KF = int(os.environ.get("KF", "640" if JF else "3072"))
S = int(os.environ.get("S", "8192" if JF else "12288"))
STRIP = int(os.environ.get("STRIP", "128"))


def compact_segmented_pcw3(
    images, pcw, *, max_pixels_per_frame, gather_group_frames=None
):
    """compact_from_pcw_segmented with the own/up/down row fetches fused
    into one (K, 3*nwl2) row gather over a roll-concatenated pcw."""
    B, h, nwl2 = pcw.shape
    nwl = nwl2 // 2
    h_img, w = images.shape[-2], images.shape[-1]
    ht = h + 1
    kf = max_pixels_per_frame

    row_counts = pcw[:, :, nwl - 1]
    row_end = jnp.cumsum(row_counts, axis=1)
    counts = row_end[:, -1]

    ks = jnp.arange(1, kf + 1, dtype=jnp.int32)[None, :]
    valid = ks <= counts[:, None]

    b_grid = jnp.arange(B, dtype=jnp.int32)[:, None]
    dhist = jnp.zeros((B, kf + 1), jnp.int32).at[
        jnp.broadcast_to(b_grid, (B, h)), jnp.clip(row_end, 0, kf)
    ].add(1)
    y_f = jnp.cumsum(dhist, axis=1)[:, :kf]
    y_idx = jnp.clip(y_f, 0, h - 1)
    prev_end = jnp.where(
        y_idx > 0,
        jnp.take_along_axis(row_end, jnp.clip(y_idx - 1, 0, h - 1), axis=1),
        0,
    )
    rank = ks - prev_end

    prow = b_grid * h + y_idx

    # fused row-triple: [row | row_up | row_dn] (edge rows duplicate
    # themselves; the has_up / has_dn guards below mask those out exactly
    # as the clipped separate gathers did)
    up = jnp.concatenate([pcw[:, :1], pcw[:, :-1]], axis=1)
    dn = jnp.concatenate([pcw[:, 1:], pcw[:, -1:]], axis=1)
    pcw3 = jnp.concatenate([pcw, up, dn], axis=-1)  # (B, h, 3*nwl2)
    rows3 = pcw3.reshape(-1, 3 * nwl2)[prow.reshape(-1)].reshape(
        B, kf, 3 * nwl2
    )
    rows = rows3[..., :nwl2]
    up_rows = rows3[..., nwl2 : 2 * nwl2]
    dn_rows = rows3[..., 2 * nwl2 :]

    pc_rows = rows[..., :nwl]
    w_rows = rows[..., nwl:]
    below = pc_rows < rank[..., None]
    jw = jnp.sum(below.astype(jnp.int32), axis=-1)
    jw_c = jnp.clip(jw, 0, nwl - 1)
    before = jnp.max(jnp.where(below, pc_rows, 0), axis=-1)
    lanes = jnp.arange(nwl, dtype=jnp.int32)
    onehot = lanes == jw_c[..., None]
    word = jnp.sum(jnp.where(onehot, w_rows, 0), axis=-1)
    bit = _select_bit(word, rank - before)
    col = jnp.clip(jw_c * 32 + bit, 0, w - 1)

    row_t = b_grid * ht + y_idx
    lin = jnp.where(valid, row_t * w + col, BIG).astype(jnp.int32)

    gs = gather_group_frames or max(
        1, (32 << 20) // (h_img * w * images.dtype.itemsize)
    )
    local = jnp.clip(
        ((b_grid % gs) * h_img + jnp.minimum(y_idx, h_img - 1)) * w + col,
        0,
        gs * h_img * w - 1,
    )
    vals = []
    for g in range(-(-B // gs)):
        tab = jax.lax.optimization_barrier(
            images[g * gs : (g + 1) * gs].reshape(-1)
        )
        lg = local[g * gs : (g + 1) * gs]
        vals.append(tab[jnp.clip(lg, 0, tab.shape[0] - 1)].astype(jnp.int32))
    inten = jnp.where(valid, jnp.concatenate(vals, axis=0), 0)

    pixels = CompactPixels(lin.reshape(-1), inten.reshape(-1), jnp.sum(counts))

    oh_prev = lanes == (jw_c - 1)[..., None]
    word_up = jnp.sum(jnp.where(onehot, up_rows[..., nwl:], 0), axis=-1)
    pc_up_prev = jnp.sum(jnp.where(oh_prev, up_rows[..., :nwl], 0), axis=-1)
    row_up_cnt = up_rows[..., nwl - 1]
    word_dn = jnp.sum(jnp.where(onehot, dn_rows[..., nwl:], 0), axis=-1)
    pc_dn_prev = jnp.sum(jnp.where(oh_prev, dn_rows[..., :nwl], 0), axis=-1)

    low_mask = jnp.where(bit == 0, 0, (jnp.int32(1) << bit) - 1)
    slots = jnp.arange(B * kf, dtype=jnp.int32).reshape(B, kf)
    seg0 = b_grid * kf

    has_up = valid & (y_idx > 0) & (((word_up >> bit) & 1) == 1)
    rank_up = pc_up_prev + jax.lax.population_count(word_up & low_mask) + 1
    row_start_up = prev_end - row_up_cnt
    nbu = jnp.where(has_up, seg0 + row_start_up + rank_up - 1, slots).astype(
        jnp.int32
    )

    has_dn = valid & (y_idx < h - 1) & (((word_dn >> bit) & 1) == 1)
    rank_dn = pc_dn_prev + jax.lax.population_count(word_dn & low_mask) + 1
    row_start_dn = prev_end + pc_rows[..., nwl - 1]
    nbd = jnp.where(has_dn, seg0 + row_start_dn + rank_dn - 1, slots).astype(
        jnp.int32
    )
    return pixels, nbu.reshape(-1), nbd.reshape(-1), counts


def timeit(name, fn, *args, reps=REPS):
    @jax.jit
    def chained(*a):
        def body(i, acc):
            return acc + fn(i, *a)

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    jax.block_until_ready(chained(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(chained(*args))
    dt = (time.perf_counter() - t0) / reps
    print(
        f"{name:58s} {dt * 1e3:9.3f} ms/batch  {dt * 1e3 / B:8.3f} ms/frame",
        flush=True,
    )
    return dt


def main():
    on_tpu = jax.default_backend() == "tpu"
    print(f"backend={jax.default_backend()} jf={JF} B={B} reps={REPS} KF={KF}")
    rng = np.random.default_rng(12)
    if JF:
        mask_np = np.ones((H, W), dtype=np.uint8)
        mask_np[512:554, :] = 0
        batch_np = _make_frames(rng, H, W, B, mask_np, n_spots=60)
    else:
        mask_np = sample_data.generate_mask()
        batch_np = _make_frames(rng, H, W, B, mask_np)
    batch = jax.device_put(jnp.asarray(batch_np))
    mask = jnp.asarray(mask_np)
    if JF:
        from ffs_tpu.ops.dispersion_extended_pallas import (
            dispersion_extended_packed_raw,
            mask_box_count_extended,
        )

        mbox = jax.block_until_ready(mask_box_count_extended(mask, strip=STRIP))

        def run_kernel(b):
            return dispersion_extended_packed_raw(
                b, mask, 65535.0, mbox=mbox, strip=STRIP, interpret=not on_tpu
            )

    else:
        mbox = jax.block_until_ready(mask_box_count(mask))

        def run_kernel(b):
            return dispersion_packed_raw(
                b, mask, 65535.0, mbox=mbox, trim=False, strip=STRIP,
                interpret=not on_tpu,
            )

    def vary(i, b):
        return b + (i & 1).astype(b.dtype)

    def make_full(compact_fn):
        def full(i, b):
            bb = vary(i, b)
            pcw = run_kernel(bb)
            hp = pcw.shape[1]
            p, nbu, nbd, counts = compact_fn(bb, pcw)
            root = cc.label_compact_pixels(p, width=W, neighbors=(nbu, nbd))
            t = cc.spot_table_from_pixels(
                p, root, width=W, max_spots=S, dtype=jnp.float32,
                frame_rows=hp, peak_key_slots=KF,
            )
            keep, _, _ = cc.filter_spots(t, 3, 2.0)
            return (
                p.count
                + jnp.max(counts)
                + t.n_spots
                + jnp.sum(keep.astype(jnp.int32))
                + jnp.sum(t.com_x)
                + jnp.sum(t.com_y)
            ).astype(jnp.float32)

        return full

    def base_compact(bb, pcw):
        return compact_from_pcw_segmented(
            bb, pcw, max_pixels_per_frame=KF, with_neighbors=True
        )

    def pcw3_compact(bb, pcw):
        return compact_segmented_pcw3(bb, pcw, max_pixels_per_frame=KF)

    # equality check
    pcw = run_kernel(batch)
    p0, nbu0, nbd0, c0 = base_compact(batch, pcw)
    p1, nbu1, nbd1, c1 = jax.jit(pcw3_compact, static_argnames=())(batch, pcw)
    assert (np.asarray(p0.linear_index) == np.asarray(p1.linear_index)).all()
    assert (np.asarray(p0.intensity) == np.asarray(p1.intensity)).all()
    assert (np.asarray(nbu0) == np.asarray(nbu1)).all()
    assert (np.asarray(nbd0) == np.asarray(nbd1)).all()
    assert (np.asarray(c0) == np.asarray(c1)).all()
    print("equality checks passed (pixels + neighbour slots bit-exact)")

    if not on_tpu:
        return
    timeit("baseline segmented  [= bench program]", make_full(base_compact), batch)
    timeit("pcw3 fused row-triple gather", make_full(pcw3_compact), batch)


if __name__ == "__main__":
    main()
