"""CC-loop and spot-table variants: full Eiger bench programs head-to-head.

Variants (all produce BIT-IDENTICAL outputs to the production path —
asserted on every run before timing):

  * ccV1 — one fused 3K gather per CC round: the pointer jump rides the
    same gather as the two vertical-neighbour label fetches (indices
    [nbu | nbd | lbl]), replacing the baseline's 2K gather + separate
    dependent K jump gather.  Same least fixpoint (monotone min).
  * ccV2 — run-level rounds: labels live in dense run-id space; per round
    2K neighbour gathers + one segment_min over runs + K jump, replacing
    the baseline's two associative run-restore scans.
  * tblK — peak tie-break folded into the 6-column segment_max via an
    exact composite key intensity * 2^m + (2^m - 1 - frame-local slot)
    (valid for u16 intensities; ties resolve to the min linear index
    because within-frame slot order is linear-index order), dropping the
    dedicated peak segment_min and the K-wide peak-intensity broadcast
    gather for one S-wide slot gather.

Run on CPU (JAX_PLATFORMS=cpu, small shapes) to check equality only.
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
from ffs_tpu.ops.compact import compact_from_pcw_segmented
from ffs_tpu.ops.connected_components import (
    BIG,
    SpotTable,
    _segmented_run_min,
)
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


# --------------------------------------------------------------------------
# candidate CC variants
# --------------------------------------------------------------------------


def _runs(lin, width):
    k = lin.shape[0]
    slots = jnp.arange(k, dtype=jnp.int32)
    in_spot = lin < BIG
    col = lin % width
    same_run = jnp.concatenate(
        [
            jnp.zeros(1, dtype=bool),
            (lin[1:] == lin[:-1] + 1) & (col[1:] != 0) & in_spot[1:],
        ]
    )
    is_start = ~same_run
    lbl0 = jax.lax.cummax(jnp.where(is_start, slots, -1))
    return slots, is_start, lbl0


def label_v1(pixels, *, width, neighbors):
    """One fused 3K gather per round (jump rides the neighbour gather)."""
    lin = pixels.linear_index
    k = lin.shape[0]
    _, is_start, lbl0 = _runs(lin, width)
    nbu, nbd = neighbors
    nb = jnp.concatenate([nbu, nbd])

    def body(state):
        lbl, _ = state
        v = lbl[jnp.concatenate([nb, lbl])]
        prop = jnp.minimum(
            jnp.minimum(v[:k], v[k : 2 * k]), jnp.minimum(lbl, v[2 * k :])
        )
        prop = _segmented_run_min(prop, is_start)
        return prop, jnp.any(prop != lbl)

    lbl, _ = jax.lax.while_loop(lambda s: s[1], body, (lbl0, jnp.bool_(True)))
    return lbl


def label_v2(pixels, *, width, neighbors):
    """Run-level rounds: labels in run-start-slot space, per-run
    segment_min replaces the two associative run-restore scans."""
    lin = pixels.linear_index
    k = lin.shape[0]
    slots, is_start, lbl0 = _runs(lin, width)
    nbu, nbd = neighbors
    # dense run id per slot and the run-start slot for each pixel
    rid = jnp.cumsum(is_start.astype(jnp.int32)) - 1  # (K,) run id
    # run-id of each pixel's vertical neighbours (loop-invariant)
    rid_up = rid[nbu]
    rid_dn = rid[nbd]
    # labels indexed by RUN id (K-padded); initial label = run-start slot
    start_slot = jnp.where(is_start, slots, 0)
    run_start = jax.ops.segment_max(
        jnp.where(is_start, slots, -1), rid, num_segments=k
    )  # (K,) run id -> start slot (max == only)

    lblr0 = run_start  # label value = root run-start slot

    # map slot -> run label requires rid gather; fixpoint in run space
    def body(state):
        lblr, _ = state
        v = lblr[jnp.concatenate([rid_up, rid_dn])]
        m = jnp.minimum(v[:k], v[k:])
        red = jax.ops.segment_min(m, rid, num_segments=k)
        new = jnp.minimum(lblr, red)
        # pointer jump: label values are start SLOTS; translate via rid
        new = jnp.minimum(new, new[rid[new]])
        return new, jnp.any(new != lblr)

    lblr, _ = jax.lax.while_loop(lambda s: s[1], body, (lblr0, jnp.bool_(True)))
    return lblr[rid]


def spot_table_peakkey(
    pixels,
    root_slot,
    *,
    width,
    max_spots,
    dtype=jnp.float32,
    frame_rows,
    slot_modulus,
):
    """spot_table_from_pixels with the peak tie-break folded into the
    6-column segment_max via an exact composite key (u16 intensities).

    ``slot_modulus`` is the per-frame slot capacity Kf of the segmented
    compaction (frame b owns slots [b*Kf, (b+1)*Kf)); pass the total K
    for flat layouts.  Requires intensity * 2**ceil_log2(slot_modulus)
    to fit i32 — true for u16 data at any production capacity.
    """
    lin = pixels.linear_index
    k = lin.shape[0]
    slots = jnp.arange(k, dtype=jnp.int32)
    in_spot = lin < BIG

    is_root = in_spot & (root_slot == slots)
    spot_seq = jnp.cumsum(is_root.astype(jnp.int32)) - is_root.astype(jnp.int32)
    n_spots = jnp.sum(is_root.astype(jnp.int32))
    spot_id = spot_seq[root_slot]

    px_x = jnp.where(in_spot, lin % width, 0)
    row_t = lin // width
    ht = frame_rows + 1
    px_z = jnp.where(in_spot, row_t // ht, 0)
    px_y = jnp.where(in_spot, row_t - px_z * ht, 0)

    sid = jnp.where(in_spot, jnp.minimum(spot_id, max_spots), max_spots)

    inten = pixels.intensity.astype(dtype)
    fsum = jax.ops.segment_sum(
        jnp.where(
            in_spot[:, None],
            jnp.stack(
                [
                    jnp.ones_like(inten),
                    inten,
                    inten * px_x.astype(dtype),
                    inten * px_y.astype(dtype),
                ],
                axis=1,
            ),
            0,
        ),
        sid,
        num_segments=max_spots + 1,
    )[:max_spots]
    n_pixels = fsum[:, 0].astype(jnp.int32)
    sum_i, sum_ix, sum_iy = fsum[:, 1], fsum[:, 2], fsum[:, 3]

    mlog = max(1, (slot_modulus - 1).bit_length())
    mcap = jnp.int32((1 << mlog) - 1)
    local = slots % slot_modulus
    key = (pixels.intensity << mlog) + (mcap - local)

    pad6 = jnp.array([-1, -1, -BIG, -BIG, -BIG, -BIG], jnp.int32)
    imaxs = jax.ops.segment_max(
        jnp.where(
            in_spot[:, None],
            jnp.stack([px_x, px_y, key, -px_x, -px_y, -px_z], axis=1),
            pad6,
        ),
        sid,
        num_segments=max_spots + 1,
    )[:max_spots]
    x_max, y_max, kmax = imaxs[:, 0], imaxs[:, 1], imaxs[:, 2]
    x_min, y_min, z_min = -imaxs[:, 3], -imaxs[:, 4], -imaxs[:, 5]
    z_max = jnp.where(n_pixels > 0, z_min, -1)
    z_min2 = jnp.where(n_pixels > 0, z_min, BIG)

    # peak slot from the key: frame-local rank + the frame's segment base
    peak_local = mcap - (kmax & mcap)
    peak_slot = jnp.where(
        n_pixels > 0,
        jnp.where(n_pixels > 0, z_max, 0) * slot_modulus + peak_local,
        0,
    )
    peak_lin = jnp.where(
        n_pixels > 0,
        lin[jnp.clip(peak_slot, 0, k - 1)],
        BIG,
    )
    peak_x = peak_lin % width
    peak_row_t = jnp.where(peak_lin < BIG, peak_lin // width, BIG)
    peak_z = jnp.where(peak_lin < BIG, peak_row_t // ht, 0)
    peak_y = jnp.where(peak_lin < BIG, peak_row_t - peak_z * ht, BIG)

    safe_sum = jnp.where(sum_i > 0, sum_i, 1)
    valid = jnp.arange(max_spots, dtype=jnp.int32) < jnp.minimum(
        n_spots, max_spots
    )
    return SpotTable(
        n_spots=n_spots,
        valid=valid,
        n_pixels=n_pixels,
        sum_intensity=sum_i,
        com_x=sum_ix / safe_sum + 0.5,
        com_y=sum_iy / safe_sum + 0.5,
        com_z=jnp.where(n_pixels > 0, z_min2, 0).astype(dtype) + 0.5,
        x_min=x_min,
        x_max=x_max,
        y_min=y_min,
        y_max=y_max,
        z_min=z_min2,
        z_max=z_max,
        peak_x=peak_x,
        peak_y=peak_y,
        peak_z=peak_z,
    )


# --------------------------------------------------------------------------
# harness
# --------------------------------------------------------------------------


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
    print(
        f"backend={jax.default_backend()} jf={JF} B={B} reps={REPS} KF={KF}"
    )
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

        mbox = jax.block_until_ready(
            mask_box_count_extended(mask, strip=STRIP)
        )

        def run_kernel(b):
            return dispersion_extended_packed_raw(
                b, mask, 65535.0, mbox=mbox, strip=STRIP,
                interpret=not on_tpu,
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

    def make_full(label_fn, table_fn):
        def full(i, b):
            bb = vary(i, b)
            pcw = run_kernel(bb)
            hp = pcw.shape[1]
            p, nbu, nbd, counts = compact_from_pcw_segmented(
                bb, pcw, max_pixels_per_frame=KF, with_neighbors=True
            )
            root = label_fn(p, width=W, neighbors=(nbu, nbd))
            t = table_fn(p, root, hp)
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

    def base_table(p, root, hp):
        return cc.spot_table_from_pixels(
            p, root, width=W, max_spots=S, dtype=jnp.float32, frame_rows=hp
        )

    def key_table(p, root, hp):
        return spot_table_peakkey(
            p, root, width=W, max_spots=S, dtype=jnp.float32, frame_rows=hp,
            slot_modulus=KF,
        )

    # ---- equality check (bit-exact tables, all variants) ------------------
    pcw = run_kernel(batch)
    hp = pcw.shape[1]
    p, nbu, nbd, counts = compact_from_pcw_segmented(
        batch, pcw, max_pixels_per_frame=KF, with_neighbors=True
    )
    root0 = cc.label_compact_pixels(p, width=W, neighbors=(nbu, nbd))
    t0 = base_table(p, root0, hp)
    for name, lf in [("ccV1", label_v1), ("ccV2", label_v2)]:
        r = lf(p, width=W, neighbors=(nbu, nbd))
        assert (np.asarray(r) == np.asarray(root0)).all(), f"{name} roots diverge"
    tk = key_table(p, root0, hp)
    for f in t0._fields:
        a, b = np.asarray(getattr(t0, f)), np.asarray(getattr(tk, f))
        ns = int(t0.n_spots)
        if a.ndim:
            a, b = a[:ns], b[:ns]
        assert (a == b).all(), f"tblK column {f} diverges"
    print("equality checks passed (roots + table bit-exact)")

    if not on_tpu:
        return

    timeit("baseline  [= bench program]", make_full(
        lambda p, width, neighbors: cc.label_compact_pixels(
            p, width=width, neighbors=neighbors
        ), base_table), batch)
    timeit("ccV1 fused-jump gather", make_full(label_v1, base_table), batch)
    timeit("ccV2 run-level rounds", make_full(label_v2, base_table), batch)
    timeit("tblK peak-key table", make_full(
        lambda p, width, neighbors: cc.label_compact_pixels(
            p, width=width, neighbors=neighbors
        ), key_table), batch)
    timeit("ccV1 + tblK", make_full(label_v1, key_table), batch)


if __name__ == "__main__":
    main()
