"""Attribute the flat-compaction cost to its pieces on real hardware.

Inline variants of compact_from_pcw_flat (same arithmetic, switchable
pieces) so each row differs from the baseline by exactly one piece; all
rows include the packed kernel, keeping the comparisons within full
candidate programs (cross-program deltas mislead — CLAUDE.md).

Pieces:
  * rowfind: dhist (scatter-add histogram + cumsum) vs searchsorted
  * neighbors: the 5K-point pcw lookups for vertical neighbour slots
  * intensity: the per-frame barrier'd-table gather loop
"""

import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/ffs_tpu_xla")
)

import jax
import jax.numpy as jnp
import numpy as np

from ffs_tpu.constants import E2XE_16M_FAST, E2XE_16M_SLOW
from ffs_tpu.io import sample_data
from ffs_tpu.ops.compact import _select_bit
from ffs_tpu.ops.connected_components import BIG
from ffs_tpu.ops.dispersion_pallas import dispersion_packed_raw, mask_box_count

H, W = E2XE_16M_SLOW, E2XE_16M_FAST
B = int(os.environ.get("B", "8"))
REPS = int(os.environ.get("REPS", "16"))
K = int(os.environ.get("K", "24576"))
STRIP = int(os.environ.get("STRIP", "128"))


def compact_variant(
    images, pcw, k, *, neighbors=True, intensity=True, rowfind="dhist",
    upstart="pcw",
):
    Bn, h, nwl2 = pcw.shape
    nwl = nwl2 // 2
    h_img, w = images.shape[-2], images.shape[-1]
    ht = h + 1
    row_counts = pcw[:, :, nwl - 1]
    flat_counts = jnp.pad(row_counts, ((0, 0), (0, 1))).reshape(-1)
    row_end = jnp.cumsum(flat_counts)
    count = row_end[-1]
    ks = jnp.arange(1, k + 1, dtype=jnp.int32)
    valid = ks <= count

    if rowfind == "dhist":
        dhist = jnp.zeros(k + 1, jnp.int32).at[jnp.clip(row_end, 0, k)].add(1)
        row_t = jnp.cumsum(dhist)[:k]
    else:
        row_t = jnp.searchsorted(row_end, ks, side="left").astype(jnp.int32)
    row_tc = jnp.clip(row_t, 0, Bn * ht - 1)
    prev_end = jnp.where(
        row_tc > 0, row_end[jnp.clip(row_tc - 1, 0, Bn * ht - 1)], 0
    )
    rank = ks - prev_end

    b_idx = row_tc // ht
    y_idx = jnp.minimum(row_tc - b_idx * ht, h - 1)
    prow = b_idx * h + y_idx
    prow_img = b_idx * h_img + jnp.minimum(y_idx, h_img - 1)

    rows = pcw.reshape(-1, nwl2)[prow]
    pc_rows = rows[:, :nwl]
    w_rows = rows[:, nwl:]
    below = pc_rows < rank[:, None]
    jw = jnp.sum(below.astype(jnp.int32), axis=1)
    jw_c = jnp.clip(jw, 0, nwl - 1)
    before = jnp.max(jnp.where(below, pc_rows, 0), axis=1)
    onehot = jnp.arange(nwl, dtype=jnp.int32)[None, :] == jw_c[:, None]
    word = jnp.sum(jnp.where(onehot, w_rows, 0), axis=1)
    bit = _select_bit(word, rank - before)
    col = jnp.clip(jw_c * 32 + bit, 0, w - 1)
    lin = jnp.where(valid, row_tc * w + col, BIG).astype(jnp.int32)

    acc = jnp.sum(lin % 97) + count
    if intensity == "pair32":
        # bitcast each u16 frame to i32 pixel PAIRS so the point gather
        # rides the fast 32-bit path; select the 16-bit half afterwards
        local = jnp.clip((prow_img - b_idx * h_img) * w + col, 0, h_img * w - 1)
        inten = jnp.zeros(k, jnp.int32)
        for b in range(Bn):
            tab = jax.lax.optimization_barrier(
                jax.lax.bitcast_convert_type(
                    images[b].reshape(-1, 2), jnp.int32
                )
            )
            wordv = tab[local >> 1]
            val = (wordv >> ((local & 1) * 16)) & 0xFFFF
            inten = jnp.where(b_idx == b, val, inten)
        acc = acc + jnp.sum(jnp.where(valid, inten, 0))
    elif intensity:
        local = jnp.clip((prow_img - b_idx * h_img) * w + col, 0, h_img * w - 1)
        inten = jnp.zeros(k, jnp.int32)
        for b in range(Bn):
            tab = jax.lax.optimization_barrier(images[b].reshape(-1))
            inten = jnp.where(b_idx == b, tab[local].astype(jnp.int32), inten)
        acc = acc + jnp.sum(jnp.where(valid, inten, 0))
    if neighbors:
        pcwf = pcw.reshape(-1)
        size = Bn * h * nwl2
        up_base = (prow - 1) * nwl2
        dn_base = (prow + 1) * nwl2
        parts = [
            up_base + nwl + jw_c,
            jnp.where(jw_c > 0, up_base + jw_c - 1, 0),
            up_base + nwl - 1,
            dn_base + nwl + jw_c,
            jnp.where(jw_c > 0, dn_base + jw_c - 1, 0),
        ]
        if upstart == "rowend":
            # derive row_start_up = row_end[rt-2] from the tiny row_end
            # array instead of a 5th point lookup into the big pcw
            del parts[2]
        lookups = jnp.concatenate(parts)
        g = pcwf[jnp.clip(lookups, 0, size - 1)]
        if upstart == "rowend":
            word_up, pc_up_prev, word_dn, pc_dn_prev = jnp.split(g, 4)
            row_start_up = jnp.where(
                row_tc >= 2, row_end[jnp.clip(row_tc - 2, 0, Bn * ht - 1)], 0
            )
        else:
            word_up, pc_up_prev, row_up_cnt, word_dn, pc_dn_prev = jnp.split(
                g, 5
            )
            row_start_up = prev_end - row_up_cnt
        pc_up_prev = jnp.where(jw_c > 0, pc_up_prev, 0)
        pc_dn_prev = jnp.where(jw_c > 0, pc_dn_prev, 0)
        low_mask = jnp.where(bit == 0, 0, (jnp.int32(1) << bit) - 1)
        slots = jnp.arange(k, dtype=jnp.int32)
        has_up = valid & (y_idx > 0) & (((word_up >> bit) & 1) == 1)
        rank_up = pc_up_prev + jax.lax.population_count(word_up & low_mask) + 1
        nbu = jnp.where(has_up, row_start_up + rank_up - 1, slots)
        has_dn = valid & (y_idx < h - 1) & (((word_dn >> bit) & 1) == 1)
        rank_dn = pc_dn_prev + jax.lax.population_count(word_dn & low_mask) + 1
        nbd = jnp.where(
            has_dn, prev_end + pc_rows[:, nwl - 1] + rank_dn - 1, slots
        )
        acc = acc + jnp.sum(nbu) % 11 + jnp.sum(nbd) % 13
    return acc.astype(jnp.float32)


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
    print(f"backend={jax.default_backend()} B={B} reps={REPS} strip={STRIP}")
    rng = np.random.default_rng(12)
    base = rng.poisson(2.0, size=(H, W)).astype(np.uint16)
    mask_np = sample_data.generate_mask()
    frames = []
    for _ in range(B):
        f = base.copy()
        ys = rng.integers(8, H - 8, 300)
        xs = rng.integers(8, W - 8, 300)
        for yy, xx in zip(ys, xs):
            f[yy - 1 : yy + 2, xx - 1 : xx + 2] += rng.poisson(
                60.0, size=(3, 3)
            ).astype(np.uint16)
        f[mask_np == 0] = 0
        frames.append(f)
    batch = jax.device_put(jnp.asarray(np.stack(frames)))
    mask = jnp.asarray(mask_np)
    mbox = jax.block_until_ready(mask_box_count(mask))

    def vary(i, b):
        return b + (i & 1).astype(b.dtype)

    def kern(i, b):
        pcw = dispersion_packed_raw(
            vary(i, b), mask, 65535.0, mbox=mbox, trim=False, strip=STRIP
        )
        nwl = pcw.shape[-1] // 2
        return (jnp.sum(pcw[:, :, nwl - 1]) + jnp.sum(pcw[0, 0])).astype(
            jnp.float32
        )

    def kc(**kw):
        def f(i, b):
            bb = vary(i, b)
            pcw = dispersion_packed_raw(
                bb, mask, 65535.0, mbox=mbox, trim=False, strip=STRIP
            )
            return compact_variant(bb, pcw, K, **kw)

        return f

    if os.environ.get("PAIR32"):
        a = jax.jit(lambda b: kc()(jnp.int32(0), b))(batch)
        b2 = jax.jit(lambda b: kc(intensity="pair32")(jnp.int32(0), b))(batch)
        print(f"pair32 parity: {float(a)} == {float(b2)} -> {float(a) == float(b2)}",
              flush=True)
        timeit("+ compact FULL, u16 intensity gather", kc(), batch)
        timeit(
            "+ compact FULL, i32-pair intensity gather",
            kc(intensity="pair32"),
            batch,
        )
        return
    if os.environ.get("UPSTART"):
        a = jax.jit(lambda b: kc()(jnp.int32(0), b))(batch)
        b2 = jax.jit(lambda b: kc(upstart="rowend")(jnp.int32(0), b))(batch)
        print(
            f"upstart parity: {float(a)} == {float(b2)} -> "
            f"{float(a) == float(b2)}",
            flush=True,
        )
        timeit("+ compact FULL, row_up_cnt from pcw (5K)", kc(), batch)
        timeit(
            "+ compact FULL, row_start_up from row_end (4K)",
            kc(upstart="rowend"),
            batch,
        )
        return
    timeit("kernel+pack only", kern, batch)
    timeit("+ compact FULL (dhist, intensity, neighbours)", kc(), batch)
    timeit("+ compact, no neighbours", kc(neighbors=False), batch)
    timeit("+ compact, no intensity", kc(intensity=False), batch)
    timeit("+ compact, searchsorted rowfind", kc(rowfind="ss"), batch)


if __name__ == "__main__":
    main()
