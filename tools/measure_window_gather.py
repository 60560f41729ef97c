"""Window-gather layout A/B on the TPU.

The integrator's multi-plane window gather is descriptor-bound at
production shapes (P=4, bh=24, A=2048): each window DMA is P*bh = 96
strided 1 KB segments, and the nowin probe (measure_int_variants.py)
prices the whole gather at 2.3 ms of the 5.1 ms block step (~130 GB/s
effective).  Candidates:

- pf            : production plane-first kernel (window_gather_planes)
- pl+transpose  : plane-last kernel, paying the (F, Hp, Wp) ->
                  (Hp, Wb, F, 128) transpose inside every rep (the
                  honest single-chunk cost: production transposes once
                  per resident frame block)
- pl_pre        : plane-last kernel on a pre-transposed source (steady
                  state when several chunks share one frame block)

Bitwise equality of all variants is asserted before timing.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/ffs_tpu_xla")
)

import numpy as np

A = 2048
F = 4
BH = 24
H, W = 2164, 2068
REPS = int(os.environ.get("FFS_BENCH_REPS", "32"))


def make_probe_gather(jnp_mod, *, single_only: bool, r: int = 8,
                      slots: int = 2):
    """Tool-local copy of the plane-first kernel with probe knobs.

    single_only: ALWAYS issue one 128-lane-block DMA per window (timing
    upper bound for the conditional-second-block design; tail lanes are
    garbage, results wrong past 128-shift lanes).
    r: windows per grid program.
    slots: DMA pipeline depth — program i starts program i+slots-1's
    DMAs, so up to (slots-1)*r window DMAs are in flight while one
    program's worth is consumed (production kernel: slots=2).
    """
    import functools

    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jnp = jnp_mod

    def kernel(y0_ref, xblk_ref, shift_ref, img_hbm, out_ref, tiles, sems,
               *, p, bh):
        i = pl.program_id(0)
        n = pl.num_programs(0)
        zero = jnp.asarray(0, jnp.int32)
        nblk = 1 if single_only else 2
        look = slots - 1

        def start_dmas(slot, prog):
            for rr in range(r):
                a = prog * r + rr
                ri = jnp.asarray(rr, jnp.int32)
                pltpu.make_async_copy(
                    img_hbm.at[
                        pl.ds(zero, p),
                        pl.ds(y0_ref[a], bh),
                        pl.ds(xblk_ref[a], nblk),
                        pl.ds(zero, 128),
                    ],
                    tiles.at[slot, ri],
                    sems.at[slot, ri],
                ).start()

        slot = jax.lax.rem(i, jnp.asarray(slots, i.dtype))

        @pl.when(i == 0)
        def _():
            for k in range(look):
                start_dmas(jnp.asarray(k, jnp.int32), k)

        @pl.when(i + look < n)
        def _():
            start_dmas(
                jax.lax.rem(i + look, jnp.asarray(slots, i.dtype)), i + look
            )

        lane = jax.lax.broadcasted_iota(jnp.int32, (bh, 128), 1)
        for rr in range(r):
            ri = jnp.asarray(rr, jnp.int32)
            a = i * r + rr
            pltpu.make_async_copy(
                img_hbm.at[
                    pl.ds(zero, p),
                    pl.ds(y0_ref[a], bh),
                    pl.ds(xblk_ref[a], nblk),
                    pl.ds(zero, 128),
                ],
                tiles.at[slot, ri],
                sems.at[slot, ri],
            ).wait()
            sh = shift_ref[a]
            sel = lane < 128 - sh
            for q in range(p):
                qi = jnp.asarray(q, jnp.int32)
                t0 = tiles[slot, ri, qi, :, zero, :]
                r0 = pltpu.roll(t0, -sh, 1)
                if single_only:
                    out_ref[rr, q] = r0
                else:
                    t1 = tiles[slot, ri, qi, :, jnp.asarray(1, jnp.int32), :]
                    r1 = pltpu.roll(t1, -sh, 1)
                    out_ref[rr, q] = jnp.where(sel, r0, r1)

    @functools.partial(jax.jit, static_argnames=("bh",))
    def gather(img, y0, x0, *, bh):
        p, hp, wp = img.shape
        a = y0.shape[0]
        ap = ((a + r - 1) // r) * r
        y0p = jnp.pad(y0.astype(jnp.int32), (0, ap - a))
        x0p = jnp.pad(x0.astype(jnp.int32), (0, ap - a))
        xblk = jnp.minimum(x0p >> 7, wp // 128 - 2)
        shift = x0p - (xblk << 7)
        nblk = 1 if single_only else 2
        return pl.pallas_call(
            functools.partial(kernel, p=p, bh=bh),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(ap // r,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(
                    (r, p, bh, 128),
                    lambda i, *_: (i,) + (jnp.asarray(0, jnp.int32),) * 3,
                ),
                scratch_shapes=[
                    pltpu.VMEM((slots, r, p, bh, nblk, 128), img.dtype),
                    pltpu.SemaphoreType.DMA((slots, r)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((ap, p, bh, 128), jnp.int32),
        )(y0p, xblk, shift, img.reshape(p, hp, wp // 128, 128))[:a]

    return gather


def main() -> int:
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from ffs_tpu.ops.window_gather import (
        window_gather_planes,
        window_gather_planes_pl,
    )

    rng = np.random.default_rng(7)
    hp = ((H + BH + 7) // 8) * 8
    wp = ((W + 255) // 128) * 128
    wb = wp // 128
    frames = jnp.asarray(
        rng.integers(0, 60000, size=(F, hp, wp), dtype=np.uint16)
    ).astype(jnp.int32)
    y0 = jnp.asarray(rng.integers(0, H - BH, size=A, dtype=np.int32))
    x0 = jnp.asarray(rng.integers(0, W - 128, size=A, dtype=np.int32))

    to_pl = jax.jit(
        lambda fr: fr.reshape(F, hp, wb, 128).transpose(1, 2, 0, 3)
    )

    ref = np.asarray(window_gather_planes(frames, y0, x0, bh=BH))
    got = np.asarray(window_gather_planes_pl(to_pl(frames), y0, x0, bh=BH))
    assert (ref == got).all(), "plane-last gather mismatch"
    print("pf == pl: bitwise identical", flush=True)

    if jax.default_backend() != "tpu":
        print("not on TPU; skipping timing")
        return 0

    def timeit(name, body_fn, *args):
        @jax.jit
        def chained(fr, *rest):
            def body(i, acc):
                return acc + body_fn(fr + (i & 1), *rest)

            return jax.lax.fori_loop(0, REPS, body, jnp.float64(0.0))

        jax.block_until_ready(chained(*args))
        t0 = time.perf_counter()
        jax.block_until_ready(chained(*args))
        dt = (time.perf_counter() - t0) / REPS
        print(f"{name:14s} {dt * 1e3:8.3f} ms/rep", flush=True)
        return dt

    timeit(
        "pf",
        lambda fr: window_gather_planes(fr, y0, x0, bh=BH)
        .sum()
        .astype(jnp.float64),
        frames,
    )
    timeit(
        "pl+transpose",
        lambda fr: window_gather_planes_pl(to_pl(fr), y0, x0, bh=BH)
        .sum()
        .astype(jnp.float64),
        frames,
    )
    frames_pl = to_pl(frames)
    timeit(
        "pl_pre",
        lambda fr: window_gather_planes_pl(fr, y0, x0, bh=BH)
        .sum()
        .astype(jnp.float64),
        frames_pl,
    )

    # Bytes-reduction upper bound: ALWAYS one 128-lane block per window
    # (results wrong for shifted windows; timing-only).  If this doesn't
    # beat pf by much, a conditional second-block DMA can't either.
    single = make_probe_gather(jnp, single_only=True)
    double = make_probe_gather(jnp, single_only=False)
    got2 = np.asarray(double(frames, y0, x0, bh=BH))
    assert (ref == got2).all(), "probe double-block gather mismatch"
    print("probe(double) == pf: bitwise identical", flush=True)
    timeit(
        "probe_double",
        lambda fr: double(fr, y0, x0, bh=BH).sum().astype(jnp.float64),
        frames,
    )
    timeit(
        "probe_single",
        lambda fr: single(fr, y0, x0, bh=BH).sum().astype(jnp.float64),
        frames,
    )
    for rr in (4, 16):
        g = make_probe_gather(jnp, single_only=False, r=rr)
        timeit(
            f"probe_r{rr}",
            lambda fr, g=g: g(fr, y0, x0, bh=BH).sum().astype(jnp.float64),
            frames,
        )
    # DMA pipeline depth: if the gather is latency-chain-bound (one
    # program of lookahead = ~8-16 DMAs in flight), deeper lookahead
    # should recover bandwidth; if the DMA engines are already saturated
    # it will be neutral.
    for ss, rr in ((4, 8), (8, 8), (4, 16), (16, 4)):
        g = make_probe_gather(jnp, single_only=False, r=rr, slots=ss)
        got3 = np.asarray(g(frames, y0, x0, bh=BH))
        assert (ref == got3).all(), f"slots={ss} r={rr} mismatch"
        timeit(
            f"probe_s{ss}_r{rr}",
            lambda fr, g=g: g(fr, y0, x0, bh=BH).sum().astype(jnp.float64),
            frames,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
