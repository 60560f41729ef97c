"""Distinguish gather cost into LOOP-INVARIANT vs FRESHLY-COMPUTED tables.

Hypothesis from measure_ops.py: gathers into a constant table are ~2 us
(table staged to VMEM once), while the r1 pipeline's ~70-130 us/gather came
from gathering into per-frame-fresh arrays (rowcum), i.e. the cost is the
table's HBM residency, not the gather itself.
"""

import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/ffs_tpu_xla")
)

import jax
import jax.numpy as jnp
import numpy as np

REPS = int(os.environ.get("REPS", "50"))


def timeit(name, fn, *args):
    @jax.jit
    def chained(*a):
        def body(i, acc):
            return acc + fn(i, *a)

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    jax.block_until_ready(chained(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(chained(*args))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:64s} {dt * 1e6:10.1f} us")
    return dt


def main():
    print(f"backend={jax.default_backend()} reps={REPS}")
    rng = np.random.default_rng(0)

    for tab_elems, label in (
        (1 << 19, "2MB"),
        (1 << 22, "16MB"),
        (18_100_000, "72MB(rowcum-like)"),
    ):
        tab = jnp.asarray(rng.integers(0, 1000, tab_elems).astype(np.int32))
        for n in (8192, 24576):
            idx = jnp.asarray(rng.integers(0, tab_elems, n).astype(np.int32))

            # fresh table: +i forces recompute each iteration (one pass over
            # the table) — the gather then reads a non-resident array.
            def f_fresh(i, t, ix):
                t2 = t + i
                return jnp.sum(t2[ix]).astype(jnp.float32)

            # baseline: the same elementwise pass WITHOUT the gather, to
            # subtract the table-recompute cost itself.
            def f_pass(i, t, ix):
                t2 = t + i
                return (t2[0] + t2[tab_elems - 1]).astype(jnp.float32)

            # chained gathers into the SAME fresh table (bsearch shape):
            # 13 dependent gathers
            def f_chain(i, t, ix):
                t2 = t + i
                v = ix
                for _ in range(13):
                    v = t2[v % tab_elems] + v
                return jnp.sum(v).astype(jnp.float32)

            timeit(f"tab={label} n={n}: 1 gather into fresh table", f_fresh, tab, idx)
            timeit(f"tab={label} n={n}: recompute pass only", f_pass, tab, idx)
            timeit(f"tab={label} n={n}: 13 chained gathers (fresh)", f_chain, tab, idx)


if __name__ == "__main__":
    main()
