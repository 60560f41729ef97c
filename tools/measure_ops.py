"""Measure the TPU sparse-op cost model that shapes the spotfind pipeline.

Every claim in CLAUDE.md's perf notes ("gathers ~70-130 us, latency-bound",
"sorts 27 us", "superlinear past 8k") comes from harnesses like this one.
Honest-measurement rules: every op is chained REPS times inside ONE jitted
fori_loop with a loop-counter-dependent input, and the result feeds an
accumulator the caller consumes — no hoisting, no DCE.

Run on the TPU:  python tools/measure_ops.py [section ...]
"""

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/ffs_tpu_xla")
)

import jax
import jax.numpy as jnp
import numpy as np

REPS = int(os.environ.get("REPS", "50"))


def timeit(name, fn, *args):
    """fn(i, *args) -> scalar contribution; chained REPS times in one jit."""

    @jax.jit
    def chained(*a):
        def body(i, acc):
            return acc + fn(i, *a)

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    jax.block_until_ready(chained(*args))  # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(chained(*args))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:58s} {dt * 1e6:10.1f} us")
    return dt


def main():
    sections = set(sys.argv[1:]) or {
        "gather", "slice", "sort", "segment", "scatter", "scan", "loop"
    }
    print(f"backend={jax.default_backend()} reps={REPS}")
    rng = np.random.default_rng(0)
    TAB = jnp.asarray(rng.integers(0, 1000, 1 << 24).astype(np.int32))

    if "gather" in sections:
        for n in (1024, 2048, 4096, 8192, 16384, 32768, 65536, 131072):
            idx = jnp.asarray(
                rng.integers(0, 1 << 24, n).astype(np.int32)
            )

            def f(i, tab, ix):
                return jnp.sum(tab[(ix + i) & ((1 << 24) - 1)]).astype(jnp.float32)

            timeit(f"gather 1d n={n} from 16M", f, TAB, idx)

    if "slice" in sections:
        H, S = 4148, 160
        tab2 = jnp.asarray(rng.integers(0, 1000, (H, S)).astype(np.int32))
        for n in (8192, 24576):
            for s in (1, 4, 8, 16, 32, 64, 137):
                idx = jnp.asarray(rng.integers(0, H, n).astype(np.int32))

                def f(i, tab, ix, s=s):
                    rows = tab[(ix + i) % H, :s]
                    return jnp.sum(rows).astype(jnp.float32)

                timeit(f"slice-gather ({n},{s}) rows from ({H},{S})", f, tab2, idx)

    if "sort" in sections:
        for n in (8192, 24576, 65536, 131072, 262144, 589824):
            keys = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
            pay = jnp.arange(n, dtype=jnp.int32)

            def f(i, k, p):
                sk, sp = jax.lax.sort((k + i, p), dimension=0, num_keys=1)
                return (sk[0] + sp[-1]).astype(jnp.float32)

            timeit(f"sort (key,payload) n={n}", f, keys, pay)

    if "segment" in sections:
        for n, m in ((8192, 4096), (24576, 4096), (24576, 16384), (65536, 16384)):
            seg = jnp.asarray(np.sort(rng.integers(0, m, n)).astype(np.int32))
            val = jnp.asarray(rng.random(n).astype(np.float32))
            val4 = jnp.stack([val, val + 1, val + 2, val + 3], axis=1)

            def f1(i, v, s):
                return jnp.sum(
                    jax.ops.segment_sum(v + i, s, num_segments=m)
                )

            def f4(i, v, s):
                return jnp.sum(
                    jax.ops.segment_sum(v + i, s, num_segments=m)
                )

            timeit(f"segment_sum (n={n},) -> {m} (sorted ids)", f1, val, seg)
            timeit(f"segment_sum (n={n},4) -> {m} (sorted ids)", f4, val4, seg)

    if "scatter" in sections:
        for n, m in ((4148, 8192), (8192, 8192), (24576, 24576)):
            idx = jnp.asarray(rng.integers(0, m, n).astype(np.int32))

            def f(i, ix):
                h = jnp.zeros(m, jnp.int32).at[(ix + i) % m].add(1)
                return h[0].astype(jnp.float32)

            timeit(f"scatter-add n={n} -> {m}", f, idx)

    if "scan" in sections:
        for n in (8192, 24576, 65536):
            val = jnp.asarray(rng.random(n).astype(np.float32))

            def f(i, v):
                return jnp.cumsum(v + i)[n - 1]

            def g(i, v):
                return jax.lax.cummax(v + i)[n - 1]

            timeit(f"cumsum n={n}", f, val)
            timeit(f"cummax n={n}", g, val)

    if "loop" in sections:
        # while_loop round-trip overhead (the CC convergence loop shape)
        val = jnp.asarray(rng.random(8192).astype(np.float32))

        def f(i, v):
            def cond(s):
                return s[1] < 5

            def body(s):
                x, c = s
                return x * 0.5 + i, c + 1

            out, _ = jax.lax.while_loop(cond, body, (v, 0))
            return out[0]

        timeit("while_loop 5 iters of elementwise 8k", f, val)


if __name__ == "__main__":
    main()
