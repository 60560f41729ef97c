"""Window-gather formulations for the integrator on real hardware.

Variants gather A windows of (bh, bw) from a padded (Hp, Wp) image:
  vmap_dslice   : vmap of lax.dynamic_slice (the current form)
  aligned_block : x start rounded to 32 lanes; gather (bh, 2, 32) blocks
                  from a (Hp, Wp/32, 32) view -> (A, bh, 64) windows
  row_take      : gather whole rows then lane-mask (no extraction)
"""

import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/ffs_tpu_xla")
)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    A = int(os.environ.get("N_REFL", "512"))
    REPS = int(os.environ.get("REPS", "32"))
    H, W = 2164, 2068
    bh, bw = 32, 32
    Hp, Wp = H + 2 * bh, ((W + 2 * bw + 127) // 128) * 128

    rng = np.random.default_rng(0)
    for dtype in (np.uint16, np.float32):
        img = jnp.asarray(rng.integers(0, 100, (Hp, Wp)).astype(dtype))
        img3 = jnp.asarray(
            rng.integers(0, 100, (3, Hp, Wp)).astype(np.float32)
        )
        x0 = jnp.asarray(rng.integers(0, W, A))
        y0 = jnp.asarray(rng.integers(0, H, A))

        def timeit(name, fn, *a):
            @jax.jit
            def chained(x0_, y0_, *rest):
                def body(i, acc):
                    out = fn((x0_ + i) % W, y0_, *rest)
                    return acc + sum(
                        jnp.sum(o).astype(jnp.float32)
                        for o in jax.tree.leaves(out)
                    )

                return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

            jax.block_until_ready(chained(*a))
            t0 = time.perf_counter()
            jax.block_until_ready(chained(*a))
            dt = (time.perf_counter() - t0) / REPS
            print(
                f"{np.dtype(dtype).name:>8s} {name:>14s}: {dt * 1e3:7.2f} ms "
                f"({A / dt:9.0f} win/s)",
                flush=True,
            )

        def vmap_dslice(x0_, y0_):
            return (
                jax.vmap(
                    lambda yy, xx: jax.lax.dynamic_slice(img, (yy, xx), (bh, bw))
                )(y0_ + bh, x0_ + bw).astype(jnp.int32),
            )

        timeit("vmap_dslice", vmap_dslice, x0, y0)

        imgb = img.reshape(Hp, Wp // 32, 32)

        def aligned_block(x0_, y0_):
            xa = (x0_ + bw) // 32
            return (
                jax.vmap(
                    lambda yy, xx: jax.lax.dynamic_slice(
                        imgb, (yy, xx, 0), (bh, 2, 32)
                    )
                )(y0_ + bh, xa).astype(jnp.int32),
            )

        timeit("aligned_block", aligned_block, x0, y0)

        imgb128 = img.reshape(Hp, Wp // 128, 128)

        def aligned128(x0_, y0_):
            xa = (x0_ + bw) // 128
            return (
                jax.vmap(
                    lambda yy, xx: jax.lax.dynamic_slice(
                        imgb128, (yy, xx, 0), (bh, 2, 128)
                    )
                )(y0_ + bh, xa).astype(jnp.int32),
            )

        timeit("aligned128", aligned128, x0, y0)

        def row_take(x0_, y0_):
            rows = jnp.take(img, (y0_[:, None] + jnp.arange(bh)).reshape(-1), axis=0)
            return (rows.astype(jnp.int32),)

        timeit("row_take", row_take, x0, y0)

        if dtype == np.float32:

            def field3(x0_, y0_):
                return (
                    jax.vmap(
                        lambda yy, xx: jax.lax.dynamic_slice(
                            img3, (0, yy, xx), (3, bh + 1, bw + 1)
                        )
                    )(y0_, x0_),
                )

            timeit("field3_dslice", field3, x0, y0)

            img3b = img3.reshape(3, Hp, Wp // 32, 32)

            def field3_aligned(x0_, y0_):
                xa = x0_ // 32
                return (
                    jax.vmap(
                        lambda yy, xx: jax.lax.dynamic_slice(
                            img3b, (0, yy, xx, 0), (3, bh + 8, 2, 32)
                        )
                    )(y0_, xa),
                )

            timeit("field3_aligned", field3_aligned, x0, y0)
    return 0


if __name__ == "__main__":
    main()
