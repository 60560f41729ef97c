"""Common JAX runtime initialisation for CLI entry points."""

from __future__ import annotations

import logging
import os
import warnings


def setup(x64: bool = True) -> None:
    """Quiet logging, honour JAX_PLATFORMS (the axon TPU plugin ignores the
    env var), enable x64 and the persistent compilation cache."""
    logging.getLogger("jax._src.xla_bridge").setLevel(logging.ERROR)
    warnings.filterwarnings("ignore")
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        plats = os.environ["JAX_PLATFORMS"]
        # keep the host CPU backend registered (lowest priority): small
        # f64 host workloads (candidate refinement's 3x3 inversions, the
        # model rebuilds) pin themselves to jax.devices("cpu"), which a
        # bare accelerator-only platform list would hide
        if "cpu" not in [p.strip() for p in plats.split(",") if p.strip()]:
            plats = f"{plats},cpu"
        jax.config.update("jax_platforms", plats)
    if x64:
        jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get(
                "JAX_COMPILATION_CACHE_DIR",
                os.path.expanduser("~/.cache/ffs_tpu_xla"),
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
