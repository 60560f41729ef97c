"""Test configuration: force a virtual 8-device CPU platform.

Multi-chip sharding is validated on a host-platform device mesh (the real
deployment runs one process per TPU chip; see ffs_tpu/parallel).  Keep this
before any jax import.
"""

import os

# force CPU: the machine environment may export JAX_PLATFORMS=axon (TPU)
os.environ["JAX_PLATFORMS"] = "cpu"

# CLI tests spawn `python -m ffs_tpu...` subprocesses: make the package
# importable there even when it is not pip-installed (fresh machines)
_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_pp = os.environ.get("PYTHONPATH", "")
if _repo_root not in _pp.split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        _repo_root + (os.pathsep + _pp if _pp else "")
    )
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon TPU plugin ignores the JAX_PLATFORMS env var; force via config
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def small_frame(rng):
    """A small synthetic frame with a module-gap mask and a few spots."""
    h, w = 256, 320
    image = rng.poisson(5.0, size=(h, w)).astype(np.uint16)
    # a handful of Gaussian-ish spots
    for cy, cx, amp in [(40, 60, 300), (100, 200, 800), (200, 80, 150), (128, 128, 2000)]:
        yy, xx = np.mgrid[-4:5, -4:5]
        g = amp * np.exp(-(yy**2 + xx**2) / 3.0)
        image[cy - 4 : cy + 5, cx - 4 : cx + 5] += rng.poisson(g).astype(np.uint16)
    mask = np.ones((h, w), dtype=np.uint8)
    mask[120:130, :] = 0  # module gap band
    mask[:, 150:155] = 0
    image[mask == 0] = 0
    return image, mask
