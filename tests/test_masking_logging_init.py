"""Unit tests for the three small runtime modules with no direct coverage:
ops/masking (resolution filter, reference masking.cu:27-186),
utils/logging (FFSLogger-equivalent sink selection) and utils/jaxinit
(CLI JAX runtime setup)."""

import logging
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np

from ffs_tpu.ops.masking import resolution_mask
from ffs_tpu.utils.logging import setup_logging


def _oracle(mask, wl, dist, bcx, bcy, psx, psy, dmin, dmax):
    """Independent per-pixel NumPy restatement of the masking.cu formula."""
    h, w = mask.shape
    out = np.zeros((h, w), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            dy = (y + 0.5 - bcy) * psy
            dx = (x + 0.5 - bcx) * psx
            r = np.sqrt(dx * dx + dy * dy)
            d = wl / (2.0 * np.sin(0.5 * np.arctan(r / dist)))
            keep = mask[y, x] != 0
            if dmin > 0:
                keep = keep and d >= dmin
            if dmax > 0:
                keep = keep and d <= dmax
            out[y, x] = 1 if keep else 0
    return out


def test_resolution_mask_matches_bruteforce_oracle():
    rng = np.random.default_rng(7)
    mask = (rng.random((24, 40)) > 0.1).astype(np.uint8)
    geom = dict(
        wl=0.976, dist=0.25, bcx=21.3, bcy=11.7, psx=75e-6, psy=75e-6
    )
    for dmin, dmax in [(-1.0, -1.0), (3.0, -1.0), (-1.0, 40.0), (3.0, 40.0)]:
        got = np.asarray(
            resolution_mask(
                jnp.asarray(mask),
                geom["wl"], geom["dist"], geom["bcx"], geom["bcy"],
                geom["psx"], geom["psy"], dmin=dmin, dmax=dmax,
            )
        )
        want = _oracle(mask, *geom.values(), dmin, dmax)
        np.testing.assert_array_equal(got, want, err_msg=f"dmin={dmin} dmax={dmax}")
    # disabled filters: pure passthrough of the input mask
    got = np.asarray(
        resolution_mask(
            jnp.asarray(mask), geom["wl"], geom["dist"], geom["bcx"],
            geom["bcy"], geom["psx"], geom["psy"],
        )
    )
    np.testing.assert_array_equal(got, mask)


def test_resolution_mask_never_unmasks():
    mask = np.zeros((8, 8), dtype=np.uint8)
    got = np.asarray(
        resolution_mask(jnp.asarray(mask), 1.0, 0.2, 4.0, 4.0, 75e-6, 75e-6,
                        dmin=1.0, dmax=100.0)
    )
    assert got.sum() == 0


def test_setup_logging_plain_format_and_level(tmp_path, monkeypatch, capsys):
    """Non-TTY (container) sessions log bare messages for Graylog; LOG_LEVEL
    sets the threshold; the rotating file sink records formatted lines."""
    monkeypatch.setenv("LOG_LEVEL", "warning")
    monkeypatch.chdir(tmp_path)
    log = setup_logging(name="ffs_test_plain", log_file=str(tmp_path / "f.txt"))
    assert log.level == logging.WARNING
    log.info("hidden")
    log.warning("shown-bare")
    out = capsys.readouterr().out
    assert "hidden" not in out
    assert "shown-bare" in out
    # container mode: the stdout record is the bare message, no level prefix
    assert "WARNING shown-bare" not in out
    content = (tmp_path / "f.txt").read_text()
    assert "WARNING shown-bare" in content and "hidden" not in content
    # idempotent: re-setup must not duplicate handlers
    n = len(log.handlers)
    assert len(setup_logging(name="ffs_test_plain").handlers) == n


def test_setup_logging_unwritable_file_falls_back(monkeypatch):
    monkeypatch.delenv("LOG_LEVEL", raising=False)
    log = setup_logging(name="ffs_test_nofile", log_file="/proc/nope/f.txt")
    assert log.level == logging.INFO
    assert not any(
        isinstance(h, logging.handlers.RotatingFileHandler) for h in log.handlers
    )


def test_jaxinit_honours_platform_env_and_x64():
    """jaxinit.setup in a fresh process: JAX_PLATFORMS=cpu stays on CPU
    (no duplicate append of 'cpu'), x64 lands enabled, and the compilation
    cache dir is set."""
    code = (
        "from ffs_tpu.utils import jaxinit; jaxinit.setup()\n"
        "import jax\n"
        "assert jax.config.jax_platforms == 'cpu', jax.config.jax_platforms\n"
        "assert jax.devices()[0].platform == 'cpu'\n"
        "assert jax.config.jax_enable_x64\n"
        "assert jax.config.jax_compilation_cache_dir\n"
        "print('OK')\n"
    )
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True
    )
    assert out.returncode == 0, out.stderr
    assert "OK" in out.stdout


def test_jaxinit_keeps_cpu_registered_alongside_accelerators():
    """An accelerator-only JAX_PLATFORMS list gains a low-priority cpu entry
    so host-pinned f64 work (candidate refinement) can run.  Exercised with
    a fake platform name ahead of cpu: the config string must carry both."""
    code = (
        "from ffs_tpu.utils import jaxinit; jaxinit.setup()\n"
        "import jax\n"
        # read the config string only: 'fakeaccel' has no backend to init
        "assert jax.config.jax_platforms == 'fakeaccel,cpu', "
        "jax.config.jax_platforms\n"
        "print('OK')\n"
    )
    env = {**os.environ, "JAX_PLATFORMS": "fakeaccel"}
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True
    )
    assert out.returncode == 0, out.stderr
    assert "OK" in out.stdout
