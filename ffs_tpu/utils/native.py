"""Loader for the native decode library (csrc/ffs_native.cpp).

Builds the shared object on first use with the system compiler and caches it
next to the source; falls back cleanly (callers check ``lib() is None`` and
use the NumPy implementations in :mod:`ffs_tpu.io.compression`).
"""

from __future__ import annotations

import ctypes
import functools
import hashlib
import os
import pathlib
import subprocess
import tempfile

_CSRC = pathlib.Path(__file__).resolve().parent.parent.parent / "csrc"
_SOURCE = _CSRC / "ffs_native.cpp"


def _build(so_path: pathlib.Path) -> bool:
    try:
        subprocess.run(
            [
                "g++",
                "-O3",
                "-fPIC",
                "-shared",
                "-std=c++17",
                str(_SOURCE),
                "-o",
                str(so_path),
            ],
            check=True,
            capture_output=True,
            timeout=240,
        )
        return True
    except Exception:
        return False


@functools.lru_cache(maxsize=1)
def lib() -> ctypes.CDLL | None:
    """The loaded native library, building it on demand; None if unavailable.

    The build cache is keyed on a hash of the source (not mtimes), so a stale
    or foreign binary can never shadow the reviewed source after a clone.
    """
    if not _SOURCE.exists():
        return None
    digest = hashlib.sha256(_SOURCE.read_bytes()).hexdigest()[:12]
    so_name = f"libffs_native-{digest}.so"
    build_dir = os.environ.get("FFS_NATIVE_BUILD_DIR")
    so_path = (pathlib.Path(build_dir) if build_dir else _CSRC) / so_name
    if not so_path.exists():
        target = so_path
        try:
            target.parent.mkdir(parents=True, exist_ok=True)
        except OSError:
            target = pathlib.Path(tempfile.gettempdir()) / so_name
        if not target.exists() and not _build(target):
            return None
        so_path = target
    try:
        l = ctypes.CDLL(str(so_path))
    except OSError:
        return None
    l.ffs_lz4_decompress_block.restype = ctypes.c_longlong
    l.ffs_lz4_compress_block.restype = ctypes.c_longlong
    l.ffs_bshuf_lz4_compress.restype = ctypes.c_longlong
    l.ffs_byte_offset_decompress.restype = ctypes.c_longlong
    l.ffs_bshuf_lz4_decompress.restype = ctypes.c_int
    if hasattr(l, "ffs_bshuf_lz4_planes"):
        l.ffs_bshuf_lz4_planes.restype = ctypes.c_int
    l.ffs_bitshuffle_decode.restype = ctypes.c_int
    l.ffs_bitshuffle_encode.restype = ctypes.c_int
    if hasattr(l, "ffs_cc2d"):
        l.ffs_cc2d.restype = ctypes.c_int
    return l
