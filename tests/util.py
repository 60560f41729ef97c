"""Test helpers: synthetic NeXus files (no filter plugins required)."""

from __future__ import annotations

import numpy as np


def write_nexus(
    path,
    stack: np.ndarray,
    *,
    wavelength: float = 0.9762,
    distance: float = 0.1,  # metres
    pixel_size: float = 75e-6,  # metres
    beam_center=None,  # (x, y) px
    oscillation=None,  # (start, width) degrees -> rotation dataset
    mask: np.ndarray | None = None,
    compression: str | None = "gzip",
):
    """Write an Eiger-style NeXus master file with embedded data."""
    import h5py

    nimg, h, w = stack.shape
    if beam_center is None:
        beam_center = (w / 2.0, h / 2.0)
    with h5py.File(path, "w") as f:
        if compression == "bshuf":
            # real filter-32008 chunks through the low-level API (our own
            # codec both ways; no filter plugin needed for read-back since
            # the reader goes through read_direct_chunk)
            from ffs_tpu.io.compression import bshuf_lz4_compress

            ds = f.create_dataset(
                "/entry/data/data",
                shape=stack.shape,
                dtype=stack.dtype,
                chunks=(1, h, w),
                compression=32008,
                compression_opts=(0, 2),
                allow_unknown_filter=True,
            )
            for i in range(nimg):
                ds.id.write_direct_chunk(
                    (i, 0, 0),
                    bytes(bshuf_lz4_compress(stack[i], stack.dtype.itemsize)),
                    filter_mask=0,
                )
        else:
            f.create_dataset(
                "/entry/data/data",
                data=stack,
                chunks=(1, h, w),
                compression=compression,
            )
        det = f.create_group("/entry/instrument/detector")
        det.create_dataset("beam_center_x", data=beam_center[0])
        det.create_dataset("beam_center_y", data=beam_center[1])
        det.create_dataset("x_pixel_size", data=pixel_size)
        det.create_dataset("y_pixel_size", data=pixel_size)
        det.create_dataset("distance", data=distance)
        det.create_dataset(
            "saturation_value", data=float(np.iinfo(stack.dtype).max)
        )
        det.create_dataset("underload_value", data=0.0)
        if mask is not None:
            # file convention: 0 = valid
            det.create_dataset("pixel_mask", data=(mask == 0).astype(np.uint32))
        f.create_dataset(
            "/entry/instrument/beam/incident_wavelength", data=wavelength
        )
        if oscillation is not None:
            start, width_deg = oscillation
            omega = start + width_deg * np.arange(nimg)
            f.create_dataset("/entry/sample/sample_omega/omega", data=omega)


def synthetic_rotation_stack(nimg=6, h=96, w=128, seed=7):
    """Small rotation stack with a handful of 3D spots and a mask band."""
    rng = np.random.default_rng(seed)
    stack = rng.poisson(3.0, size=(nimg, h, w)).astype(np.uint16)
    mask = np.ones((h, w), dtype=np.uint8)
    mask[40:44, :] = 0
    # 3D spots spanning several frames
    spots = [(1, 4, 20, 30, 500), (0, 3, 60, 90, 900), (2, 5, 75, 40, 700)]
    yy, xx = np.mgrid[-3:4, -3:4]
    g = np.exp(-(yy**2 + xx**2) / 2.5)
    for z0, z1, cy, cx, amp in spots:
        for z in range(z0, min(z1 + 1, nimg)):
            frac = 1.0 - abs(z - (z0 + z1) / 2) / ((z1 - z0) / 2 + 1)
            stack[z, cy - 3 : cy + 4, cx - 3 : cx + 4] += rng.poisson(
                amp * frac * g
            ).astype(np.uint16)
    stack[:, mask == 0] = 0
    return stack, mask
