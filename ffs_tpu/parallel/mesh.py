"""Device-mesh parallelism for the spotfinding pipeline.

The reference scales out at the process level — one CUDA process per data
collection, one k8s pod per beamline queue (reference: service.py:497-507,
chart/values.yaml) — with no collectives.  The TPU-native equivalents:

* **Frame data parallelism (DP)**: a batch of detector frames sharded over
  the mesh's ``data`` axis; every per-pixel op in ffs_tpu.ops carries leading
  batch dims, so a `NamedSharding` on the batch is all XLA needs.  This is
  the production scale-out for a 500-2500 Hz stream across a v5e pod slice.

* **Intra-frame spatial parallelism (SP)**: one frame's rows sharded across
  chips, with explicit halo exchange over ICI (`jax.lax.ppermute`) so the
  windowed dispersion statistics are exact at shard boundaries.  This is the
  path for a single stream whose per-frame rate exceeds one chip.

* Global reductions (total strong-pixel counts, CC label equivalences at
  shard boundaries) use `psum`/`ppermute` — the only collectives this
  workload needs (SURVEY.md §2.9/P9).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import KERNEL_RADIUS
from ..ops import dispersion as dops


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_frames(mesh: Mesh, frames: jnp.ndarray, axis: str = "data"):
    """Place a (B, H, W) frame batch sharded over the mesh's data axis."""
    return jax.device_put(frames, NamedSharding(mesh, P(axis, None, None)))


def sharded_spotfind_counts(
    mesh: Mesh,
    frames: jnp.ndarray,
    mask: jnp.ndarray,
    trusted_max: float,
    *,
    dtype=jnp.float32,
    axis: str = "data",
):
    """Strong-pixel counts per frame + global total, DP over the mesh.

    The per-frame work is embarrassingly parallel; the single collective is
    the `psum`-style global total, which XLA derives from the sharded sum.
    """
    frames = shard_frames(mesh, frames, axis)
    mask = jax.device_put(mask, NamedSharding(mesh, P(None, None)))

    @functools.partial(
        jax.jit,
        out_shardings=(
            NamedSharding(mesh, P(axis)),
            NamedSharding(mesh, P()),
        ),
    )
    def step(frames, mask):
        strong = dops.dispersion(frames, mask, trusted_max, dtype=dtype)
        per_frame = jnp.sum(strong, axis=(-2, -1), dtype=jnp.int32)
        return per_frame, jnp.sum(per_frame)

    return step(frames, mask)


def halo_sharded_dispersion(
    mesh: Mesh,
    image: jnp.ndarray,
    mask: jnp.ndarray,
    trusted_max: float,
    *,
    radius: int = KERNEL_RADIUS,
    dtype=jnp.float32,
    axis: str = "data",
):
    """Dispersion threshold on ONE frame with rows sharded across chips.

    Each shard exchanges ``radius`` boundary rows with its neighbours over
    ICI (`ppermute` up/down), computes the threshold on the padded strip,
    then crops — bit-identical to the single-chip result.
    """
    n = mesh.shape[axis]
    h, w = image.shape
    if h % n:
        raise ValueError(f"rows ({h}) must divide the mesh axis ({n})")

    image = jax.device_put(image, NamedSharding(mesh, P(axis, None)))
    mask = jax.device_put(mask, NamedSharding(mesh, P(axis, None)))

    def _exchange(x, pad_value):
        """Gather `radius` rows from the up/down neighbour shards."""
        idx = jax.lax.axis_index(axis)
        # rows my lower neighbour needs (my top rows) travel "down" etc.
        top = jax.lax.slice_in_dim(x, 0, radius, axis=0)
        bottom = jax.lax.slice_in_dim(x, x.shape[0] - radius, x.shape[0], axis=0)
        from_above = jax.lax.ppermute(
            bottom, axis, [(i, i + 1) for i in range(n - 1)]
        )
        from_below = jax.lax.ppermute(top, axis, [(i + 1, i) for i in range(n - 1)])
        # shards at the detector edge have no neighbour: pad (ppermute
        # already yields zeros there; this keeps the intent explicit)
        from_above = jnp.where(
            (idx == 0), jnp.full_like(from_above, pad_value), from_above
        )
        from_below = jnp.where(
            (idx == n - 1), jnp.full_like(from_below, pad_value), from_below
        )
        return jnp.concatenate([from_above, x, from_below], axis=0)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=P(axis, None),
    )
    def step(img_shard, mask_shard):
        img_p = _exchange(img_shard, 0)
        # halo mask rows outside the detector are invalid -> masked out,
        # matching the single-chip zero-padded window sums
        mask_p = _exchange(mask_shard, 0)
        strong = dops.dispersion(img_p, mask_p, trusted_max, dtype=dtype)
        return jax.lax.slice_in_dim(
            strong, radius, radius + img_shard.shape[0], axis=0
        )

    return jax.jit(step)(image, mask)


def sharded_packed_pipeline(
    mesh: Mesh,
    frames: jnp.ndarray,
    mask: jnp.ndarray,
    trusted_max: float,
    *,
    max_pixels_per_chip: int = 8192,
    max_spots_per_chip: int = 4096,
    interpret: bool = False,
    axis: str = "data",
):
    """The PRODUCTION packed pipeline, data-parallel over the mesh.

    Each chip runs the full per-chip hot path on its local frame shard —
    packed Pallas dispersion kernel, flat word compaction with neighbour
    derivation, sparse CC, multi-frame spot table — under ``shard_map``;
    the only cross-chip communication is the psum for the global totals.
    This is the P8 scale-out shape for the 500-2500 Hz stream
    (reference: one CUDA process per collection, service.py:497-507 —
    here one mesh axis entry per chip instead).

    Returns (per_frame_strong (B,), n_spots_per_chip (n,), global_total ()).
    """
    from ..ops import connected_components as cc
    from ..ops.compact import compact_from_pcw_flat
    from ..ops.dispersion_pallas import dispersion_packed_raw

    n = mesh.shape[axis]
    B, h, w = frames.shape
    if B % n:
        raise ValueError(f"batch ({B}) must divide the mesh axis ({n})")
    frames = shard_frames(mesh, frames, axis)
    mask = jax.device_put(mask, NamedSharding(mesh, P(None, None)))

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis, None, None), P(None, None)),
        out_specs=(P(axis), P(axis), P()),
        # pallas_call output avals carry no varying-mesh-axes annotation
        check_vma=False,
    )
    def step(local_frames, mask_rep):
        pcw = dispersion_packed_raw(
            local_frames, mask_rep, trusted_max, trim=False, interpret=interpret
        )
        nwl = pcw.shape[-1] // 2
        per_frame = jnp.sum(pcw[:, :, nwl - 1], axis=1, dtype=jnp.int32)
        p, nbu, nbd = compact_from_pcw_flat(
            local_frames,
            pcw,
            max_pixels_total=max_pixels_per_chip,
            with_neighbors=True,
        )
        root = cc.label_compact_pixels(p, width=w, neighbors=(nbu, nbd))
        table = cc.spot_table_from_pixels(
            p,
            root,
            width=w,
            max_spots=max_spots_per_chip,
            dtype=jnp.float32,
            frame_rows=pcw.shape[1],
        )
        total = jax.lax.psum(jnp.sum(per_frame), axis)
        return per_frame, table.n_spots[None], total

    return jax.jit(step)(frames, mask)
