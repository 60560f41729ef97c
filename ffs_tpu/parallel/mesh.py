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


def _halo_exchange(x, n_rows: int, axis: str, n: int, pad_value=0):
    """Gather ``n_rows`` boundary rows from the up/down neighbour shards
    over ICI and concatenate them as a halo (shared by the dense and the
    packed SP pipelines; must run inside shard_map on a size-``n`` axis).

    Edge shards have no neighbour: ppermute already yields zeros for
    absent sources — matching the single-chip zero-padded window sums —
    so only a non-zero ``pad_value`` needs the explicit edge fill."""
    top = jax.lax.slice_in_dim(x, 0, n_rows, axis=0)
    bottom = jax.lax.slice_in_dim(x, x.shape[0] - n_rows, x.shape[0], axis=0)
    from_above = jax.lax.ppermute(
        bottom, axis, [(i, i + 1) for i in range(n - 1)]
    )
    from_below = jax.lax.ppermute(
        top, axis, [(i + 1, i) for i in range(n - 1)]
    )
    if pad_value != 0:
        idx = jax.lax.axis_index(axis)
        from_above = jnp.where(
            idx == 0, jnp.full_like(from_above, pad_value), from_above
        )
        from_below = jnp.where(
            idx == n - 1, jnp.full_like(from_below, pad_value), from_below
        )
    return jnp.concatenate([from_above, x, from_below], axis=0)


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
    if h // n < radius:
        # one ppermute hop supplies at most one neighbour's rows; a shard
        # shorter than the halo cannot be completed (and the boundary
        # slice would go negative) — same guard as the packed SP pipeline
        raise ValueError(
            f"shard height ({h // n}) must be >= the kernel radius "
            f"({radius}); use fewer chips for this image"
        )

    image = jax.device_put(image, NamedSharding(mesh, P(axis, None)))
    mask = jax.device_put(mask, NamedSharding(mesh, P(axis, None)))

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=P(axis, None),
    )
    def step(img_shard, mask_shard):
        img_p = _halo_exchange(img_shard, radius, axis, n)
        # halo mask rows outside the detector are invalid -> masked out,
        # matching the single-chip zero-padded window sums
        mask_p = _halo_exchange(mask_shard, radius, axis, n)
        strong = dops.dispersion(img_p, mask_p, trusted_max, dtype=dtype)
        return jax.lax.slice_in_dim(
            strong, radius, radius + img_shard.shape[0], axis=0
        )

    return jax.jit(step)(image, mask)


def _packed_chip_body(
    local_frames,
    mask_rep,
    trusted_max,
    w,
    max_pixels_per_frame,
    max_spots_per_chip,
    interpret,
    axis,
    peak_slots,
):
    """One chip's full packed hot path (shared by the frame- and
    planes-input DP pipelines; runs inside shard_map)."""
    from ..ops import connected_components as cc
    from ..ops.compact import compact_from_pcw_segmented
    from ..ops.dispersion_pallas import dispersion_packed_raw

    pcw = dispersion_packed_raw(
        local_frames, mask_rep, trusted_max, trim=False, interpret=interpret
    )
    p, nbu, nbd, per_frame = compact_from_pcw_segmented(
        local_frames,
        pcw,
        max_pixels_per_frame=max_pixels_per_frame,
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
        peak_key_slots=peak_slots,
    )
    total = jax.lax.psum(jnp.sum(per_frame), axis)
    return per_frame, table.n_spots[None], total, jnp.max(per_frame)[None]


def sharded_packed_pipeline(
    mesh: Mesh,
    frames: jnp.ndarray,
    mask: jnp.ndarray,
    trusted_max: float,
    *,
    max_pixels_per_frame: int = 4096,
    max_spots_per_chip: int = 4096,
    interpret: bool = False,
    axis: str = "data",
):
    """The PRODUCTION packed pipeline, data-parallel over the mesh.

    Each chip runs the full per-chip hot path on its local frame shard —
    packed Pallas dispersion kernel, SEGMENTED per-frame word compaction
    with neighbour derivation (the exact configuration bench.py measures
    and the CLI ``--batch`` mode runs, incl. the peak-key spot table for
    u16 data), sparse CC, multi-frame spot table — under ``shard_map``;
    the only cross-chip communication is the psum for the global totals.
    This is the P8 scale-out shape for the 500-2500 Hz stream
    (reference: one CUDA process per collection, service.py:497-507 —
    here one mesh axis entry per chip instead).

    Returns (per_frame_strong (B,), n_spots_per_chip (n,), global_total ()).
    """
    n = mesh.shape[axis]
    B, h, w = frames.shape
    if B % n:
        raise ValueError(f"batch ({B}) must divide the mesh axis ({n})")
    peak_slots = (
        max_pixels_per_frame if frames.dtype == jnp.uint16 else None
    )
    frames = shard_frames(mesh, frames, axis)
    mask = jax.device_put(mask, NamedSharding(mesh, P(None, None)))

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis, None, None), P(None, None)),
        out_specs=(P(axis), P(axis), P(), P(axis)),
        # pallas_call output avals carry no varying-mesh-axes annotation
        check_vma=False,
    )
    def step(local_frames, mask_rep):
        return _packed_chip_body(
            local_frames, mask_rep, trusted_max, w,
            max_pixels_per_frame, max_spots_per_chip, interpret, axis,
            peak_slots,
        )

    per_frame, n_spots, total, frame_maxes = jax.jit(step)(frames, mask)
    # fail loudly on per-frame capacity overflow instead of silently
    # truncating the spot list (the per-frame counts are exact — from the
    # kernel's prefix sums — while the compact segments cap at the static
    # capacity; same policy as SpotfindProcessor.collect)
    frame_maxes = jax.device_get(frame_maxes)
    if int(frame_maxes.max()) > max_pixels_per_frame:
        raise RuntimeError(
            f"a frame holds {int(frame_maxes.max())} strong pixels, "
            f"exceeding max_pixels_per_frame={max_pixels_per_frame}; raise it"
        )
    return per_frame, n_spots, total


def sharded_packed_pipeline_planes(
    mesh: Mesh,
    planes: jnp.ndarray,
    frame_shape: tuple,
    frame_dtype,
    mask: jnp.ndarray,
    trusted_max: float,
    *,
    max_pixels_per_frame: int = 4096,
    max_spots_per_chip: int = 4096,
    interpret: bool = False,
    axis: str = "data",
):
    """DP scale-out of the device-decode ingestion path.

    ``planes``: (B, n_blocks, block_bytes) uint8 — each frame's LZ4-decoded
    bitshuffle plane matrix (io/compression.bshuf_lz4_planes).  Planes
    shard over the batch axis like frames; each chip untransposes its
    shard on device (ops/bitshuffle_device) inside the SAME program as the
    packed pipeline, so the host never touches pixel values.  Outputs are
    bit-identical to :func:`sharded_packed_pipeline` of the decoded frames
    (asserted in tests/test_parallel.py and dryrun_multichip).
    """
    from ..ops.bitshuffle_device import untranspose_planes

    n = mesh.shape[axis]
    B = planes.shape[0]
    h, w = frame_shape
    dt = jnp.dtype(frame_dtype)
    if B % n:
        raise ValueError(f"batch ({B}) must divide the mesh axis ({n})")
    if (h * w) % 8:
        raise ValueError(f"device decode needs a multiple-of-8 pixel count, got {h * w}")
    peak_slots = max_pixels_per_frame if dt == jnp.uint16 else None
    planes = jax.device_put(
        planes, NamedSharding(mesh, P(axis, None, None))
    )
    mask = jax.device_put(mask, NamedSharding(mesh, P(None, None)))

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis, None, None), P(None, None)),
        out_specs=(P(axis), P(axis), P(), P(axis)),
        check_vma=False,
    )
    def step(local_planes, mask_rep):
        lb, n_blocks, block_bytes = local_planes.shape
        elems = untranspose_planes(
            local_planes.reshape(lb * n_blocks, block_bytes), dt.itemsize, dt
        )
        local_frames = (
            elems.reshape(lb, -1)[:, : h * w].reshape(lb, h, w)
        )
        return _packed_chip_body(
            local_frames, mask_rep, trusted_max, w,
            max_pixels_per_frame, max_spots_per_chip, interpret, axis,
            peak_slots,
        )

    per_frame, n_spots, total, frame_maxes = jax.jit(step)(planes, mask)
    frame_maxes = jax.device_get(frame_maxes)
    if int(frame_maxes.max()) > max_pixels_per_frame:
        raise RuntimeError(
            f"a frame holds {int(frame_maxes.max())} strong pixels, "
            f"exceeding max_pixels_per_frame={max_pixels_per_frame}; raise it"
        )
    return per_frame, n_spots, total


def sharded_packed_sp_pipeline(
    mesh: Mesh,
    frame: jnp.ndarray,
    mask: jnp.ndarray,
    trusted_max: float,
    *,
    max_pixels_per_chip: int = 8192,
    max_spots: int = 4096,
    interpret: bool = False,
    axis: str = "data",
    extended: bool = False,
):
    """The PRODUCTION packed pipeline on ONE frame, rows sharded over ICI.

    The single-stream-faster-than-one-chip path (SURVEY §2.9/P9): each chip
    runs the full packed hot path — Pallas dispersion kernel, word
    compaction with derived vertical neighbours, sparse CC — on its row
    shard, after a `ppermute` halo exchange makes the windowed statistics
    exact at shard boundaries.  Components crossing a shard boundary are
    then merged by iterated min-propagation of *global root linear indices*
    over the boundary rows (the CC label-merge collective, the one place
    this workload genuinely needs ICI), and the final spot table is
    tabulated from the all-gathered compact pixels with exactly the
    single-chip code — so the result is bit-identical to the single-chip
    flat path (asserted in tests/test_parallel.py and dryrun_multichip).

    ``extended=True`` runs the three-stage extended algorithm (the one the
    Jungfrau 2500 Hz stream uses — reference: thresholding.cu:253-491 +
    erosion.cu:53-143).  Its halo is DEEPER: the second pass reads the
    eroded first-pass mask over an 11x11 window (radius 5), erosion reads
    the first-pass mask at radius 3, and the first pass reads pixels at
    radius 3 — so a shard needs 5+3+3 = 11 neighbour rows to reproduce
    every stage of the single-chip computation locally.  One 11-row halo
    exchange + local recompute of the overlap region replaces the
    reference's stage-by-stage intermediate exchanges (bit-identical:
    every stage is a deterministic function of the haloed rows).

    Returns a replicated ``SpotTable`` (z = 0 rows, ``frame_rows=None``
    lin convention: lin = y*W + x) plus the global strong-pixel count.
    """
    from ..ops import connected_components as cc
    from ..ops.compact import compact_from_pcw_flat
    from ..ops.connected_components import BIG, CompactPixels, _searchsorted
    from ..constants import KERNEL_RADIUS_EXTENDED
    from ..ops.dispersion_extended_pallas import (
        dispersion_extended_packed_raw,
    )
    from ..ops.dispersion_pallas import dispersion_packed_raw

    n = mesh.shape[axis]
    h, w = frame.shape
    if h % n:
        raise ValueError(f"rows ({h}) must divide the mesh axis ({n})")
    hs = h // n
    r = (
        KERNEL_RADIUS + KERNEL_RADIUS + KERNEL_RADIUS_EXTENDED
        if extended
        else KERNEL_RADIUS
    )
    if hs < r:
        raise ValueError(f"shard rows ({hs}) must cover the halo ({r})")
    k = max_pixels_per_chip

    frame = jax.device_put(frame, NamedSharding(mesh, P(axis, None)))
    mask = jax.device_put(mask, NamedSharding(mesh, P(axis, None)))

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=(P(), P(), P(axis)),
        check_vma=False,
    )
    def step(img_shard, mask_shard):
        idx = jax.lax.axis_index(axis)

        # --- per-chip packed hot path on the haloed strip ----------------
        img_p = _halo_exchange(img_shard, r, axis, n)
        mask_p = _halo_exchange(mask_shard, r, axis, n)
        if extended:
            pcw = dispersion_extended_packed_raw(
                img_p, mask_p, trusted_max, trim=True, interpret=interpret
            )
        else:
            pcw = dispersion_packed_raw(
                img_p, mask_p, trusted_max, trim=True, interpret=interpret
            )
        pcw_local = pcw[r : r + hs]  # drop halo rows
        pixels, nbu, nbd = compact_from_pcw_flat(
            img_shard[None],
            pcw_local[None],
            max_pixels_total=k,
            with_neighbors=True,
        )
        in_spot = pixels.linear_index < BIG
        lin_g = jnp.where(
            in_spot, pixels.linear_index + idx * hs * w, BIG
        ).astype(jnp.int32)
        root_slot = cc.label_compact_pixels(
            pixels, width=w, neighbors=(nbu, nbd)
        )

        # --- cross-shard label merge over ICI ----------------------------
        # Iterated min-propagation of global root lins across boundary
        # rows (reference architecture analogue: the host 3D graph merge,
        # connected_components.cc:270-471, restriped as the one true
        # collective use).  Converges in <= number of boundary crossings
        # of the largest component.
        slots = jnp.arange(k, dtype=jnp.int32)
        px = jnp.where(in_spot, pixels.linear_index % w, 0)
        py = jnp.where(in_spot, pixels.linear_index // w, -1)
        on_top = in_spot & (py == 0)
        on_bot = in_spot & (py == hs - 1)

        def body(state):
            root_g, _ = state
            top_row = jax.ops.segment_min(
                jnp.where(on_top, root_g, BIG), px, num_segments=w
            )
            bot_row = jax.ops.segment_min(
                jnp.where(on_bot, root_g, BIG), px, num_segments=w
            )
            from_above = jax.lax.ppermute(
                bot_row, axis, [(i, i + 1) for i in range(n - 1)]
            )
            from_below = jax.lax.ppermute(
                top_row, axis, [(i + 1, i) for i in range(n - 1)]
            )
            # ppermute pads absent sources with zeros — and 0 is a valid
            # lin — so edge shards must explicitly see "no neighbour"
            from_above = jnp.where(idx == 0, BIG, from_above)
            from_below = jnp.where(idx == n - 1, BIG, from_below)
            cand = jnp.full((k,), BIG, jnp.int32)
            cand = jnp.where(on_top, jnp.minimum(cand, from_above[px]), cand)
            cand = jnp.where(on_bot, jnp.minimum(cand, from_below[px]), cand)
            # propagate the best boundary candidate to the whole local
            # component (root_g is uniform per local component)
            comp_cand = jax.ops.segment_min(
                cand, root_slot, num_segments=k
            )
            new = jnp.minimum(root_g, comp_cand[root_slot])
            changed = (
                jax.lax.psum(jnp.sum((new != root_g).astype(jnp.int32)), axis)
                > 0
            )
            return new, changed

        root_g0 = jnp.where(in_spot, lin_g[root_slot], BIG).astype(jnp.int32)
        root_g, _ = jax.lax.while_loop(
            lambda s: s[1], body, (root_g0, jnp.bool_(True))
        )

        # --- replicated tabulation from the all-gathered pixels ----------
        # (~K * 12 B per chip — trivial next to the frame itself)
        gl = jax.lax.all_gather(lin_g, axis, tiled=True)
        gi = jax.lax.all_gather(pixels.intensity, axis, tiled=True)
        gr = jax.lax.all_gather(root_g, axis, tiled=True)
        sl, si, sr = jax.lax.sort((gl, gi, gr), dimension=0, num_keys=1)
        total = jax.lax.psum(pixels.count, axis)
        # the root pixel's slot in the sorted order; padding (root == BIG)
        # resolves to its own slot so spot ids stay in range
        rs = _searchsorted(sl, sr)
        rs = jnp.where(
            sr < BIG, jnp.clip(rs, 0, n * k - 1), jnp.arange(n * k)
        ).astype(jnp.int32)
        table = cc.spot_table_from_pixels(
            CompactPixels(sl, si, total),
            rs,
            width=w,
            max_spots=max_spots,
            dtype=jnp.float32,
        )
        return table, total, pixels.count[None]

    table, total, chip_counts = jax.jit(step)(frame, mask)
    # fail loudly on per-chip capacity overflow (a truncated boundary
    # pixel would additionally break the cross-shard label merge)
    chip_counts = jax.device_get(chip_counts)
    if int(chip_counts.max()) > max_pixels_per_chip:
        raise RuntimeError(
            f"a row shard holds {int(chip_counts.max())} strong pixels, "
            f"exceeding max_pixels_per_chip={max_pixels_per_chip}; raise it"
        )
    if int(jax.device_get(table.n_spots)) > max_spots:
        # same fail-loudly contract as the DP pipeline and the
        # single-chip collect paths: ids past max_spots land in the
        # dropped overflow segment, silently truncating the table
        raise RuntimeError(
            f"frame produced {int(jax.device_get(table.n_spots))} spots, "
            f"exceeding max_spots={max_spots}; raise it"
        )
    return table, total


def sharded_kabsch_block_step(
    mesh: Mesh,
    integ,
    frames: jnp.ndarray,
    dev: dict,
    phi_lows: jnp.ndarray,
    d_osc,
    z_values: jnp.ndarray,
    frame_ok: jnp.ndarray,
    *,
    centre_slices: bool = True,
    axis: str = "data",
):
    """The PRODUCTION integrator block step, reflection-parallel (DP).

    The Kabsch classification is embarrassingly parallel over reflections
    (reference analogue: one CUDA block per shoebox, kabsch.cu:455-675;
    SURVEY.md P4/P8), so the chunk's per-reflection arrays — precomputed
    e12 geometry, mask windows, origins, bboxes — shard over the
    mesh's ``data`` axis while the resident frame block is replicated.
    Each chip runs the full jitted step (multi-plane DMA window gathers +
    classification + exact-integer accumulation) on its reflection shard;
    there is NO cross-chip communication — the host accumulators consume
    the sharded outputs directly, exactly as in single-chip integrate().

    ``integ`` is a KabschIntegrator; ``dev`` is its _chunk_setup dict.
    Returns the same 8-tuple as _block_step_impl (frame-summed, (A, ...)
    shapes), each output sharded on its reflection axis.
    """
    n = mesh.shape[axis]
    A = dev["x0"].shape[0]
    if A % n:
        raise ValueError(f"chunk ({A}) must divide the mesh axis ({n})")

    refl = P(axis)  # (A,) leading-dim arrays
    specs = {
        "e12": P(axis, None, None),
        "maskw": P(axis, None, None),
        "x0": refl, "y0": refl,
        "bbox": P(axis, None),
        "phi": refl,
        "zeta": refl, "active": refl,
    }
    keys = [k for k in specs if dev.get(k) is not None]
    in_specs = (
        (P(None, None, None),)  # replicated frame block
        + tuple(specs[k] for k in keys)
        + (P(), P(None), P(None), P(None))  # d_osc, phi_lows, z_values, frame_ok
    )
    out_specs = (
        P(axis), P(axis), P(axis), P(axis),
        P(axis), P(axis, None), P(axis), P(axis),
    )

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        # pallas_call output avals carry no varying-mesh-axes annotation
        check_vma=False,
    )
    def step(local_frames, *rest):
        local_dev = dict(zip(keys, rest[: len(keys)]))
        local_dev.setdefault("maskw", None)
        d_osc_l, plows, zvals, fok = rest[len(keys) :]
        return integ._block_step_impl(
            local_frames,
            local_dev["e12"], local_dev["maskw"],
            local_dev["x0"], local_dev["y0"], local_dev["bbox"],
            local_dev["phi"], local_dev["zeta"],
            local_dev["active"], plows, d_osc_l, zvals, fok,
            centre_slices=centre_slices,
        )

    args = [jax.device_put(dev[k], NamedSharding(mesh, specs[k])) for k in keys]
    frames = jax.device_put(frames, NamedSharding(mesh, P(None, None, None)))
    return jax.jit(step)(
        frames, *args, jnp.asarray(d_osc), phi_lows, z_values, frame_ok
    )


def sharded_rotation_compact(
    mesh: Mesh,
    frames: jnp.ndarray,
    mask: jnp.ndarray,
    trusted_max: float,
    *,
    max_pixels_per_frame: int = 4096,
    interpret: bool = False,
    axis: str = "data",
):
    """DP ingestion of a ROTATION collection: compact pixels for 3D merge.

    A rotation scan's frames shard over the mesh in acquisition order
    (chip c holds frames [c*k, (c+1)*k)); each chip runs the packed hot
    path — Pallas dispersion kernel, SEGMENTED per-frame compaction with
    neighbour derivation, sparse 2D CC — and emits its frames' compact
    strong pixels plus 2D fragment roots.  The HOST then merges the
    per-frame fragments into 3D spots with ops/cc3d.merge_frames, which
    handles frame adjacency uniformly — including the pair that straddles
    a chip boundary (reference analogue: the global Boost-graph merge's
    inter-slice edges, connected_components.cc:350-370; here the z axis
    never needs a device collective because intra-frame connectivity is
    folded on device and the z-merge is a host fragment pass).

    Returns host-ready slot arrays, chip-major so frame f = c*k + j
    occupies slots [f*Kf, f*Kf + per_frame[f]):
      (linear_index (B*Kf,), intensity (B*Kf,), root_lin (B*Kf,),
       per_frame (B,), pitch) — linear indices / roots are in the
    CHIP-LOCAL batch space (frame-local = value - j * pitch).
    """
    from ..ops import connected_components as cc
    from ..ops.compact import compact_from_pcw_segmented
    from ..ops.dispersion_pallas import dispersion_packed_raw

    n = mesh.shape[axis]
    B, h, w = frames.shape
    if B % n:
        raise ValueError(f"collection chunk ({B}) must divide the mesh axis ({n})")
    frames = shard_frames(mesh, frames, axis)
    mask = jax.device_put(mask, NamedSharding(mesh, P(None, None)))

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis, None, None), P(None, None)),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        # pallas_call output avals carry no varying-mesh-axes annotation
        check_vma=False,
    )
    def step(local_frames, mask_rep):
        pcw = dispersion_packed_raw(
            local_frames, mask_rep, trusted_max, trim=False, interpret=interpret
        )
        p, nbu, nbd, per_frame = compact_from_pcw_segmented(
            local_frames, pcw,
            max_pixels_per_frame=max_pixels_per_frame, with_neighbors=True,
        )
        root = cc.label_compact_pixels(p, width=w, neighbors=(nbu, nbd))
        root_lin = p.linear_index[root]
        hp_arr = jnp.full((1,), pcw.shape[1], dtype=jnp.int32)
        return p.linear_index, p.intensity, root_lin, per_frame, hp_arr

    lin, inten, root_lin, per_frame, hp_arr = jax.device_get(
        jax.jit(step)(frames, mask)
    )
    per_frame = np.asarray(per_frame)
    if int(per_frame.max(initial=0)) > max_pixels_per_frame:
        # fail loudly instead of silently truncating (same policy as
        # sharded_packed_pipeline / SpotfindProcessor.collect)
        raise RuntimeError(
            f"a frame holds {int(per_frame.max())} strong pixels, exceeding "
            f"max_pixels_per_frame={max_pixels_per_frame}; raise it"
        )
    pitch = (int(hp_arr[0]) + 1) * w
    return (
        np.asarray(lin), np.asarray(inten), np.asarray(root_lin),
        per_frame, pitch,
    )


def rotation_frame_pixels(lin, inten, root_lin, per_frame, pitch, kf, k):
    """Slice sharded_rotation_compact's slot arrays into per-frame
    cc3d.FramePixels (acquisition order), shifting chip-local linear
    indices to frame-local (j = frame index within its chip's shard of
    k frames; kf = max_pixels_per_frame)."""
    from ..ops import cc3d

    out = []
    for f in range(len(per_frame)):
        j = f % k
        sl = slice(f * kf, f * kf + int(per_frame[f]))
        out.append(
            cc3d.FramePixels(
                linear_index=lin[sl] - j * pitch,
                intensity=inten[sl],
                root=root_lin[sl] - j * pitch,
            )
        )
    return out
