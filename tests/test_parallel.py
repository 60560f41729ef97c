"""Multi-device sharding on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ffs_tpu.ops import dispersion as dops
from ffs_tpu.parallel import (
    halo_sharded_dispersion,
    make_mesh,
    shard_frames,
    sharded_spotfind_counts,
)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_dp_counts_match_single_device(mesh, rng):
    h, w = 64, 256
    frames = rng.poisson(3.0, size=(16, h, w)).astype(np.uint16)
    frames[:, 30:33, 100:103] = 900
    mask = np.ones((h, w), np.uint8)
    per_frame, total = sharded_spotfind_counts(
        mesh, jnp.asarray(frames), jnp.asarray(mask), 65535.0
    )
    assert int(total) == int(np.asarray(per_frame).sum()) > 0
    # single-device reference
    want = np.asarray(
        dops.dispersion(jnp.asarray(frames), jnp.asarray(mask), 65535.0,
                        dtype=jnp.float32)
    ).sum(axis=(1, 2))
    np.testing.assert_array_equal(np.asarray(per_frame), want)


def test_halo_sharded_dispersion_bit_identical(mesh, rng):
    h, w = 128, 192  # 128 rows / 8 shards = 16 rows per shard
    image = rng.poisson(4.0, size=(h, w)).astype(np.uint16)
    image[60:64, 90:94] = 700  # spot spanning a shard boundary (rows 63/64)
    mask = np.ones((h, w), np.uint8)
    got = np.asarray(
        halo_sharded_dispersion(mesh, jnp.asarray(image), jnp.asarray(mask), 65535.0)
    )
    want = np.asarray(
        dops.dispersion(jnp.asarray(image), jnp.asarray(mask), 65535.0,
                        dtype=jnp.float32)
    )
    np.testing.assert_array_equal(got.astype(bool), want)
    assert want[60:64, 90:94].any()


def test_shard_frames_layout(mesh, rng):
    frames = jnp.asarray(rng.poisson(1.0, size=(8, 16, 32)).astype(np.uint16))
    sharded = shard_frames(mesh, frames)
    assert len(sharded.sharding.device_set) == 8


def test_sharded_packed_pipeline_matches_single_chip(small_frame):
    """The full production packed pipeline under shard_map (one chip per
    frame-shard, psum total) must agree with the single-process result."""
    import jax.numpy as jnp

    from ffs_tpu.ops import dispersion as dops
    from ffs_tpu.parallel import make_mesh, sharded_packed_pipeline

    image, mask = small_frame
    n = 4
    mesh = make_mesh(n)
    batch = np.stack([np.roll(image, 3 * i, axis=1) for i in range(2 * n)])
    per_frame, spots_per_chip, total = sharded_packed_pipeline(
        mesh,
        jnp.asarray(batch),
        jnp.asarray(mask),
        65535.0,
        max_pixels_per_frame=2048,
        max_spots_per_chip=2048,
        interpret=True,
    )
    per_frame = np.asarray(per_frame)
    want = [
        int(
            np.asarray(
                dops.dispersion(
                    jnp.asarray(f), jnp.asarray(mask), 65535.0, dtype=jnp.float32
                )
            ).sum()
        )
        for f in batch
    ]
    np.testing.assert_array_equal(per_frame, want)
    assert int(total) == sum(want)
    assert np.asarray(spots_per_chip).sum() > 0


def test_sharded_packed_pipeline_planes_matches_frames(small_frame):
    """Device-decode ingestion over the mesh: bitshuffle planes sharded
    per chip, untransposed inside the shard_map program — outputs equal
    the frame-input DP pipeline's."""
    import jax.numpy as jnp

    from ffs_tpu.io import compression
    from ffs_tpu.parallel import make_mesh, sharded_packed_pipeline
    from ffs_tpu.parallel.mesh import sharded_packed_pipeline_planes

    image, mask = small_frame
    n = 4
    mesh = make_mesh(n)
    batch = np.stack([np.roll(image, 3 * i, axis=1) for i in range(n)])
    h, w = image.shape
    assert (h * w) % 8 == 0
    planes = np.stack([
        compression.bshuf_lz4_planes(
            compression.bshuf_lz4_compress(f, 2), h * w, 2
        )[0]
        for f in batch
    ])
    kw = dict(max_pixels_per_frame=2048, max_spots_per_chip=2048,
              interpret=True)
    want = sharded_packed_pipeline(
        mesh, jnp.asarray(batch), jnp.asarray(mask), 65535.0, **kw
    )
    got = sharded_packed_pipeline_planes(
        mesh, jnp.asarray(planes), (h, w), np.uint16,
        jnp.asarray(mask), 65535.0, **kw
    )
    for g, p in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(p))


def test_sharded_packed_sp_table_bit_identical(mesh, rng):
    """Intra-frame SP of the production packed path: spot TABLE parity.

    One frame's rows sharded over 8 chips; spots planted to span shard
    boundaries so the cross-shard label merge (boundary-row min-propagation
    over ICI) is genuinely exercised.  Every table column must be
    bit-identical to the single-chip flat packed path.
    """
    from ffs_tpu.ops import connected_components as cc
    from ffs_tpu.ops.compact import compact_from_pcw_flat
    from ffs_tpu.ops.dispersion_pallas import dispersion_packed_raw
    from ffs_tpu.parallel import sharded_packed_sp_pipeline

    h, w = 128, 192  # 16 rows per shard
    image = rng.poisson(4.0, size=(h, w)).astype(np.uint16)
    # spots spanning shard boundaries (rows 15/16, 63/64, 111/112) and a
    # tall one crossing THREE shards (rows 40..56 spans 47/48-boundary..)
    image[14:19, 30:34] = 700
    image[60:68, 90:94] = 900
    image[110:114, 150:153] = 650
    image[40:57, 10:12] = 800
    mask = np.ones((h, w), np.uint8)

    table, total = sharded_packed_sp_pipeline(
        mesh,
        jnp.asarray(image),
        jnp.asarray(mask),
        65535.0,
        max_pixels_per_chip=1024,
        max_spots=512,
        interpret=True,
    )

    # single-chip flat packed oracle with the same lin convention
    pcw = dispersion_packed_raw(
        jnp.asarray(image), jnp.asarray(mask), 65535.0, trim=True,
        interpret=True,
    )
    pixels, nbu, nbd = compact_from_pcw_flat(
        jnp.asarray(image)[None], pcw[None],
        max_pixels_total=8 * 1024, with_neighbors=True,
    )
    root = cc.label_compact_pixels(pixels, width=w, neighbors=(nbu, nbd))
    want = cc.spot_table_from_pixels(
        pixels, root, width=w, max_spots=512, dtype=jnp.float32
    )

    assert int(total) == int(pixels.count) > 0
    ns = int(want.n_spots)
    assert int(table.n_spots) == ns > 0
    for field in want._fields:
        if field == "n_spots":
            continue
        a = np.asarray(getattr(table, field))[:ns]
        b = np.asarray(getattr(want, field))[:ns]
        np.testing.assert_array_equal(a, b, err_msg=f"column {field}")
    # the boundary-spanning spots really exist as single components
    n_px = np.asarray(want.n_pixels)[:ns]
    assert (n_px >= 17 * 2).any(), "three-shard spot not merged"


def test_sharded_packed_sp_spot_overflow_fails_loudly(mesh, rng):
    """A frame with more components than max_spots must raise, not
    silently truncate the replicated table (ids past max_spots land in
    the dropped overflow segment)."""
    import jax.numpy as jnp
    import pytest

    from ffs_tpu.parallel import sharded_packed_sp_pipeline

    h, w = 128, 192
    image = rng.poisson(4.0, size=(h, w)).astype(np.uint16)
    image[14:19, 30:34] = 700
    image[60:68, 90:94] = 900
    image[110:114, 150:153] = 650
    mask = np.ones((h, w), np.uint8)
    with pytest.raises(RuntimeError, match="exceeding max_spots"):
        sharded_packed_sp_pipeline(
            mesh,
            jnp.asarray(image),
            jnp.asarray(mask),
            65535.0,
            max_pixels_per_chip=1024,
            max_spots=2,
            interpret=True,
        )


def test_sharded_kabsch_block_step_bit_identical(mesh, rng):
    """Reflection-parallel (DP) integrator block step == single-chip,
    bitwise, on every one of the 8 outputs."""
    from ffs_tpu.integration import kabsch as kb
    from ffs_tpu.models.geometry import (
        Goniometer,
        MonochromaticBeam,
        Scan,
        simple_panel,
    )
    from ffs_tpu.parallel import sharded_kabsch_block_step

    A, F, H, W = 32, 2, 160, 256
    panel = simple_panel(150.0, (W / 2, H / 2), (0.075, 0.075), (W, H))
    beam = MonochromaticBeam(wavelength=0.976)
    gonio = Goniometer()
    scan = Scan(image_range=(1, 10), oscillation=(0.0, 0.1))

    x = rng.uniform(20, W - 20, A)
    y = rng.uniform(20, H - 20, A)
    xmm, ymm = panel.px_to_mm(x, y)
    lab = panel.get_lab_coord(xmm, ymm)
    s1 = lab / np.linalg.norm(lab, axis=1, keepdims=True) / beam.wavelength
    phi = np.deg2rad(rng.uniform(0, 0.2, A))
    half = 5
    bboxes = np.stack(
        [
            np.clip(x - half, 0, W - 1), np.clip(x + half, 0, W - 1),
            np.clip(y - half, 0, H - 1), np.clip(y + half, 0, H - 1),
            np.zeros(A), np.full(A, F),
        ],
        axis=1,
    ).astype(np.int64)

    integ = kb.KabschIntegrator(
        panel=panel, beam=beam, gonio=gonio, scan=scan,
        s1=s1, phi=phi, bboxes=bboxes,
        delta_b=np.deg2rad(0.3), delta_m=np.deg2rad(1.0), max_active=A,
    )
    cs_e1 = np.cross(s1, np.asarray(beam.s0))
    cs_e1 /= np.linalg.norm(cs_e1, axis=1, keepdims=True)
    cs_e2 = np.cross(s1, cs_e1)
    cs_e2 /= np.linalg.norm(cs_e2, axis=1, keepdims=True)
    zeta = cs_e1 @ (gonio.rotation_axis / np.linalg.norm(gonio.rotation_axis))
    dev = integ._chunk_setup(np.arange(A), cs_e1, cs_e2, zeta)

    image = rng.poisson(4.0, size=(F, H, W)).astype(np.uint16)
    image[:, 80:83, 120:123] = 600
    frames = jnp.asarray(integ.pad_frames(image)).astype(jnp.int32)
    phi_lows = jnp.asarray(np.deg2rad(np.arange(F) * 0.1))
    d_osc = float(np.deg2rad(0.1))
    z_values = jnp.asarray(np.arange(F, dtype=np.float64))
    frame_ok = jnp.ones(F, dtype=bool)

    want = jax.jit(
        integ._block_step_impl, static_argnames=("centre_slices",)
    )(
        frames, dev["e12"], dev["maskw"], dev["x0"], dev["y0"],
        dev["bbox"], dev["phi"],
        dev["zeta"], dev["active"], phi_lows, d_osc, z_values, frame_ok,
        centre_slices=True,
    )
    got = sharded_kabsch_block_step(
        mesh, integ, frames, dev, phi_lows, d_osc, z_values, frame_ok
    )
    assert int(np.asarray(want[1]).sum()) > 0  # some foreground classified
    for k, (g, w_) in enumerate(zip(got, want)):
        np.testing.assert_array_equal(
            np.asarray(g), np.asarray(w_), err_msg=f"output {k} diverged"
        )


def test_sharded_rotation_3d_merge_bit_identical(mesh, rng):
    """DP of a rotation collection -> host cc3d merge: 3D spot parity.

    Frames shard over 8 chips in acquisition order (2 per chip); a planted
    spot spans the chip-0/chip-1 boundary frame pair so the host fragment
    merge genuinely crosses a chip boundary.  Per-frame compact pixels,
    2D roots, and every merged Spots3D field must be bit-identical to the
    single-chip path (reference analogue: the global Boost-graph merge's
    inter-slice edges, connected_components.cc:350-370).
    """
    import dataclasses

    from ffs_tpu.ops import cc3d
    from ffs_tpu.ops import connected_components as cc
    from ffs_tpu.ops.compact import compact_from_pcw_segmented
    from ffs_tpu.ops.dispersion_pallas import dispersion_packed_raw
    from ffs_tpu.parallel import rotation_frame_pixels, sharded_rotation_compact

    n, k, kf = 8, 2, 2048
    h, w = 64, 256
    rot = rng.poisson(3.0, size=(k * n, h, w)).astype(np.uint16)
    rot[k - 1, 40:43, 200:203] = 700
    rot[k, 41:44, 200:203] = 700
    rot[k + 1, 42:44, 201:203] = 700
    mask = np.ones((h, w), np.uint8)

    lin, inten, rl, pf, pitch = sharded_rotation_compact(
        mesh, jnp.asarray(rot), jnp.asarray(mask), 65535.0,
        max_pixels_per_frame=kf, interpret=True,
    )
    frames_dp = rotation_frame_pixels(lin, inten, rl, pf, pitch, kf, k)
    spots_dp = cc3d.merge_frames(frames_dp, width=w)

    pcw = dispersion_packed_raw(
        jnp.asarray(rot), jnp.asarray(mask), 65535.0, trim=False, interpret=True
    )
    p1, nbu, nbd, pf1 = compact_from_pcw_segmented(
        jnp.asarray(rot), pcw, max_pixels_per_frame=kf, with_neighbors=True
    )
    root1 = cc.label_compact_pixels(p1, width=w, neighbors=(nbu, nbd))
    assert (np.asarray(pf1) == pf).all()
    frames_1 = rotation_frame_pixels(
        np.asarray(p1.linear_index), np.asarray(p1.intensity),
        np.asarray(p1.linear_index[root1]), np.asarray(pf1), pitch, kf, k * n,
    )
    for z, (a, b) in enumerate(zip(frames_dp, frames_1)):
        assert (a.linear_index == b.linear_index).all(), z
        assert (a.intensity == b.intensity).all(), z
        assert (a.root == b.root).all(), z
    spots_1 = cc3d.merge_frames(frames_1, width=w)
    assert len(spots_dp) == len(spots_1) > 0
    for fld in dataclasses.fields(cc3d.Spots3D):
        a, b = getattr(spots_dp, fld.name), getattr(spots_1, fld.name)
        assert (np.asarray(a) == np.asarray(b)).all(), fld.name
    spans = (spots_dp.z_min <= k - 1) & (spots_dp.z_max >= k)
    assert spans.any(), "no 3D spot spans the chip-boundary frame pair"
    assert int(spots_dp.z_max[spans][0] - spots_dp.z_min[spans][0]) >= 2


def test_sharded_packed_sp_extended_table_bit_identical(mesh, rng):
    """Extended-dispersion SP (VERDICT r4 item 3): the three-stage
    algorithm the Jungfrau stream runs, one frame's rows sharded over 8
    chips with the DEEP halo (first pass r=3 + erosion r=3 + second pass
    r=5 = 11 rows), signal planted across shard boundaries.  Spot TABLE
    bit-parity vs the single-chip flat extended path.
    """
    from ffs_tpu.ops import connected_components as cc
    from ffs_tpu.ops.compact import compact_from_pcw_flat
    from ffs_tpu.ops.dispersion_extended_pallas import (
        dispersion_extended_packed_raw,
    )
    from ffs_tpu.parallel import sharded_packed_sp_pipeline

    h, w = 128, 192  # 16 rows per shard >= the 11-row extended halo
    image = rng.poisson(4.0, size=(h, w)).astype(np.uint16)
    # signal spanning shard boundaries (rows 15/16, 63/64, 111/112) and a
    # tall component crossing three shards
    image[13:20, 30:35] = 700
    image[58:70, 90:95] = 900
    image[109:115, 150:154] = 650
    image[38:59, 10:13] = 800
    mask = np.ones((h, w), np.uint8)

    table, total = sharded_packed_sp_pipeline(
        mesh,
        jnp.asarray(image),
        jnp.asarray(mask),
        65535.0,
        max_pixels_per_chip=1024,
        max_spots=512,
        interpret=True,
        extended=True,
    )

    pcw = dispersion_extended_packed_raw(
        jnp.asarray(image), jnp.asarray(mask), 65535.0, trim=True,
        interpret=True,
    )
    pixels, nbu, nbd = compact_from_pcw_flat(
        jnp.asarray(image)[None], pcw[None],
        max_pixels_total=8 * 1024, with_neighbors=True,
    )
    root = cc.label_compact_pixels(pixels, width=w, neighbors=(nbu, nbd))
    want = cc.spot_table_from_pixels(
        pixels, root, width=w, max_spots=512, dtype=jnp.float32
    )

    assert int(total) == int(pixels.count) > 0
    ns = int(want.n_spots)
    assert int(table.n_spots) == ns > 0
    for field in want._fields:
        if field == "n_spots":
            continue
        a = np.asarray(getattr(table, field))[:ns]
        b = np.asarray(getattr(want, field))[:ns]
        np.testing.assert_array_equal(a, b, err_msg=f"column {field}")
    # a genuinely boundary-spanning component survived the merge
    n_px = np.asarray(want.n_pixels)[:ns]
    assert (n_px >= 30).any(), "multi-shard extended spot not merged"


def test_sharded_packed_sp_extended_halo_guard(mesh, rng):
    """A shard shorter than the 11-row extended halo must be refused."""
    from ffs_tpu.parallel import sharded_packed_sp_pipeline

    image = jnp.asarray(rng.poisson(4.0, size=(64, 192)).astype(np.uint16))
    mask = jnp.ones((64, 192), jnp.uint8)
    with pytest.raises(ValueError, match="halo"):
        sharded_packed_sp_pipeline(
            mesh, image, mask, 65535.0, interpret=True, extended=True
        )
