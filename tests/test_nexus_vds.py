"""NexusReader VDS walk: layout-derived frame mapping + lazy source opens.

The reference takes per-file frame counts from the VDS layout and treats a
missing data file as "frames not yet written" during live SWMR collection
(h5read.c:301-318, 348-358) — these tests pin the same semantics.
"""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from ffs_tpu.io.nexus import NexusReader


def _write_source(path, frames, h, w, start_value):
    with h5py.File(path, "w") as f:
        data = np.arange(frames, dtype=np.uint16)[:, None, None] * 0 + (
            start_value + np.arange(frames, dtype=np.uint16)[:, None, None]
        )
        f.create_dataset("data", data=np.broadcast_to(data, (frames, h, w)))


def _write_master(path, mappings, n_total, h, w):
    """mappings: list of (v_start, n_frames, file_name, src_frames, s_start)."""
    layout = h5py.VirtualLayout(shape=(n_total, h, w), dtype="u2")
    for v0, n, fname, src_frames, s0 in mappings:
        vs = h5py.VirtualSource(fname, "data", shape=(src_frames, h, w))
        layout[v0 : v0 + n] = vs[s0 : s0 + n]
    with h5py.File(path, "w") as f:
        f.create_group("/entry/data")
        f.create_virtual_dataset("/entry/data/data", layout)


def test_vds_mapping_extents_and_partial_source(tmp_path):
    """Offsets/counts come from the virtual-space extents: mappings are
    registered out of frame order and the second source is only PARTIALLY
    mapped (4 frames allocated, 3 mapped)."""
    h, w = 8, 16
    _write_source(tmp_path / "a.h5", 3, h, w, 0)
    _write_source(tmp_path / "b.h5", 4, h, w, 100)
    # register the LATER block first: virtual_sources() order != frame order
    _write_master(
        tmp_path / "master.h5",
        [(3, 3, "b.h5", 4, 0), (0, 3, "a.h5", 3, 0)],
        6,
        h,
        w,
    )
    r = NexusReader(str(tmp_path / "master.h5"))
    assert r.get_number_of_images() == 6
    for i in range(6):
        assert r.is_image_available(i)
        want = i if i < 3 else 100 + (i - 3)
        assert int(r.get_image(i)[0, 0]) == want
    assert not r.is_image_available(6)
    r.close()


def test_vds_source_side_offset(tmp_path):
    """A mapping that starts inside its source dataset reads the right
    source rows (src_start honored)."""
    h, w = 8, 16
    _write_source(tmp_path / "c.h5", 5, h, w, 0)
    # map source frames 2..4 to virtual frames 0..2
    _write_master(tmp_path / "m2.h5", [(0, 3, "c.h5", 5, 2)], 3, h, w)
    r = NexusReader(str(tmp_path / "m2.h5"))
    assert r.get_number_of_images() == 3
    assert [int(r.get_image(i)[0, 0]) for i in range(3)] == [2, 3, 4]
    r.close()


def test_vds_missing_source_file_is_not_fatal(tmp_path):
    """Live-collection semantics: the master exists before every data
    file does.  Construction succeeds, the missing file's frames read as
    unavailable, and they appear once the file is written."""
    h, w = 8, 16
    _write_source(tmp_path / "a.h5", 3, h, w, 0)
    _write_master(
        tmp_path / "m3.h5",
        [(0, 3, "a.h5", 3, 0), (3, 3, "late.h5", 3, 0)],
        6,
        h,
        w,
    )
    r = NexusReader(str(tmp_path / "m3.h5"))  # must NOT raise
    assert r.get_number_of_images() == 6
    assert r.is_image_available(0) and r.is_image_available(2)
    assert not r.is_image_available(3)  # data file not written yet
    with pytest.raises(OSError):
        r.get_image(3)
    _write_source(tmp_path / "late.h5", 3, h, w, 500)
    assert r.is_image_available(3)
    assert int(r.get_image(5)[0, 0]) == 502
    r.close()
