"""ssx_index CLI end-to-end on synthetic stills."""

import json
import os

import h5py
import numpy as np
import pytest

from ffs_tpu.service import ssx_index as ssx_cli

from .test_ssx import _still_experiment, _synthetic_still_spots


def test_ssx_index_cli(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    # two still images from differently oriented crystals of the same cell
    all_xyz, all_ids = [], []
    identifiers = []
    for img, seed in enumerate((5, 12)):
        crystal, panel, wavelength, s0, rng = _still_experiment(seed=seed)
        obs, _ = _synthetic_still_spots(crystal, panel, wavelength, s0, rng)
        all_xyz.append(obs)
        all_ids.append(np.full(len(obs), img, dtype=np.int64))
        identifiers.append(f"uuid-{img}")

    with h5py.File("strong.refl", "w") as f:
        g = f.create_group("dials/processing/group_0")
        g["xyzobs.px.value"] = np.concatenate(all_xyz)
        g["id"] = np.concatenate(all_ids)
        g.attrs["experiment_ids"] = np.arange(2, dtype=np.uint64)
        g.attrs["identifiers"] = identifiers

    # imported.expt stub in the reference's hierarchy/panels layout
    # (ssx_index.py:270-290): distance 100 mm, beam centre (250, 260) px,
    # 0.2 mm pixels -> origin (-50, 52, -100)
    expt = {
        "beam": [{"wavelength": 1.1, "direction": [0, 0, 1]}],
        "detector": [
            {
                "hierarchy": {"origin": [0.0, 0.0, 0.0]},
                "panels": [
                    {
                        "origin": [-50.0, 52.0, -100.0],
                        "pixel_size": [0.2, 0.2],
                        "image_size": [500, 520],
                        "thickness": 0.45,
                        "mu": 0.0,
                        "fast_axis": [1, 0, 0],
                        "slow_axis": [0, -1, 0],
                    }
                ],
            }
        ],
        "experiment": [{"identifier": "uuid-0"}, {"identifier": "uuid-1"}],
    }
    with open("imported.expt", "w") as f:
        json.dump(expt, f)

    ssx_cli.run(
        [
            "-r", "strong.refl",
            "-e", "imported.expt",
            "-c", "30", "40", "50", "90", "90", "90",
        ]
    )
    assert os.path.exists("indexed.refl")
    assert os.path.exists("indexed.expt")

    with h5py.File("indexed.refl") as f:
        g = f["dials/processing/group_0"]
        assert len(g["miller_index"]) > 20
        assert set(np.unique(g["id"][()])) <= {0, 1}
        assert "delpsical.rad" in g and "xyzcal.px" in g

    with open("indexed.expt") as f:
        out = json.load(f)
    assert len(out["crystal"]) == 2
    for c in out["crystal"]:
        lengths = sorted(
            np.linalg.norm([c["real_space_a"], c["real_space_b"], c["real_space_c"]], axis=1)
        )
        assert lengths == pytest.approx([30, 40, 50], rel=0.03)
