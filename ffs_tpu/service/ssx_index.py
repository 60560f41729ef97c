"""ssx_index CLI — standalone serial-crystallography indexing.

Equivalent of the reference `ssx_index` entry point (reference:
src/ffs/ssx_index.py:160-420): per image with >= min_spots strong spots,
index against a known cell and aggregate the per-image lattices into
indexed.refl / indexed.expt.  The CUDA ffbidx backend is replaced by the
TPU-native half-sphere search in ffs_tpu.indexing.ssx.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


class OutputAggregator:
    """Aggregate per-image lattices (reference: ssx_index.py:160-240)."""

    def __init__(self, identifiers_map):
        self.miller_indices = []
        self.xyzobs = []
        self.xyzcal_px = []
        self.delpsical = []
        self.ids = []
        self.s1 = []
        self.image_nos = []
        self.output_id = 0
        self.new_id_to_old_id = {}
        self.output_crystals_list = []
        self.output_crystals_id_nos = []
        self.identifiers_map = identifiers_map

    def add_result(self, result, i):
        A_inv = np.linalg.inv(result.a_matrix)
        self.output_crystals_list.append(
            {
                "__id__": "crystal",
                "real_space_a": list(map(float, A_inv[0])),
                "real_space_b": list(map(float, A_inv[1])),
                "real_space_c": list(map(float, A_inv[2])),
                "space_group_hall_symbol": "P 1",
            }
        )
        self.output_crystals_id_nos.append(int(i))
        n = len(result.delpsi)
        self.miller_indices.append(np.asarray(result.miller_indices, np.int32))
        self.xyzobs.append(np.asarray(result.xyzobs_px).reshape(-1, 3))
        self.xyzcal_px.append(np.asarray(result.xyzcal_px).reshape(-1, 3))
        self.delpsical.append(np.asarray(result.delpsi))
        self.s1.append(np.asarray(result.s1).reshape(-1, 3))
        self.ids.append(np.full(n, self.output_id, dtype=np.int32))
        self.image_nos.append(np.full(n, i, dtype=np.int32))
        self.new_id_to_old_id[self.output_id] = int(i)
        self.output_id += 1

    def write_table(self, filename):
        import h5py

        with h5py.File(Path.cwd() / filename, "w") as f:
            group = f.create_group("dials/processing/group_0")
            ids_array = np.concatenate(self.ids)
            group["id"] = ids_array
            group["image"] = np.concatenate(self.image_nos)
            group["xyzobs.px.value"] = np.concatenate(self.xyzobs)
            group["xyzcal.px"] = np.concatenate(self.xyzcal_px)
            group["s1"] = np.concatenate(self.s1)
            group["delpsical.rad"] = np.concatenate(self.delpsical)
            group["miller_index"] = np.concatenate(self.miller_indices, dtype=np.int32)
            sorted_ids = sorted(set(int(i) for i in self.new_id_to_old_id))
            group.attrs["experiment_ids"] = np.asarray(sorted_ids, np.uint64)
            group.attrs["identifiers"] = [
                self.identifiers_map[self.new_id_to_old_id[i]] for i in sorted_ids
            ]
            group["panel"] = np.zeros_like(ids_array, dtype=np.uint64)


def run(args=None) -> None:
    st = time.time()
    parser = argparse.ArgumentParser(
        prog="index",
        description=(
            "Runs standalone indexing of serial data using the TPU "
            "fast-feedback-indexer"
        ),
    )
    parser.add_argument("-r", "--reflections", help="Path to the strong spots h5 file")
    parser.add_argument("-e", "--experiments", help="Path to the imported.expt json")
    parser.add_argument(
        "-c",
        "--cell",
        type=float,
        nargs=6,
        metavar=("a", "b", "c", "alpha", "beta", "gamma"),
        help="Unit cell parameters: a b c alpha beta gamma",
    )
    parser.add_argument("--min-spots", type=int, default=10)
    parser.add_argument("--test", action="store_true")
    parsed = parser.parse_args(args)

    if not parsed.experiments:
        print("No imported experiment list provided.")
        return
    with open(parsed.experiments) as f:
        expts = json.load(f)
    wavelength = expts["beam"][0]["wavelength"]
    panel_dict = expts["detector"][0]["panels"][0]
    hierarchy = expts["detector"][0].get(
        "hierarchy", {"origin": [0.0, 0.0, 0.0]}
    )

    from ..models.geometry import simple_panel

    px_x, px_y = panel_dict["pixel_size"]
    origin = np.asarray(hierarchy["origin"]) + np.asarray(panel_dict["origin"])
    distance = -origin[2]
    beam_center_x = -origin[0] / px_x
    beam_center_y = origin[1] / px_y
    panel = simple_panel(
        distance_mm=distance,
        beam_center_px=(beam_center_x, beam_center_y),
        pixel_size_mm=(px_x, px_y),
        image_size=tuple(panel_dict["image_size"]),
        mu=panel_dict.get("mu", 0.0),
        thickness=panel_dict.get("thickness", 0.0),
        parallax=panel_dict.get("mu", 0.0) > 0,
        material=panel_dict.get("material", ""),
    )

    if not parsed.reflections:
        print("No strong reflections h5 file provided.")
        return
    try:
        import h5py

        with h5py.File(parsed.reflections) as refls:
            g = refls["dials"]["processing"]["group_0"]
            xyzs = g["xyzobs.px.value"][:]
            ids = g["id"][:]
            experiment_ids = g.attrs["experiment_ids"]
            identifiers = [
                i.decode() if isinstance(i, bytes) else str(i)
                for i in g.attrs["identifiers"]
            ]
            identifiers_map = dict(zip((int(i) for i in experiment_ids), identifiers))
    except Exception as e:
        print(
            "Unable to interpret the reflection file - please check input.\n"
            f" Error: {e}"
        )
        return

    if parsed.cell is None:
        # friendly error like the -r/-e paths (divergence: the reference
        # crashes with a raw TypeError via gemmi.UnitCell(*None))
        print("Please specify the unit cell with -c/--cell")
        return

    from ..indexing.ssx import SSXIndexer

    indexer = SSXIndexer(min_spots=parsed.min_spots)
    indexer.panel = panel
    indexer.cell = tuple(parsed.cell)
    indexer.wavelength = wavelength

    aggregator = OutputAggregator(identifiers_map)
    unique_ids, starts = np.unique(ids, return_index=True)
    ends = np.append(starts[1:], len(ids))

    n_indexed_images = 0
    n_considered = 0
    n_total = 0
    t1 = time.time()
    for id_, start, end in zip(unique_ids, starts, ends):
        xyzs_this = xyzs[start:end]
        if not xyzs_this.any():
            continue
        n_total += 1
        if len(xyzs_this) < parsed.min_spots:
            continue
        n_considered += 1
        result, n_unindexed = indexer.index(xyzs_this)
        if result is not None and len(result.delpsi):
            n_indexed_images += 1
            aggregator.add_result(result, int(id_))
            rmsdx, rmsdy, rmsd_psi = result.rmsds
            cell_str = ", ".join(f"{v:.3f}" for v in result.cell_parameters)
            print(
                f"Indexed {len(result.delpsi)}/{len(xyzs_this)} spots on image "
                f"{int(id_) + 1}:\n  cell: {cell_str}\n"
                f"  RMSDs: (x(px), y(px), psi(rad)): {rmsdx:.3f}, {rmsdy:.3f}, "
                f"{rmsd_psi:.5f}"
            )
        else:
            print(f"No indexing solution for image {int(id_) + 1}")

    t2 = time.time()
    print(
        f"Indexing attempted on {n_considered}/{n_total} non-empty images with "
        f">= {parsed.min_spots} spots"
    )
    print(f"Indexed {n_indexed_images}/{n_total} non-empty images in {t2 - t1:.3f}s")

    if parsed.test:
        with open("indexed_crystals.json", "w") as f:
            json.dump(aggregator.output_crystals_list, f, indent=2)
    else:
        expts["crystal"] = aggregator.output_crystals_list
        for i, id_ in enumerate(aggregator.output_crystals_id_nos):
            expts["experiment"][id_]["crystal"] = i
        with open("indexed.expt", "w") as f:
            json.dump(expts, f, indent=2)

    if not aggregator.ids:
        print("No images successfully indexed, no reflection output will be written.")
    else:
        aggregator.write_table("indexed.refl")
    t3 = time.time()
    print(
        f"Setup time: {t1 - st:.3f}s, index time {t2 - t1:.3f}s, "
        f"write time {t3 - t2:.3f}s"
    )


def main() -> None:
    run()


if __name__ == "__main__":
    run()
