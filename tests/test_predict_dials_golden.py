"""DIALS golden oracle for rotation prediction on a real beamline geometry.

The reference embeds a complete indexed thaumatin experiment (first rotation
image of the dials_i03_thau dataset) with exact DIALS-derived prediction
oracles directly in its test source — the strongest dataset-free parity
anchor in the tree (reference: tests/test_predict.py:13-235).  This test
reproduces both cases against our predictor CLI:

  * scan-static: 464 predictions; three hkl -> xyzcal.px triples at 1e-2
    (reference: tests/test_predict.py:161-177)
  * scan-varying (A_at_scan_points): 451 predictions; the same hkls at
    their scan-varying positions (reference: tests/test_predict.py:180-234)
"""

import json

import h5py
import numpy as np
import pytest

from ffs_tpu.pipeline.predictor import run as predictor_run


def _thaumatin_expt() -> dict:
    """The dials_i03_thau single-image indexed experiment (DIALS values;
    reference: tests/test_predict.py:13-146)."""
    return {
        "__id__": "ExperimentList",
        "experiment": [
            {
                "__id__": "Experiment",
                "identifier": "855e4e32-a69b-4d3f-5c71-7da43a7f2bfc",
                "beam": 0,
                "detector": 0,
                "goniometer": 0,
                "scan": 0,
                "crystal": 0,
            }
        ],
        "beam": [
            {
                "__id__": "monochromatic",
                "direction": [-0.0034229667619783467, -0.0, 0.999994141632113],
                "wavelength": 0.9762458439949315,
                "divergence": 0.0,
                "sigma_divergence": 0.0,
                "polarization_normal": [0.0, 1.0, 0.0],
                "polarization_fraction": 0.999,
                "flux": 0.0,
                "transmission": 1.0,
                "probe": "x-ray",
                "sample_to_source_distance": 0.0,
            }
        ],
        "detector": [
            {
                "panels": [
                    {
                        "name": "/entry/instrument/detector/module",
                        "type": "SENSOR_PAD",
                        "fast_axis": [
                            0.9999343565703017,
                            0.008972928699089156,
                            0.007125243918478585,
                        ],
                        "slow_axis": [
                            0.009011312015482328,
                            -0.9999449607587793,
                            -0.005373240073119384,
                        ],
                        "origin": [
                            -154.36992588196173,
                            164.3947680648576,
                            -198.15267891180412,
                        ],
                        "image_size": [4148, 4362],
                        "pixel_size": [0.075, 0.075],
                        "trusted_range": [0.0, 46051.0],
                        "thickness": 0.45000000000000007,
                        "material": "Si",
                        "mu": 3.9219876752936167,
                        "gain": 1.0,
                        "pedestal": 0.0,
                        "px_mm_strategy": {"type": "ParallaxCorrectedPxMmStrategy"},
                    }
                ]
            }
        ],
        "goniometer": [
            {
                "axes": [
                    [1.0, -0.0025, 0.0056],
                    [-0.006, -0.0264, -0.9996],
                    [1.0, 0.0, 0.0],
                ],
                "angles": [0.0, 0.0, 0.0],
                "names": ["phi", "chi", "omega"],
                "scan_axis": 2,
            }
        ],
        "scan": [
            {
                "image_range": [1, 1],
                "batch_offset": 0,
                "properties": {
                    "epochs": [0.0],
                    "exposure_time": [0.0],
                    "oscillation": [0.0, 0.09999999999999964],
                },
            }
        ],
        "crystal": [
            {
                "__id__": "crystal",
                "real_space_a": [
                    -18.3617922001806,
                    -1.3985262449809124,
                    -54.866705726818,
                ],
                "real_space_b": [
                    -32.09880690850544,
                    47.2184015325075,
                    9.47764074028691,
                ],
                "real_space_c": [
                    115.77476247140888,
                    86.89078795711316,
                    -40.81230881268615,
                ],
                "space_group_hall_symbol": " P 1",
            }
        ],
    }


# DIALS oracle values (reference: tests/test_predict.py:168-177, 225-234)
_EXPECTED_HKL = [[-28, 14, 93], [-26, 14, 90], [-14, -30, -11]]
_EXPECTED_STATIC = [
    [3937.314, 91.352, 0.649],
    [3769.996, 214.530, 0.341],
    [2979.930, 3628.805, 0.877],
]
_EXPECTED_SV = [
    [3937.727, 90.932, 0.782],
    [3770.352, 214.153, 0.473],
    [2980.114, 3628.977, 0.943],
]

# Interpolated-A scan-varying model for the same crystal (two scan points;
# reference: tests/test_predict.py:184-206)
_A_AT_SCAN_POINTS = [
    [
        -0.005459727201059019,
        -0.00957881993314865,
        0.005117309749372354,
        -0.00042498931737436986,
        0.014098506559502566,
        0.0038416886950916533,
        -0.016390331545472165,
        0.002844169681824414,
        -0.0018112274387013555,
    ],
    [
        -0.005459734253117143,
        -0.009578815538092726,
        0.005117308300437957,
        -0.00042498758360674213,
        0.014098504268823347,
        0.003841688575830816,
        -0.01639033413246863,
        0.002844172984156842,
        -0.001811225938788269,
    ],
]


def _run_and_read(tmp_path, expt_obj):
    expt_path = tmp_path / "test.expt"
    with open(expt_path, "w") as f:
        json.dump(expt_obj, f)
    out = tmp_path / "predicted.refl"
    rc = predictor_run(["-e", str(expt_path), "--output", str(out)])
    assert not rc
    with h5py.File(out, "r") as f:
        g = f["/dials/processing/group_0"]
        hkl = g["miller_index"][()].reshape(-1, 3)
        xyz = g["xyzcal.px"][()].reshape(-1, 3)
    return hkl, xyz


def test_predict_static_thaumatin_golden(tmp_path):
    hkl, xyz = _run_and_read(tmp_path, _thaumatin_expt())
    assert len(hkl) == 464
    for want_hkl, want_xyz in zip(_EXPECTED_HKL, _EXPECTED_STATIC):
        sel = np.all(hkl == want_hkl, axis=1)
        assert sel.sum() == 1
        assert xyz[sel].flatten() == pytest.approx(want_xyz, abs=1e-2)


def test_predict_scan_varying_thaumatin_golden(tmp_path):
    expt = _thaumatin_expt()
    expt["crystal"][0]["A_at_scan_points"] = _A_AT_SCAN_POINTS
    hkl, xyz = _run_and_read(tmp_path, expt)
    assert len(hkl) == 451
    for want_hkl, want_xyz in zip(_EXPECTED_HKL, _EXPECTED_SV):
        sel = np.all(hkl == want_hkl, axis=1)
        assert sel.sum() == 1
        assert xyz[sel].flatten() == pytest.approx(want_xyz, abs=1e-2)
