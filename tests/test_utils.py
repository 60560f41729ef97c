"""Utility parity tests: mt19937 vs libstdc++, writeout, module views."""

import numpy as np

from ffs_tpu.utils.mt19937 import MT19937Cpp, random_selection


def test_mt19937_matches_stdcpp():
    # ground truth from std::mt19937(43) compiled with g++
    want = [
        494155588, 2134003008, 2615920895, 442015537, 572909845,
        638974010, 1033324560, 739303731, 1405051537, 3483374779,
    ]
    mt = MT19937Cpp(43)
    got = [mt() for _ in range(10)]
    assert got == want


def test_random_selection_deterministic():
    a = random_selection(100, 10, seed=43)
    b = random_selection(100, 10, seed=43)
    np.testing.assert_array_equal(a, b)
    assert len(np.unique(a)) == 10
    assert (np.diff(a) > 0).all()  # sorted
    assert a.min() >= 0 and a.max() < 100


def test_writeout_pngs(tmp_path):
    from ffs_tpu.utils.writeout import write_image_png, write_mask_png

    rng = np.random.default_rng(0)
    image = rng.poisson(3, (64, 96)).astype(np.uint16)
    strong = np.zeros((64, 96), bool)
    strong[30, 40] = True
    mask = np.ones((64, 96), np.uint8)
    mask[10:12] = 0
    assert write_mask_png(str(tmp_path / "mask.png"), mask)
    assert write_image_png(
        str(tmp_path / "img.png"),
        image,
        strong,
        boxes=np.array([[38, 42, 28, 32]]),
    )
    from PIL import Image

    im = np.asarray(Image.open(tmp_path / "img.png"))
    assert tuple(im[30, 40]) == (255, 0, 0)  # strong pixel red
    m = np.asarray(Image.open(tmp_path / "mask.png"))
    assert tuple(m[10, 0]) == (255, 0, 0) and tuple(m[0, 0]) == (255, 255, 255)


def test_image_modules_view():
    from ffs_tpu.io.sample_data import generate_sample_image
    from ffs_tpu.io.modules import image_modules

    img = generate_sample_image(3)  # I = x
    mods = image_modules(img, "16M")
    assert mods.shape == (8, 4, 512, 1028)
    # module (0, 1) starts at fast offset 1040
    assert mods[0, 1, 0, 0] == 1040
    assert mods[3, 0, 100, 77] == 77


def test_panel_material_and_trusted_range_round_trip():
    """A CdTe panel must not be silently relabeled Si on serialisation,
    and an unbounded trusted max must emit valid JSON (no Infinity)."""
    import json

    import numpy as np

    from ffs_tpu.models.geometry import Panel, simple_panel

    p = simple_panel(
        150.0, (100.0, 120.0), (0.075, 0.075), (200, 240),
        mu=90.0, thickness=0.75, parallax=True, material="CdTe",
    )
    obj = p.to_json()
    assert obj["material"] == "CdTe"
    txt = json.dumps(obj)  # default trusted max is inf
    assert "Infinity" not in txt
    p2 = Panel.from_json(json.loads(txt))
    assert p2.material == "CdTe"
    assert p2.mu == 90.0 and p2.parallax
    assert np.isfinite(p2.trusted_range[1])


def test_reflection_table_attr_repair_one_sided(tmp_path):
    """A .refl with exactly one of experiment_ids/identifiers present must
    load with BOTH, same length (consumers zip the pair)."""
    import h5py
    import numpy as np

    from ffs_tpu.models.reflection_table import DEFAULT_GROUP, ReflectionTable

    path = tmp_path / "one_sided.refl"
    with h5py.File(path, "w") as f:
        g = f.create_group(DEFAULT_GROUP)
        g.create_dataset("id", data=np.zeros(4, np.int64))
        g.attrs["experiment_ids"] = np.array([0, 1])
    t = ReflectionTable.read(str(path))
    assert t.experiment_ids == [0, 1]
    assert len(t.identifiers) == 2

    path2 = tmp_path / "other_sided.refl"
    with h5py.File(path2, "w") as f:
        g = f.create_group(DEFAULT_GROUP)
        g.create_dataset("id", data=np.zeros(4, np.int64))
        g.attrs["identifiers"] = np.array([b"abc", b"def"])
    t2 = ReflectionTable.read(str(path2))
    assert t2.identifiers == ["abc", "def"]
    assert t2.experiment_ids == [0, 1]


def test_common_args_file_appended(tmp_path, monkeypatch):
    # reference: src/ffs/arg_parser.cc:53-70 — each non-empty common.args
    # line is appended unless that exact argument string is already present
    from ffs_tpu.utils.cli import expand_common_args

    monkeypatch.chdir(tmp_path)
    assert expand_common_args(["--sample"]) == ["--sample"]
    (tmp_path / "common.args").write_text("--images\n4\n\n--sample\n")
    got = expand_common_args(["--sample"])
    assert got == ["--sample", "--images", "4"]  # dedup + skip blank
    # no argv: falls back to sys.argv[1:] plus the file
    monkeypatch.setattr("sys.argv", ["prog", "--images"])
    assert expand_common_args(None) == ["--images", "4", "--sample"]


def test_verbose_flag_sets_debug_level(monkeypatch):
    import argparse

    from ffs_tpu.utils.cli import add_common_arguments, apply_verbosity

    monkeypatch.delenv("LOG_LEVEL", raising=False)
    p = argparse.ArgumentParser()
    add_common_arguments(p)
    apply_verbosity(p.parse_args([]))
    assert "LOG_LEVEL" not in __import__("os").environ
    apply_verbosity(p.parse_args(["-v"]))
    assert __import__("os").environ["LOG_LEVEL"] == "debug"


def test_cli_parsers_accept_verbose():
    # both FFSArgumentParser-derived binaries expose -v/--verbose
    from ffs_tpu.pipeline.spotfinder import _build_parser

    args = _build_parser("0").parse_args(["--sample", "-v"])
    assert args.verbose
