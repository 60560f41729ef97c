"""Suite guard for the differential fuzz harness (tools/fuzz_spotfind.py).

Runs a handful of seeds across distinct configurations — packed Pallas
(interpret) vs dense jnp, batch vs per-frame — so the harness itself and
the bitwise pipeline contract stay exercised in CI; the full campaign
(hundreds of seeds) runs out-of-band, results recorded in docs/PARITY.md.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))


@pytest.mark.parametrize("seed", [0, 4, 8])
def test_fuzz_seed_agrees(seed):
    import fuzz_spotfind

    assert fuzz_spotfind.run_seed(seed)


@pytest.mark.parametrize("seed", [1, 7])
def test_fuzz_predict_seed_agrees(seed):
    """Device two-pass ray search == host f64 oracle on random
    experiments (full campaign: tools/fuzz_predict.py on the TPU,
    results in docs/PARITY.md)."""
    import fuzz_predict

    r = fuzz_predict.run_seed(seed)
    assert "fail" not in r, r
