"""Suite guard for the integrator differential fuzz harness
(tools/fuzz_integrator.py).

Two seeds covering parallax + lane-packed ellipsoid and plain dials with
a mask band; the full multi-seed campaign runs out-of-band, results
recorded in docs/PARITY.md.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))


@pytest.mark.parametrize("seed", [0, 1])
def test_integrator_fuzz_seed_agrees(seed):
    import fuzz_integrator

    assert fuzz_integrator.run_seed(seed, verbose=True)
