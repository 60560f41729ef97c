"""Rotation-indexer hard cases: reduced-matrix pytest over
tools/indexer_robustness.py (the full 5-seed success table is committed
in docs/PARITY.md).

Each case corrupts synthetic rotation-scan observations (centroid noise,
uniform outliers, a second interleaved lattice, truncated spot lists,
low-symmetry cells) and the full baseline_indexer pipeline — FFT, flood
fill, candidate combination, LM-refined scoring, macro cycles
(reference: baseline_indexer/indexer.cc:130-167,449-613) — must recover
the ground-truth cell edges within 1%.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from indexer_robustness import run_case  # noqa: E402

# One clean and one hard case keep suite time bounded (~2 min each on
# the 1-CPU box); the tool's full 8-case x 5-seed campaign is the
# documented table in docs/PARITY.md.
FAST_CASES = [
    "clean_ortho",
    "second_lattice",
]


@pytest.mark.parametrize("case", FAST_CASES)
def test_indexer_robust_case(case):
    # seed 7 is outside the tool's 0..4 campaign range, so the pytest
    # check is an independent draw from the same distribution
    assert run_case(case, 7, verbose=True)
