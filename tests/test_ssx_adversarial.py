"""SSX indexer hard cases: the ffbidx-envelope adversarial suite.

Reduced-matrix pytest over tools/ssx_adversarial.py (the full 10-seed
success-rate table is committed in docs/PARITY.md).  Cases mirror the
operating envelope the reference's tuned ffbidx parameters imply
(reference: src/ffs/ssx_index.py:100-113): noise spots, weak lattices,
interleaved double lattices, positional jitter, partial spot lists.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from ssx_adversarial import CASES, run_case  # noqa: E402


@pytest.mark.parametrize("case", CASES)
def test_ssx_adversarial_case(case):
    results = [run_case(case, 5 + s) for s in range(2)]
    assert all(r.success for r in results), [
        (r.success, r.frac_indexed, r.rmsd_xy) for r in results
    ]
