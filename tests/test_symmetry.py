"""Hall-symbol space groups + systematic absences (models/symmetry.py).

Oracle: the International Tables reflection-condition rules for each test
group (independent of the implementation, which derives absences from the
group operations like gemmi's is_systematically_absent — the path the
reference predictor uses, predict.cc:156-157, index_generators.hpp:83).
"""

import numpy as np
import pytest

from ffs_tpu.models.symmetry import GroupOps, group_ops_from_symbol


def _grid(r=4):
    ax = np.arange(-r, r + 1)
    g = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1).reshape(-1, 3)
    return g[~(g == 0).all(axis=1)]


HKL = _grid()


def _rule_P1(h):
    return np.zeros(len(h), bool)


def _rule_C2(h):
    return (h[:, 0] + h[:, 1]) % 2 != 0


def _rule_P21y(h):
    axial = (h[:, 0] == 0) & (h[:, 2] == 0)
    return axial & (h[:, 1] % 2 != 0)


def _rule_P21c(h):
    # P21/c (b unique, c glide): h0l with l odd; 0k0 with k odd
    h0l = (h[:, 1] == 0) & (h[:, 2] % 2 != 0)
    k0 = (h[:, 0] == 0) & (h[:, 2] == 0) & (h[:, 1] % 2 != 0)
    return h0l | k0


def _rule_P212121(h):
    a = (h[:, 1] == 0) & (h[:, 2] == 0) & (h[:, 0] % 2 != 0)
    b = (h[:, 0] == 0) & (h[:, 2] == 0) & (h[:, 1] % 2 != 0)
    c = (h[:, 0] == 0) & (h[:, 1] == 0) & (h[:, 2] % 2 != 0)
    return a | b | c


def _rule_I4(h):
    return (h.sum(axis=1)) % 2 != 0


def _rule_F222(h):
    even = h % 2 == 0
    return ~(even.all(axis=1) | (~even).all(axis=1))


def _rule_P31(h):
    axial = (h[:, 0] == 0) & (h[:, 1] == 0)
    return axial & (h[:, 2] % 3 != 0)


def _rule_P61(h):
    axial = (h[:, 0] == 0) & (h[:, 1] == 0)
    return axial & (h[:, 2] % 6 != 0)


def _rule_R3(h):
    return (-h[:, 0] + h[:, 1] + h[:, 2]) % 3 != 0


def _rule_P41212(h):
    l00 = (h[:, 0] == 0) & (h[:, 1] == 0) & (h[:, 2] % 4 != 0)
    h00 = (h[:, 1] == 0) & (h[:, 2] == 0) & (h[:, 0] % 2 != 0)
    k00 = (h[:, 0] == 0) & (h[:, 2] == 0) & (h[:, 1] % 2 != 0)
    return l00 | h00 | k00


@pytest.mark.parametrize(
    "hall,n_sym,rule",
    [
        ("P 1", 1, _rule_P1),
        ("-P 1", 2, _rule_P1),  # centrosymmetry adds no absences
        ("C 2y", 2, _rule_C2),
        ("P 2yb", 2, _rule_P21y),
        ("-P 2ybc", 4, _rule_P21c),
        ("P 2ac 2ab", 4, _rule_P212121),
        ("I 4", 4, _rule_I4),
        ("F 2 2", 4, _rule_F222),
        ("P 31", 3, _rule_P31),
        ("P 61", 6, _rule_P61),
        ("R 3", 3, _rule_R3),
        ("P 4abw 2nw", 8, _rule_P41212),
    ],
)
def test_absences_match_international_tables(hall, n_sym, rule):
    ops = GroupOps.from_hall(hall)
    assert len(ops.sym_ops) == n_sym
    got = ops.is_systematically_absent(HKL)
    want = rule(HKL)
    mism = np.nonzero(got != want)[0]
    assert not len(mism), (
        f"{hall}: first mismatch hkl={HKL[mism[0]]} "
        f"got={got[mism[0]]} want={want[mism[0]]}"
    )


def _rule_Fd3m(h):
    """#227: F centering; 0kl (+perms): sum of the nonzero pair = 4n (the
    diamond d glides; covers the axial h00: h=4n case when two are zero).
    hhl: h+l=2n is implied by the centering."""
    a = np.zeros(len(h), bool)
    cen = (
        ((h[:, 0] + h[:, 1]) % 2 != 0)
        | ((h[:, 0] + h[:, 2]) % 2 != 0)
        | ((h[:, 1] + h[:, 2]) % 2 != 0)
    )
    a |= cen
    for i in range(3):
        j, k = [x for x in range(3) if x != i]
        a |= (~cen) & (h[:, i] == 0) & ((h[:, j] + h[:, k]) % 4 != 0)
    return a


def _rule_I41a(h):
    """#88: I centering; hk0: h (and so k) = 2n (a glide); 00l: l=4n (4_1)."""
    cen = h.sum(axis=1) % 2 != 0
    hk0 = (h[:, 2] == 0) & (h[:, 0] % 2 != 0)
    l00 = (h[:, 0] == 0) & (h[:, 1] == 0) & (h[:, 2] % 4 != 0)
    return cen | hk0 | l00


def _rule_P213(h):
    """#198: axial h00 (+cyclic): h=2n (the 2_1 screws); the body-diagonal
    3 fixes only (t,t,t) rows and carries no translation."""
    a = np.zeros(len(h), bool)
    for i in range(3):
        j, k = [x for x in range(3) if x != i]
        a |= (h[:, j] == 0) & (h[:, k] == 0) & (h[:, i] % 2 != 0)
    return a


@pytest.mark.parametrize(
    "name,halls,rule",
    [
        # both Hall origin choices must give the same absence mask: for any
        # op fixing h (hR = h), the origin-shift phase h.(v - Rv) vanishes
        ("Fd-3m", ["F 4d 2 3 -1d", "-F 4vw 2vw 3"], _rule_Fd3m),
        ("I41/a", ["I 4bw -1bw", "-I 4ad"], _rule_I41a),
        ("P213", ["P 2ac 2ab 3"], _rule_P213),
    ],
)
def test_hard_groups_match_international_tables(name, halls, rule):
    """Diamond d glides, the improper '-1d' field, the body-diagonal 3
    default axis, 4-screw + a-glide: the Hall-machinery corners the basic
    parametrized groups above don't reach."""
    masks = [GroupOps.from_hall(h).is_systematically_absent(HKL) for h in halls]
    for m in masks[1:]:
        assert (m == masks[0]).all(), f"{name}: origin choices disagree"
    want = rule(HKL)
    mism = np.nonzero(masks[0] != want)[0]
    assert not len(mism), (
        f"{name}: first mismatch hkl={HKL[mism[0]]} "
        f"got={masks[0][mism[0]]} want={want[mism[0]]}"
    )


def test_closure_keeps_centering_duplicates_correct():
    """The group closure stores ops mod integer translations only, so
    centering-shifted copies of the same rotation survive (Fd-3m closes at
    exactly 192 ops = the max_ops bound, 48 distinct rotations x the 4
    F-centering translations).  The absence test must stay correct with
    the duplicates present."""
    ops = GroupOps.from_hall("F 4d 2 3 -1d")
    assert len(ops.sym_ops) == 192
    assert len({o.rot for o in ops.sym_ops}) == 48


@pytest.mark.parametrize(
    "hall",
    ["-P 2ybc", "P 2ac 2ab", "I 4", "P 4abw 2nw", "F 4d 2 3 -1d", "-I 4ad"],
)
def test_absence_invariants(hall):
    """Implementation-independent properties: absence is Friedel-symmetric
    (if (R,t) fixes h it fixes -h with the negated phase) and constant on
    every symmetry orbit (absent(hR) == absent(h) for all ops)."""
    ops = GroupOps.from_hall(hall)
    got = ops.is_systematically_absent(HKL)
    neg = ops.is_systematically_absent(-HKL)
    assert (got == neg).all()
    index = {tuple(v): i for i, v in enumerate(HKL)}
    for op in ops.sym_ops:
        mapped = HKL @ op.matrix()
        keep = [(i, index[tuple(m)]) for i, m in enumerate(mapped)
                if tuple(m) in index]
        src, dst = zip(*keep)
        assert (got[list(src)] == got[list(dst)]).all()


def test_single_hkl_and_fallback():
    ops = GroupOps.from_hall("P 2ac 2ab")
    assert ops.is_systematically_absent(np.array([3, 0, 0]))
    assert not ops.is_systematically_absent(np.array([3, 1, 0]))
    # unparseable symbols fall back to None (no filtering, P1 superset)
    assert group_ops_from_symbol("totally bogus") is None
    assert group_ops_from_symbol("P 1") is not None


def test_p1_default_symbol_variants():
    # crystal models store "P1" (default) or "P 1" (DIALS expt)
    for sym in ("P 1", "P1"):
        ops = group_ops_from_symbol(sym)
        assert ops is not None and not ops.is_systematically_absent(HKL).any()
