"""lm.lmder vs scipy's wrapped MINPACK lmder (the reference's optimizer).

The reference refines candidates with Eigen's LevenbergMarquardt — a
MINPACK lmder port — at ftol=xtol=1e-6, maxfev=10
(refine_candidate.cc:78-86).  scipy.optimize.leastsq with an analytic
Dfun wraps the actual MINPACK lmder, so it is a bit-for-bit oracle of
the algorithm our ffs_tpu.indexing.lm reimplements.
"""

import numpy as np
import pytest
from scipy.optimize import leastsq

from ffs_tpu.indexing.lm import lmder


def _exp_fit_problem():
    t = np.linspace(0.0, 4.0, 50)
    y = 2.5 * np.exp(-1.3 * t) + 0.7
    # deterministic "noise" so the minimum is not exactly the generator
    y = y + 0.01 * np.sin(17.0 * t)

    def fn(x):
        return x[0] * np.exp(-x[1] * t) + x[2] - y

    def jac(x):
        e = np.exp(-x[1] * t)
        return np.stack([e, -x[0] * t * e, np.ones_like(t)], axis=1)

    return fn, jac, np.array([1.0, 1.0, 0.0])


def _rosenbrock_problem():
    def fn(x):
        return np.array([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0]])

    def jac(x):
        return np.array([[-20.0 * x[0], 10.0], [-1.0, 0.0]])

    return fn, jac, np.array([-1.2, 1.0])


def _freudenstein_roth_problem():
    def fn(x):
        return np.array(
            [
                -13.0 + x[0] + ((5.0 - x[1]) * x[1] - 2.0) * x[1],
                -29.0 + x[0] + ((x[1] + 1.0) * x[1] - 14.0) * x[1],
            ]
        )

    def jac(x):
        return np.array(
            [
                [1.0, (10.0 - 3.0 * x[1]) * x[1] - 2.0],
                [1.0, (3.0 * x[1] + 2.0) * x[1] - 14.0],
            ]
        )

    return fn, jac, np.array([0.5, -2.0])


@pytest.mark.parametrize(
    "problem",
    [_exp_fit_problem, _rosenbrock_problem, _freudenstein_roth_problem],
)
def test_matches_minpack_converged(problem):
    fn, jac, x0 = problem()
    res = lmder(fn, jac, x0, ftol=1e-10, xtol=1e-10, maxfev=400)
    x_sp, _, info, _, ier = leastsq(
        fn, x0, Dfun=jac, ftol=1e-10, xtol=1e-10, maxfev=400, full_output=True
    )
    # ier/status 4 = scaled gradient 0 (exact zero-residual solutions)
    assert ier in (1, 2, 3, 4)
    assert res.status in (1, 2, 3, 4)
    assert res.status == ier or {res.status, ier} <= {1, 2, 3}
    np.testing.assert_allclose(res.x, x_sp, rtol=1e-7, atol=1e-10)
    cost_sp = float(fn(x_sp) @ fn(x_sp))
    assert res.cost <= cost_sp * (1 + 1e-9) + 1e-30


def test_matches_minpack_truncated_budget():
    """At the reference's production budget (maxfev=10) the iterates must
    track MINPACK's — this is what makes near-tie candidate ranking
    faithful."""
    fn, jac, x0 = _exp_fit_problem()
    res = lmder(fn, jac, x0, ftol=1e-6, xtol=1e-6, maxfev=10)
    x_sp, _, info, _, _ = leastsq(
        fn, x0, Dfun=jac, ftol=1e-6, xtol=1e-6, maxfev=10, full_output=True
    )
    assert res.nfev == info["nfev"]
    np.testing.assert_allclose(res.x, x_sp, rtol=1e-6, atol=1e-9)


def test_matches_minpack_rank_deficient_frozen_column():
    """Frozen parameters (refine_candidate zeroes their Jacobian columns,
    e.g. beam |s0| and in-plane rotation) make R rank-deficient, so
    lmpar's parl == 0 and the zero-par seeding path runs.  MINPACK seeds
    par = gnorm/dxnorm there (lmpar.f), not an arbitrary fraction of
    paru — pin the iterates against the real MINPACK under both the
    production truncated budget and full convergence."""
    fn3, jac3, x0_3 = _exp_fit_problem()

    def fn(x):
        return fn3(x[:3])

    def jac(x):
        J3 = jac3(x[:3])
        return np.concatenate([J3, np.zeros((J3.shape[0], 1))], axis=1)

    x0 = np.concatenate([x0_3, [0.37]])

    res = lmder(fn, jac, x0, ftol=1e-6, xtol=1e-6, maxfev=10)
    x_sp, _, info, _, _ = leastsq(
        fn, x0, Dfun=jac, ftol=1e-6, xtol=1e-6, maxfev=10, full_output=True
    )
    assert res.nfev == info["nfev"]
    np.testing.assert_allclose(res.x, x_sp, rtol=1e-6, atol=1e-9)
    assert res.x[3] == 0.37  # the frozen parameter never moves

    res_full = lmder(fn, jac, x0, ftol=1e-10, xtol=1e-10, maxfev=400)
    x_sp_full, _, info_full, _, ier = leastsq(
        fn, x0, Dfun=jac, ftol=1e-10, xtol=1e-10, maxfev=400,
        full_output=True,
    )
    assert ier in (1, 2, 3, 4)
    np.testing.assert_allclose(res_full.x, x_sp_full, rtol=1e-7, atol=1e-10)


def test_trust_region_and_scaling_semantics():
    """Deterministic, and the first step honours delta = factor*||D x0||."""
    fn, jac, x0 = _exp_fit_problem()
    r1 = lmder(fn, jac, x0, maxfev=10)
    r2 = lmder(fn, jac, x0, maxfev=10)
    assert np.array_equal(r1.x, r2.x)
    assert r1.cost < float(fn(x0) @ fn(x0))  # made progress within budget
