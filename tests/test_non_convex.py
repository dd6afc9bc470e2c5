"""Non-convexity detection (coverage model:
reference src/osqp/tests/non_convex_test.py)."""

import numpy as np
import numpy.testing as nptest
import pytest

import osqp_tpu as osqp

import problems


def test_non_convex_small_sigma(algebra, solver_type, atol, rtol, decimal_tol):
    P, q, A, l, u = problems.non_convex()
    model = osqp.OSQP(algebra=algebra)
    if solver_type == 'direct':
        # QDLDL-equivalent inertia check fails at setup
        with pytest.raises(osqp.OSQPException):
            model.setup(P=P, q=q, A=A, l=l, u=u, solver_type=solver_type, sigma=1e-6, verbose=False)
    else:
        model.setup(P=P, q=q, A=A, l=l, u=u, solver_type=solver_type, sigma=1e-6, verbose=False)
        res = model.solve()
        assert res.info.status_val in (
            model.constant('OSQP_MAX_ITER_REACHED'),
            model.constant('OSQP_NON_CVX'),
        )


def test_non_convex_big_sigma(algebra, solver_type, atol, rtol, decimal_tol):
    P, q, A, l, u = problems.non_convex()
    model = osqp.OSQP(algebra=algebra)
    model.setup(P=P, q=q, A=A, l=l, u=u, sigma=5, solver_type=solver_type, verbose=False)
    res = model.solve()
    assert res.info.status_val == model.constant('OSQP_NON_CVX')
    assert np.isnan(res.info.obj_val)


def test_nan(algebra, solver_type, atol, rtol, decimal_tol):
    model = osqp.OSQP(algebra=algebra)
    nptest.assert_approx_equal(model.constant('OSQP_NAN'), np.nan)
