"""m = 0 problems (coverage model: reference src/osqp/tests/unconstrained_test.py)."""

import numpy.testing as nptest

import osqp_tpu as osqp

import problems
from utils import load_high_accuracy


def test_unconstrained_problem(algebra, solver_type, atol, rtol, decimal_tol):
    P, q, A, l, u = problems.unconstrained()
    model = osqp.OSQP(algebra=algebra)
    model.setup(
        P=P, q=q, A=A, l=l, u=u,
        verbose=False, eps_abs=1e-08, eps_rel=1e-08, polishing=False,
        solver_type=solver_type,
    )
    res = model.solve()
    x_sol, _, obj_sol = load_high_accuracy('test_unconstrained_problem')
    nptest.assert_allclose(res.x, x_sol, rtol=rtol, atol=atol)
    nptest.assert_almost_equal(res.info.obj_val, obj_sol, decimal=decimal_tol)
