"""Pure feasibility problem, l == u (coverage model:
reference src/osqp/tests/feasibility_test.py)."""

import numpy.testing as nptest

import osqp_tpu as osqp

import problems
from utils import load_high_accuracy


def test_feasibility_problem(algebra, solver_type, atol, rtol, decimal_tol):
    P, q, A, l, u = problems.feasibility()
    model = osqp.OSQP(algebra=algebra)
    model.setup(
        P=P, q=q, A=A, l=l, u=u,
        verbose=False, eps_abs=1e-06, eps_rel=1e-06, scaling=10, alpha=1.6,
        max_iter=5000, polishing=False, warm_starting=True,
        polish_refine_iter=4, solver_type=solver_type,
    )
    res = model.solve()

    if solver_type == 'direct':
        x_sol, y_sol, obj_sol = load_high_accuracy('test_feasibility_problem')
        nptest.assert_allclose(res.x, x_sol, rtol=rtol, atol=atol)
        nptest.assert_allclose(res.y, y_sol, rtol=rtol, atol=atol)
        nptest.assert_almost_equal(res.info.obj_val, obj_sol, decimal=decimal_tol)
    else:
        # The short-budget CG solver stalls on this all-equality problem, like
        # the reference's indirect backends (reference feasibility_test.py:51-56).
        assert res.info.status_val in (
            model.constant('OSQP_MAX_ITER_REACHED'),
            model.constant('OSQP_SOLVED'),
        )
