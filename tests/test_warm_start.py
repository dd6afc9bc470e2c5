"""Warm-start behavior (coverage model: reference src/osqp/tests/warm_start_test.py).
The <10-iteration re-solve from the optimum is a key regression target
(reference warm_start_test.py:49-57)."""

import numpy as np
import pytest

import osqp_tpu as osqp

import problems
from utils import solve_eps


def test_warm_start(algebra, solver_type, atol, rtol, decimal_tol):
    P, q, A, l, u = problems.warm_start_big()
    n, m = P.shape[0], A.shape[0]
    opts = {
        'verbose': False,
        'adaptive_rho': False,
        'eps_abs': solve_eps(1e-08, 1e-4) if solver_type == 'direct' else 1e-2,
        'eps_rel': solve_eps(1e-08, 1e-4) if solver_type == 'direct' else 1e-2,
        'polishing': False,
        'check_termination': 1,
        'solver_type': solver_type,
    }
    model = osqp.OSQP(algebra=algebra)
    model.setup(P=P, q=q, A=A, l=l, u=u, **opts)

    res = model.solve()
    x_opt, y_opt, tot_iter = res.x, res.y, res.info.iter

    # zero warm start reproduces the cold iteration count exactly
    model.warm_start(x=np.zeros(n), y=np.zeros(m))
    res = model.solve()
    assert res.info.iter == tot_iter

    # warm start at the optimum converges almost immediately
    model.warm_start(x=x_opt, y=y_opt)
    res = model.solve()
    assert res.info.iter < 10
