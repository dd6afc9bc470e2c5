"""Polish (coverage model: reference src/osqp/tests/polishing_test.py)."""

from types import SimpleNamespace

import numpy.testing as nptest
import pytest

import osqp_tpu as osqp

import problems
from utils import load_high_accuracy


@pytest.fixture
def self(algebra, solver_type, atol, rtol, decimal_tol):
    ns = SimpleNamespace()
    ns.opts = {
        'verbose': False,
        'eps_abs': 1e-03,
        'eps_rel': 1e-03,
        'scaling': 10,
        'rho': 0.1,
        'alpha': 1.6,
        'max_iter': 2500,
        'polishing': True,
        'polish_refine_iter': 4,
        'solver_type': solver_type,
    }
    ns.model = osqp.OSQP(algebra=algebra)
    ns.atol, ns.rtol, ns.decimal_tol = atol, rtol, decimal_tol
    return ns


def _check(self, res, name, check_y=True):
    x_sol, y_sol, obj_sol = load_high_accuracy(name)
    nptest.assert_allclose(res.x, x_sol, rtol=self.rtol, atol=self.atol)
    if check_y and len(y_sol):
        nptest.assert_allclose(res.y, y_sol, rtol=self.rtol, atol=self.atol)
    nptest.assert_almost_equal(res.info.obj_val, obj_sol, decimal=self.decimal_tol)


def test_polish_simple(self):
    P, q, A, l, u = problems.polish_simple()
    self.model.setup(P=P, q=q, A=A, l=l, u=u, **self.opts)
    res = self.model.solve()
    assert res.info.status_polish == 1
    _check(self, res, 'test_polish_simple')


def test_polish_unconstrained(self):
    P, q, A, l, u = problems.polish_unconstrained()
    self.model.setup(P=P, q=q, A=A, l=l, u=u, **self.opts)
    res = self.model.solve()
    _check(self, res, 'test_polish_unconstrained', check_y=False)


def test_polish_random(self):
    P, q, A, l, u = problems.polish_random()
    self.model.setup(P=P, q=q, A=A, l=l, u=u, **self.opts)
    assert self.model.solver_type == self.opts['solver_type']
    res = self.model.solve()
    _check(self, res, 'test_polish_random')
