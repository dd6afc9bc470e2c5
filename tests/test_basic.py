"""Basic solve/update/settings behavior (coverage model:
reference src/osqp/tests/basic_test.py)."""

from types import SimpleNamespace

import numpy as np
import numpy.testing as nptest
import pytest

import osqp_tpu as osqp

import problems
from utils import load_high_accuracy


@pytest.fixture
def self(algebra, solver_type, atol, rtol, decimal_tol):
    ns = SimpleNamespace()
    ns.P, ns.q, ns.A, ns.l, ns.u = problems.basic_qp()
    ns.n = ns.P.shape[0]
    ns.m = ns.A.shape[0]
    ns.opts = {
        'verbose': False,
        'eps_abs': 1e-09,
        'eps_rel': 1e-09,
        'max_iter': 2500,
        'rho': 0.1,
        'adaptive_rho': False,
        'polishing': False,
        'check_termination': 1,
        'warm_starting': True,
        'solver_type': solver_type,
    }
    ns.model = osqp.OSQP(algebra=algebra)
    ns.model.setup(P=ns.P, q=ns.q, A=ns.A, l=ns.l, u=ns.u, **ns.opts)
    ns.atol = atol
    ns.rtol = rtol
    ns.decimal_tol = decimal_tol
    return ns


def test_basic_QP(self):
    res = self.model.solve()
    x_sol, y_sol, obj_sol = load_high_accuracy('test_basic_QP')
    nptest.assert_allclose(res.x, x_sol, rtol=self.rtol, atol=self.atol)
    nptest.assert_allclose(res.y, y_sol, rtol=self.rtol, atol=self.atol)
    nptest.assert_almost_equal(res.info.obj_val, obj_sol, decimal=self.decimal_tol)


def test_update_q(self):
    q_new = np.array([10.0, 20.0])
    self.model.update(q=q_new)
    res = self.model.solve()
    x_sol, y_sol, obj_sol = load_high_accuracy('test_update_q')
    nptest.assert_allclose(res.x, x_sol, rtol=self.rtol, atol=self.atol)
    nptest.assert_allclose(res.y, y_sol, rtol=self.rtol, atol=self.atol)
    nptest.assert_almost_equal(res.info.obj_val, obj_sol, decimal=self.decimal_tol)


def test_update_l(self):
    self.model.update(l=-50 * np.ones(self.m))
    res = self.model.solve()
    x_sol, y_sol, obj_sol = load_high_accuracy('test_update_l')
    nptest.assert_allclose(res.x, x_sol, rtol=self.rtol, atol=self.atol)
    nptest.assert_allclose(res.y, y_sol, rtol=self.rtol, atol=self.atol)
    nptest.assert_almost_equal(res.info.obj_val, obj_sol, decimal=self.decimal_tol)


def test_update_u(self):
    self.model.update(u=1000 * np.ones(self.m))
    res = self.model.solve()
    x_sol, y_sol, obj_sol = load_high_accuracy('test_update_u')
    nptest.assert_allclose(res.x, x_sol, rtol=self.rtol, atol=self.atol)
    nptest.assert_allclose(res.y, y_sol, rtol=self.rtol, atol=self.atol)
    nptest.assert_almost_equal(res.info.obj_val, obj_sol, decimal=self.decimal_tol)


def test_update_bounds(self):
    self.model.update(l=-100 * np.ones(self.m), u=1000 * np.ones(self.m))
    res = self.model.solve()
    x_sol, y_sol, obj_sol = load_high_accuracy('test_update_bounds')
    nptest.assert_allclose(res.x, x_sol, rtol=self.rtol, atol=self.atol)
    nptest.assert_allclose(res.y, y_sol, rtol=self.rtol, atol=self.atol)
    nptest.assert_almost_equal(res.info.obj_val, obj_sol, decimal=self.decimal_tol)


def test_update_max_iter(self):
    self.model.update_settings(max_iter=80)
    res = self.model.solve()
    assert res.info.status_val == self.model.constant('OSQP_MAX_ITER_REACHED')


def test_update_check_termination(self):
    self.model.update_settings(check_termination=0)
    res = self.model.solve()
    assert res.info.iter == self.opts['max_iter']


def test_update_rho(self):
    res_default = self.model.solve()

    opts = dict(self.opts)
    opts['rho'] = 0.7
    model = osqp.OSQP(algebra=self.model.algebra)
    model.setup(P=self.P, q=self.q, A=self.A, l=self.l, u=self.u, **opts)
    model.update_settings(rho=self.opts['rho'])
    res_updated_rho = model.solve()

    # rho-update determinism (reference basic_test.py:119-131)
    assert res_default.info.iter == res_updated_rho.info.iter


def test_upper_triangular_P(self):
    from scipy import sparse

    res_default = self.model.solve()
    P_triu = sparse.triu(self.P, format='csc')
    model = osqp.OSQP(algebra=self.model.algebra)
    model.setup(P=P_triu, q=self.q, A=self.A, l=self.l, u=self.u, **self.opts)
    res_triu = model.solve()

    nptest.assert_allclose(res_default.x, res_triu.x, rtol=self.rtol, atol=self.atol)
    nptest.assert_allclose(res_default.y, res_triu.y, rtol=self.rtol, atol=self.atol)
    nptest.assert_almost_equal(
        res_default.info.obj_val, res_triu.info.obj_val, decimal=self.decimal_tol
    )


def test_update_invalid(self):
    with pytest.raises(ValueError):
        self.model.update_settings(foo=42)


def test_solve_raise_error(self):
    res = self.model.solve(raise_error=True)
    assert res.info.status_val == self.model.constant('OSQP_SOLVED')


def test_warm_starting_obeyed(self):
    res1 = self.model.solve()
    # second solve warm-starts from the optimum -> far fewer iterations
    res2 = self.model.solve()
    assert res2.info.iter <= res1.info.iter
