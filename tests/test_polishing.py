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


def test_polish_rejected_linesearch(self):
    """Rejected polish must return the reference's line-search fallback
    family (ref _osqp.py:1817-1826, 1830-1855): N unscaled, normal-cone-
    projected samples of the ADMM->polished segment, with t=0 equal to the
    ADMM solution.  A huge polish regularization (delta=1) forces rejection.
    """
    import numpy as np

    P, q, A, l, u = problems.polish_random()
    opts = dict(self.opts, delta=1.0, polish_refine_iter=0)
    self.model.setup(P=P, q=q, A=A, l=l, u=u, **opts)
    res = self.model.solve()
    assert res.info.status_val == 1
    assert res.info.status_polish == -1, res.info.status_polish
    ls = res.linesearch
    assert ls is not None
    n, m = P.shape[0], A.shape[0]
    assert ls.X.shape == (1000, n) and ls.Z.shape == (1000, m) and ls.Y.shape == (1000, m)
    assert ls.t[0] == 0.0 and np.isclose(ls.t[-1], 0.002)
    # float32 chip rows: projection/unscaling arithmetic carries the f32
    # noise floor; the CONTRACT (box membership, complementary slackness)
    # is the same, the margins are precision-class margins
    from utils import f32_device

    margin = 1e-4 if f32_device() else 1e-9
    eq_r, eq_a = (1e-4, 1e-5) if f32_device() else (1e-6, 1e-8)
    # t=0 is the (unscaled) ADMM solution the solver returned
    nptest.assert_allclose(ls.X[0], res.x, rtol=eq_r, atol=eq_a)
    nptest.assert_allclose(ls.Y[0], res.y, rtol=eq_r, atol=eq_a)
    # every sample satisfies the normal-cone constraint on the ORIGINAL data:
    # z in [l, u] and y_i != 0 only at active bounds
    assert (ls.Z >= l[None, :] - margin).all() and (ls.Z <= u[None, :] + margin).all()
    interior = (ls.Z > l[None, :] + margin) & (ls.Z < u[None, :] - margin)
    assert np.abs(np.where(interior, ls.Y, 0.0)).max() < margin
    # the family brackets points at least as good as the ADMM endpoint
    Pd, Ad = P.toarray(), A.toarray()
    pri = np.abs(ls.X @ Ad.T - ls.Z).max(axis=1)
    dua = np.abs(ls.X @ Pd.T + q[None, :] + ls.Y @ Ad).max(axis=1)
    worst = np.maximum(pri, dua)
    assert worst.min() <= worst[0] + max(1e-12, margin * 1e-2)


def test_polish_accepted_has_no_linesearch(self):
    P, q, A, l, u = problems.polish_simple()
    self.model.setup(P=P, q=q, A=A, l=l, u=u, **self.opts)
    res = self.model.solve()
    assert res.info.status_polish == 1
    assert res.linesearch is None
