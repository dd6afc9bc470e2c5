"""P/A value updates at fixed sparsity (coverage model:
reference src/osqp/tests/update_matrices_test.py)."""

from types import SimpleNamespace

import numpy as np
import numpy.testing as nptest
import pytest
from scipy import sparse

import osqp_tpu as osqp

import problems
from utils import load_high_accuracy


@pytest.fixture
def self(algebra, solver_type, atol, rtol, decimal_tol):
    ns = SimpleNamespace(**problems.update_matrices_family())
    ns.P_triu = sparse.triu(ns.P).tocsc()
    ns.P_triu_new = sparse.triu(ns.P_new).tocsc()
    ns.opts = {'eps_abs': 1e-08, 'eps_rel': 1e-08, 'verbose': False}
    ns.model = osqp.OSQP(algebra=algebra)
    ns.model.setup(
        P=ns.P, q=ns.q, A=ns.A, l=ns.l, u=ns.u, solver_type=solver_type, **ns.opts
    )
    ns.rtol, ns.atol, ns.decimal_tol = rtol, atol, decimal_tol
    return ns


def _check(self, res, name):
    x_sol, y_sol, obj_sol = load_high_accuracy(name)
    nptest.assert_allclose(res.x, x_sol, rtol=self.rtol, atol=self.atol)
    nptest.assert_allclose(res.y, y_sol, rtol=self.rtol, atol=self.atol)
    nptest.assert_almost_equal(res.info.obj_val, obj_sol, decimal=self.decimal_tol)


def test_solve(self):
    _check(self, self.model.solve(), 'test_solve')


def test_update_P(self):
    Px = self.P_triu_new.data
    self.model.update(Px=Px, Px_idx=np.arange(self.P_triu_new.nnz))
    _check(self, self.model.solve(), 'test_update_P')


def test_update_P_allind(self):
    self.model.update(Px=self.P_triu_new.data)
    _check(self, self.model.solve(), 'test_update_P')


def test_update_A(self):
    self.model.update(Ax=self.A_new.data, Ax_idx=np.arange(self.A_new.nnz))
    _check(self, self.model.solve(), 'test_update_A')


def test_update_A_allind(self):
    self.model.update(Ax=self.A_new.data)
    _check(self, self.model.solve(), 'test_update_A')


def test_update_P_A_indP_indA(self):
    self.model.update(
        Px=self.P_triu_new.data,
        Px_idx=np.arange(self.P_triu_new.nnz),
        Ax=self.A_new.data,
        Ax_idx=np.arange(self.A_new.nnz),
    )
    _check(self, self.model.solve(), 'test_update_P_A')


def test_update_P_A_indP(self):
    self.model.update(
        Px=self.P_triu_new.data, Px_idx=np.arange(self.P_triu_new.nnz), Ax=self.A_new.data
    )
    _check(self, self.model.solve(), 'test_update_P_A')


def test_update_P_A_indA(self):
    self.model.update(
        Px=self.P_triu_new.data, Ax=self.A_new.data, Ax_idx=np.arange(self.A_new.nnz)
    )
    _check(self, self.model.solve(), 'test_update_P_A')


def test_update_P_A_allind(self):
    self.model.update(Px=self.P_triu_new.data, Ax=self.A_new.data)
    _check(self, self.model.solve(), 'test_update_P_A')


def test_update_partial_idx(self):
    # update only a subset of P entries via explicit indices
    Px = self.P_triu_new.data
    idx = np.arange(self.P_triu_new.nnz)
    half = len(idx) // 2
    self.model.update(Px=Px[:half], Px_idx=idx[:half])
    self.model.update(Px=Px[half:], Px_idx=idx[half:])
    _check(self, self.model.solve(), 'test_update_P')


def test_triu_to_full_preserves_explicit_zeros():
    """utils/patterns.triu_to_full must keep explicit stored zeros
    (reserved update slots) that scipy's `T + T.T - diags` construction
    silently prunes — the root cause of the round-5 pattern-desync bug."""
    import numpy as np
    import scipy.sparse as sp

    from osqp_tpu.utils.patterns import triu_to_full

    T = sp.coo_matrix(
        ([1.0, 2.0, 0.0, 0.5], ([0, 1, 0, 0], [0, 1, 2, 1])), shape=(3, 3)
    ).tocsc()
    F = triu_to_full(T)
    # pattern: 4 triu entries + 2 mirrored off-diagonals (incl. the zero)
    assert F.nnz == 6, F.nnz
    dense = F.toarray()
    np.testing.assert_allclose(dense, dense.T)
    np.testing.assert_allclose(
        dense, [[1.0, 0.5, 0.0], [0.5, 2.0, 0.0], [0.0, 0.0, 0.0]]
    )
    # the explicit zeros are STORED at (0,2) and (2,0)
    pos = set(zip(*F.nonzero())) | {
        (int(r), int(c)) for r, c in zip(F.tocoo().row, F.tocoo().col)
    }
    assert (0, 2) in pos and (2, 0) in pos
