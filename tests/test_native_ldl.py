"""Native sparse LDL' (osqp_tpu/native/ldl.cpp + ldl.py wrapper).

Pins the fill-reducing-ordering contract: solves and numeric-only
refactorizations speak the caller's original triu-CSC ordering regardless of
the internal permutation, the inertia is permutation-invariant, and RCM
strictly reduces fill on a banded MPC-style KKT matrix.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from osqp_tpu.native import ldl as native_ldl

pytestmark = pytest.mark.skipif(
    not native_ldl.available(), reason='native LDL library unavailable'
)


def _kkt(n, m, seed, density=0.3):
    rng = np.random.default_rng(seed)
    L = sp.random(n, n, density=density, random_state=rng)
    P = (L @ L.T + 0.1 * sp.eye(n)).tocsc()
    A = sp.random(m, n, density=density, random_state=rng).tocsc()
    rho_inv = rng.random(m) + 0.1
    K = sp.bmat(
        [[P + 1e-6 * sp.eye(n), A.T], [A, -sp.diags(rho_inv)]], format='csc'
    )
    K_triu = sp.triu(K, format='csc')
    K_triu.sort_indices()
    return K, K_triu, P, A, rho_inv


@pytest.mark.parametrize('ordering', ['rcm', 'natural'])
def test_solve_and_inertia(ordering, monkeypatch):
    monkeypatch.setenv('OSQP_TPU_LDL_ORDERING', ordering)
    rng = np.random.default_rng(0)
    for seed in range(5):
        n, m = int(rng.integers(2, 50)), int(rng.integers(1, 50))
        K, K_triu, *_ = _kkt(n, m, seed)
        fac = native_ldl.LDLFactor(K_triu)
        assert fac.n_positive == n  # quasi-definite inertia, any ordering
        b = rng.standard_normal(n + m)
        x = fac.solve(b)
        np.testing.assert_allclose(K @ x, b, atol=1e-8)


def test_update_values_caller_order(monkeypatch):
    monkeypatch.setenv('OSQP_TPU_LDL_ORDERING', 'rcm')
    n, m = 40, 60
    K, K_triu, P, A, rho_inv = _kkt(n, m, seed=7)
    fac = native_ldl.LDLFactor(K_triu)
    assert fac._perm is not None, 'expected a non-identity RCM ordering here'

    K2 = sp.bmat(
        [[2.5 * P + 1e-6 * sp.eye(n), A.T], [A, -sp.diags(3.0 * rho_inv)]],
        format='csc',
    )
    K2_triu = sp.triu(K2, format='csc')
    K2_triu.sort_indices()
    assert (K2_triu.indptr == K_triu.indptr).all()
    assert (K2_triu.indices == K_triu.indices).all()

    fac.update_values(K2_triu.data)  # data in the ORIGINAL ordering
    b = np.random.default_rng(1).standard_normal(n + m)
    x = fac.solve(b)
    np.testing.assert_allclose(K2 @ x, b, atol=1e-8)


def test_rcm_reduces_fill_banded_kkt(monkeypatch):
    # Tridiagonal P + identity-ish A: the classic banded MPC KKT, where the
    # natural [x-block; constraint-block] ordering couples distant columns.
    n = 300
    P = sp.diags(
        [np.full(n, 2.0), np.full(n - 1, -1.0), np.full(n - 1, -1.0)],
        [0, -1, 1],
    ).tocsc()
    rng = np.random.default_rng(2)
    A = (sp.random(2 * n, n, density=0.005, random_state=rng)
         + sp.eye(2 * n, n)).tocsc()
    K = sp.bmat(
        [[P + 1e-6 * sp.eye(n), A.T], [A, -sp.diags(np.full(2 * n, 10.0))]],
        format='csc',
    )
    K_triu = sp.triu(K, format='csc')
    K_triu.sort_indices()

    monkeypatch.setenv('OSQP_TPU_LDL_ORDERING', 'natural')
    nnz_nat = int(native_ldl.LDLFactor(K_triu)._Lp[-1])
    monkeypatch.setenv('OSQP_TPU_LDL_ORDERING', 'rcm')
    nnz_rcm = int(native_ldl.LDLFactor(K_triu)._Lp[-1])
    assert nnz_rcm < 0.6 * nnz_nat, (nnz_rcm, nnz_nat)


def test_zero_pivot_still_raises(monkeypatch):
    monkeypatch.setenv('OSQP_TPU_LDL_ORDERING', 'rcm')
    K = sp.csc_matrix(np.array([[0.0, 1.0], [0.0, 0.0]]))
    K_triu = sp.triu(K + K.T, format='csc')
    with pytest.raises((ZeroDivisionError, ValueError)):
        native_ldl.LDLFactor(K_triu)


@pytest.mark.parametrize('ordering', ['rcm', 'natural'])
def test_unsorted_indices_caller_order(ordering, monkeypatch):
    """An input CSC with UNSORTED column indices must factor correctly and
    update_values must still speak the caller's original data order."""
    monkeypatch.setenv('OSQP_TPU_LDL_ORDERING', ordering)
    K, K_triu, *_ = _kkt(12, 9, seed=21)
    # scramble indices within each column
    rng = np.random.default_rng(5)
    indptr = K_triu.indptr.copy()
    indices = K_triu.indices.copy()
    data = K_triu.data.copy()
    for j in range(K_triu.shape[1]):
        s, e = indptr[j], indptr[j + 1]
        perm = rng.permutation(e - s)
        indices[s:e] = indices[s:e][perm]
        data[s:e] = data[s:e][perm]
    K_scr = sp.csc_matrix((data, indices, indptr), shape=K_triu.shape)
    assert not K_scr.has_sorted_indices

    fac = native_ldl.LDLFactor(K_scr)
    b = rng.standard_normal(K.shape[0])
    np.testing.assert_allclose(K @ fac.solve(b), b, atol=1e-8)

    # numeric-only update in the caller's (scrambled) data order
    data2 = data * 1.7
    K2 = sp.csc_matrix((data2, indices, indptr), shape=K_triu.shape)
    fac.update_values(data2)
    x2 = fac.solve(b)
    np.testing.assert_allclose(K2 @ x2 + K2.T @ x2 - sp.diags(K2.diagonal()) @ x2, b, atol=1e-8)


def test_both_triangles_rejected(monkeypatch):
    """A full symmetric CSC (both triangles stored) must fail loudly on both
    ordering paths, never silently collapse duplicates."""
    K, K_triu, *_ = _kkt(10, 8, seed=3)
    for ordering in ('rcm', 'natural'):
        monkeypatch.setenv('OSQP_TPU_LDL_ORDERING', ordering)
        with pytest.raises(ValueError):
            native_ldl.LDLFactor(sp.csc_matrix(K))


def test_rcm_skipped_when_fill_worse(monkeypatch):
    """Arrow pattern (one dense final row/col): natural ordering is already
    fill-free; the ordering choice must not regress it."""
    monkeypatch.setenv('OSQP_TPU_LDL_ORDERING', 'rcm')
    n = 40
    d = sp.diags(np.full(n, 4.0)).tolil()
    d[:, -1] = 1.0
    d[-1, -1] = 4.0 * n
    K_triu = sp.triu(d.tocsc(), format='csc')
    K_triu.sort_indices()
    fac = native_ldl.LDLFactor(K_triu)
    monkeypatch.setenv('OSQP_TPU_LDL_ORDERING', 'natural')
    fac_nat = native_ldl.LDLFactor(K_triu)
    assert int(fac._Lp[-1]) <= int(fac_nat._Lp[-1])
