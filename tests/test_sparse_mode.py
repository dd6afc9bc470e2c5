"""Large-problem sparse (BCOO) mode of the jax backend: indirect PCG with
matvec-only operators, host-side Ruiz scaling.  The TPU-native answer to the
reference's 'indirect solver for large QPs' guidance (reference
interface.py:254-260)."""

import numpy as np
import numpy.testing as nptest
import pytest
import scipy.sparse as sparse

import osqp_tpu as osqp
from osqp_tpu.backends import jax_backend
from osqp_tpu._oracle.solver import ReferenceSolver


def _random_sparse_qp(n, m, density, seed=0):
    rng = np.random.default_rng(seed)
    Pt = sparse.random(n, n, density=density, random_state=rng)
    P = (Pt.T @ Pt + 0.1 * sparse.eye(n)).tocsc()
    q = rng.standard_normal(n)
    A = sparse.random(m, n, density=density, random_state=rng, format='csc')
    # ensure no empty rows (loose rows are fine but keep it interesting)
    A = A + 0.01 * sparse.random(m, n, density=5.0 / n, random_state=rng)
    A = A.tocsc()
    x0 = rng.standard_normal(n)
    s0 = rng.random(m) + 0.1
    u = A @ x0 + s0
    l = u - 2 * s0
    return P, q, A, l, u


def _sparse_solver_model(**solver_kwargs):
    # backend kwargs forward through the public constructor
    return osqp.OSQP(algebra='jax', **solver_kwargs)


def test_sparse_matches_oracle():
    n, m = 300, 450
    P, q, A, l, u = _random_sparse_qp(n, m, 0.02)
    opts = dict(
        verbose=False, eps_abs=1e-6, eps_rel=1e-6, max_iter=20000,
        solver_type='indirect',
    )

    model = _sparse_solver_model(sparse=True)
    model.setup(P=P, q=q, A=A, l=l, u=u, **opts)
    assert model._solver._is_sparse
    res = model.solve()
    assert res.info.status_val == 1

    ref = ReferenceSolver()
    ref.setup(P, q, A, l, u, verbose=False, eps_abs=1e-8, eps_rel=1e-8, max_iter=40000)
    sol, info = ref.solve()
    nptest.assert_allclose(res.x, sol.x, rtol=1e-3, atol=1e-3)
    nptest.assert_allclose(res.y, sol.y, rtol=1e-3, atol=1e-3)


def test_sparse_update_vectors():
    n, m = 200, 300
    P, q, A, l, u = _random_sparse_qp(n, m, 0.03, seed=1)
    model = _sparse_solver_model(sparse=True)
    model.setup(P=P, q=q, A=A, l=l, u=u, verbose=False, eps_abs=1e-6, eps_rel=1e-6,
                max_iter=20000, solver_type='indirect')
    model.solve()

    q_new = q + 0.1
    model.update(q=q_new)
    res = model.solve()
    assert res.info.status_val == 1

    ref = ReferenceSolver()
    ref.setup(P, q_new, A, l, u, verbose=False, eps_abs=1e-8, eps_rel=1e-8, max_iter=40000)
    sol, _ = ref.solve()
    nptest.assert_allclose(res.x, sol.x, rtol=1e-3, atol=1e-3)


def test_sparse_update_matrix_values():
    n, m = 150, 200
    P, q, A, l, u = _random_sparse_qp(n, m, 0.03, seed=2)
    model = _sparse_solver_model(sparse=True)
    model.setup(P=P, q=q, A=A, l=l, u=u, verbose=False, eps_abs=1e-6, eps_rel=1e-6,
                max_iter=20000, solver_type='indirect')
    model.solve()

    A_new = A.copy()
    A_new.data = A_new.data * 1.1
    model.update(Ax=A_new.data)
    res = model.solve()
    assert res.info.status_val == 1

    ref = ReferenceSolver()
    ref.setup(P, q, A_new, l, u, verbose=False, eps_abs=1e-8, eps_rel=1e-8, max_iter=40000)
    sol, _ = ref.solve()
    nptest.assert_allclose(res.x, sol.x, rtol=1e-3, atol=1e-3)


def test_sparse_forces_indirect():
    n, m = 100, 150
    P, q, A, l, u = _random_sparse_qp(n, m, 0.05, seed=3)
    model = _sparse_solver_model(sparse=True)
    # user asked for direct; sparse mode falls back to CG
    model.setup(P=P, q=q, A=A, l=l, u=u, verbose=False, solver_type='direct',
                eps_abs=1e-5, eps_rel=1e-5, max_iter=20000)
    res = model.solve()
    assert res.info.status_val in (1, 2)


def test_sparse_polish():
    """Polish runs in sparse mode (CG on the masked Schur operator) and
    tightens the solution toward the high-accuracy oracle answer."""
    n, m = 250, 375
    P, q, A, l, u = _random_sparse_qp(n, m, 0.02, seed=3)
    opts = dict(
        verbose=False, eps_abs=1e-4, eps_rel=1e-4, max_iter=20000,
        solver_type='indirect', polishing=True,
    )
    model = _sparse_solver_model(sparse=True)
    model.setup(P=P, q=q, A=A, l=l, u=u, **opts)
    assert model._solver._is_sparse
    res = model.solve()
    assert res.info.status_val == 1
    assert res.info.status_polish == 1, res.info.status_polish

    ref = ReferenceSolver()
    ref.setup(P, q, A, l, u, verbose=False, eps_abs=1e-9, eps_rel=1e-9, max_iter=40000)
    sol, info = ref.solve()
    nptest.assert_allclose(res.x, sol.x, rtol=1e-4, atol=1e-4)
    nptest.assert_allclose(res.y, sol.y, rtol=1e-4, atol=1e-4)
