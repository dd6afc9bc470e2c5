"""Batched (vmap) solver: correctness vs the per-instance reference core.

TPU-native replacement coverage for the reference's thread-batch tests
(reference src/osqp/tests/multithread_test.py and nn/torch.py batching)."""

import numpy as np
import pytest
import scipy.sparse as sparse

import osqp_tpu as osqp
from osqp_tpu._oracle.solver import ReferenceSolver
from osqp_tpu.batch import BatchedOSQP
from utils import f32_device, solve_eps

# solver eps per precision class: the iteration-exactness contract vs the
# float64 oracle holds on the f64 rows; the real-chip f32 rows check
# solution accuracy instead (a float32 solver cannot share iteration counts
# with a float64 one at 1e-8 residuals)
_EPS = solve_eps(1e-8)


def _random_batch(B, n, m, seed=0):
    rng = np.random.default_rng(seed)
    L = rng.standard_normal((B, n, n))
    P = 0.1 * np.einsum('bij,bkj->bik', L, L) + 0.1 * np.eye(n)
    q = rng.standard_normal((B, n))
    A = rng.standard_normal((B, m, n))
    x0 = rng.standard_normal((B, n))
    s0 = rng.random((B, m))
    u = np.einsum('bmn,bn->bm', A, x0) + s0
    l = u - 2 * s0
    return P, q, A, l, u


@pytest.fixture(scope='module')
def batch_setup():
    B, n, m = 8, 12, 18
    P, q, A, l, u = _random_batch(B, n, m)
    opts = dict(verbose=False, eps_abs=_EPS, eps_rel=_EPS)
    solver = BatchedOSQP()
    solver.setup(P, q, A, l, u, **opts)
    return solver, (P, q, A, l, u), opts, (B, n, m)


def test_batch_matches_reference_core(batch_setup):
    solver, (P, q, A, l, u), opts, (B, n, m) = batch_setup
    res = solver.solve()
    assert all(s == 1 for s in res.info.status_val)
    for b in range(B):
        ref = ReferenceSolver()
        ref.setup(sparse.csc_matrix(P[b]), q[b], sparse.csc_matrix(A[b]), l[b], u[b], **opts)
        sol, info = ref.solve()
        if f32_device():
            np.testing.assert_allclose(res.x[b], sol.x, rtol=1e-2, atol=1e-3)
            np.testing.assert_allclose(res.y[b], sol.y, rtol=1e-2, atol=1e-3)
        else:
            # iteration-exact agreement with the float64 reference core
            assert info.iter == res.info.iter[b]
            np.testing.assert_allclose(res.x[b], sol.x, rtol=1e-7, atol=1e-8)
            np.testing.assert_allclose(res.y[b], sol.y, rtol=1e-7, atol=1e-8)


def test_batch_warm_mpc_step():
    B, n, m = 8, 12, 18
    P, q, A, l, u = _random_batch(B, n, m)
    opts = dict(verbose=False, eps_abs=_EPS, eps_rel=_EPS)
    solver = BatchedOSQP()
    solver.setup(P, q, A, l, u, **opts)
    res_cold = solver.solve()
    solver.update(q=q + 0.001)
    res_warm = solver.solve()
    assert all(s == 1 for s in res_warm.info.status_val)
    # warm re-solve after a small perturbation is much cheaper
    assert res_warm.info.iter.max() <= res_cold.info.iter.max()

    # and matches a fresh reference solve of the perturbed problem
    b = 0
    ref = ReferenceSolver()
    ref.setup(
        sparse.csc_matrix(P[b]), q[b] + 0.001, sparse.csc_matrix(A[b]), l[b], u[b], **opts
    )
    sol, _ = ref.solve()
    tol = (1e-2, 1e-3) if f32_device() else (1e-5, 1e-6)
    np.testing.assert_allclose(res_warm.x[b], sol.x, rtol=tol[0], atol=tol[1])


def test_batch_broadcast_shared_data():
    # shared P/A, per-instance q: typical scenario batch
    B, n, m = 4, 6, 9
    P1, q, A1, l, u = _random_batch(B, n, m, seed=3)
    P, A = P1[0], A1[0]
    l = np.einsum('mn,bn->bm', A, np.zeros((B, n))) - 1.0
    u = l + 4.0
    solver = BatchedOSQP()
    solver.setup(P, q, A, l, u, verbose=False, eps_abs=1e-6, eps_rel=1e-6)
    res = solver.solve()
    assert res.x.shape == (B, n)
    assert all(s == 1 for s in res.info.status_val)


def test_batch_mixed_statuses():
    # one infeasible instance inside an otherwise-feasible batch
    B, n, m = 4, 6, 9
    P, q, A, l, u = _random_batch(B, n, m, seed=4)
    l = l.copy()
    u = u.copy()
    # make instance 2 primal infeasible: contradictory duplicated rows
    A[2, 1] = A[2, 0]
    l[2, 1] = u[2, 0] + 1.0
    u[2, 1] = u[2, 0] + 1.5
    solver = BatchedOSQP()
    solver.setup(P, q, A, l, u, verbose=False, eps_abs=1e-6, eps_rel=1e-6)
    res = solver.solve()
    assert res.info.status_val[2] == 3  # OSQP_PRIMAL_INFEASIBLE
    for b in (0, 1, 3):
        assert res.info.status_val[b] == 1
        assert np.all(np.isfinite(res.x[b]))
