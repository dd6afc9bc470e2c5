"""Shared test-problem constructions.

Single source of truth for the QP instances used by both the golden-solution
generator (tools/make_goldens.py) and the test files.  The instances mirror
the coverage of the reference suite (reference src/osqp/tests/*_test.py):
each is a deterministic (seeded) problem family.
"""

import numpy as np
import scipy.sparse as sparse


def basic_qp():
    P = sparse.diags([11.0, 0.0], format='csc')
    q = np.array([3.0, 4.0])
    A = sparse.csc_matrix([[-1, 0], [0, -1], [-1, -3], [2, 5], [3, 4]], dtype=float)
    u = np.array([0.0, 0.0, -15.0, 100.0, 80.0])
    l = -1e06 * np.ones(len(u))
    return P, q, A, l, u


def update_matrices_family():
    np.random.seed(1)
    n, m, p = 5, 8, 0.7
    Pt = sparse.random(n, n, density=p)
    Pt_new = Pt.copy()
    Pt_new.data += 0.1 * np.random.randn(Pt.nnz)
    P = (Pt.T @ Pt + sparse.eye(n)).tocsc()
    P_new = (Pt_new.T @ Pt_new + sparse.eye(n)).tocsc()
    q = np.random.randn(n)
    A = sparse.random(m, n, density=p, format='csc')
    A_new = A.copy()
    A_new.data += np.random.randn(A_new.nnz)
    l = np.zeros(m)
    u = 30 + np.random.randn(m)
    return dict(P=P, P_new=P_new, q=q, A=A, A_new=A_new, l=l, u=u, n=n, m=m)


def polish_simple():
    P = sparse.diags([11.0, 0.0], format='csc')
    q = np.array([3.0, 4.0])
    A = sparse.csc_matrix([[-1, 0], [0, -1], [-1, -3], [2, 5], [3, 4]], dtype=float)
    u = np.array([0.0, 0.0, -15.0, 100.0, 80.0])
    l = -1e05 * np.ones(len(u))
    return P, q, A, l, u


def polish_unconstrained():
    np.random.seed(4)
    n = 30
    P = (sparse.diags(np.random.rand(n)) + 0.2 * sparse.eye(n)).tocsc()
    q = np.random.randn(n)
    A = sparse.csc_matrix((0, n))
    return P, q, A, np.array([]), np.array([])


def polish_random():
    np.random.seed(6)
    n, m = 30, 50
    Pt = sparse.random(n, n)
    P = (Pt.T @ Pt).tocsc()
    q = np.random.randn(n)
    A = sparse.csc_matrix(np.random.randn(m, n))
    l = -3 + np.random.randn(m)
    u = 3 + np.random.randn(m)
    return P, q, A, l, u


def unconstrained():
    np.random.seed(4)
    n = 30
    P = (sparse.diags(np.random.rand(n)) + 0.2 * sparse.eye(n)).tocsc()
    q = np.random.randn(n)
    A = sparse.csc_matrix((0, n))
    return P, q, A, np.array([]), np.array([])


def feasibility():
    np.random.seed(4)
    n = m = 30
    P = sparse.csc_matrix((n, n))
    q = np.zeros(n)
    A = sparse.random(m, n, density=1.0, format='csc')
    u = np.random.rand(m)
    l = u.copy()
    return P, q, A, l, u


def primal_infeasible():
    np.random.seed(4)
    n, m = 50, 500
    Pt = np.random.rand(n, n)
    P = sparse.triu(Pt.T @ Pt, format='csc')
    q = np.random.rand(n)
    A = sparse.random(m, n).tolil()
    u = 3 + np.random.randn(m)
    l = -3 + np.random.randn(m)
    k = n // 2
    A[k, :] = A[k + 1, :]
    l[k] = u[k + 1] + 10 * np.random.rand()
    u[k] = l[k] + 0.5
    return P, q, A.tocsc(), l, u


def dual_infeasible_lp():
    P = sparse.csc_matrix((2, 2))
    q = np.array([2.0, -1.0])
    A = sparse.eye(2, format='csc')
    l = np.array([0.0, 0.0])
    u = np.array([np.inf, np.inf])
    return P, q, A, l, u


def dual_infeasible_qp():
    P = sparse.diags([4.0, 0.0], format='csc')
    q = np.array([0.0, 2.0])
    A = sparse.csc_matrix([[1.0, 1.0], [-1.0, 1.0]])
    l = np.array([-np.inf, -np.inf])
    u = np.array([2.0, 3.0])
    return P, q, A, l, u


def primal_dual_infeasible():
    P = sparse.csc_matrix((2, 2))
    q = np.array([-1.0, -1.0])
    A = sparse.csc_matrix([[1.0, -1.0], [-1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])
    l = np.array([1.0, 1.0, 0.0, 0.0])
    u = np.inf * np.ones(4)
    return P, q, A, l, u


def non_convex():
    P = sparse.triu([[2.0, 5.0], [5.0, 1.0]], format='csc')
    q = np.array([3.0, 4.0])
    A = sparse.csc_matrix([[-1.0, 0.0], [0.0, -1.0], [-1.0, 3.0], [2.0, 5.0], [3.0, 4.0]])
    u = np.array([0.0, 0.0, -15.0, 100.0, 80.0])
    l = -np.inf * np.ones(len(u))
    return P, q, A, l, u


def warm_start_big():
    np.random.seed(2)
    n, m = 100, 200
    A = sparse.random(m, n, density=0.9, format='csc')
    l = -np.random.rand(m) * 2.0
    u = np.random.rand(m) * 2.0
    P = sparse.random(n, n, density=0.9)
    P = sparse.triu(P @ P.T, format='csc')
    q = np.random.randn(n)
    return P, q, A, l, u
