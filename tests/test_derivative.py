"""Adjoint derivative API (coverage model: reference
src/osqp/tests/derivative_test.py - validation against
scipy.optimize.approx_fprime finite differences of the loss
0.5*||x_hat - x_true||^2, including the equality-constrained and large
variants, reference derivative_test.py:502-684).

float32 chip rows (OSQP_TPU_TEST_DEVICE=tpu): finite differences need
float64 solves, so the jax-f32 rows instead validate the jax adjoint output
against the float64 oracle's adjoint output directly (no FD, no skip)."""

import numpy as np
import numpy.random as npr
import numpy.testing as npt
import pytest
from scipy import sparse
from scipy.optimize import approx_fprime

import osqp_tpu as osqp

from utils import f32_device


grad_precision = 1e-6
rel_tol = 5e-3
abs_tol = 5e-3

eps_abs = 1e-9
eps_rel = 1e-9
max_iter = 500000

# float32-chip row: reachable tolerances + float64 host polish for accuracy
f32_tol = dict(rel=5e-3, abs=5e-3)


def _setup_opts(algebra, eq=False):
    if algebra == 'jax' and f32_device():
        # residuals below ~1e-5 are unreachable at float32; polish (always
        # float64 host-side) recovers high-accuracy iterates for the adjoint.
        # Equality rows take rho*1e3, which amplifies the f32 noise floor —
        # those cases need the ladder-standard tolerance to reach SOLVED
        # (1e-5 left the r5 chip run at SOLVED_INACCURATE, which the
        # derivative API — like the reference — refuses).
        tol = 1e-4 if eq else 3e-6
        return dict(eps_abs=tol, eps_rel=tol, max_iter=200000,
                    polishing=True, verbose=False)
    return dict(eps_abs=eps_abs, eps_rel=eps_rel, max_iter=max_iter,
                verbose=False)


def get_prob(n=10, m=3, equalities=0, loose=0):
    L = np.random.randn(n, n - 1)
    P = sparse.csc_matrix(L.dot(L.T) + 0.1 * sparse.eye(n))
    x_0 = npr.randn(n)
    s_0 = npr.rand(m)
    A = sparse.csc_matrix(npr.randn(m, n))
    u = A.dot(x_0) + s_0
    l = A.dot(x_0) - s_0
    if equalities:
        # equality-constrained rows (ref derivative_test.py:510,557)
        u[:equalities] = l[:equalities]
    if loose:
        l[equalities:equalities + loose] = -1e30
    q = npr.randn(n)
    true_x = npr.randn(n)
    return P, q, A, l, u, true_x


def get_grads(algebra, P, q, A, l, u, true_x, eq=False):
    model = osqp.OSQP(algebra=algebra)
    model.setup(P, q, A, l, u, **_setup_opts(algebra, eq))
    results = model.solve()
    assert results.info.status_val == int(osqp.SolverStatus.OSQP_SOLVED), (
        results.info.status
    )
    model.adjoint_derivative_compute(dx=results.x - true_x)
    dP, dA = model.adjoint_derivative_get_mat(as_dense=True, dP_as_triu=False)
    dq, dl, du = model.adjoint_derivative_get_vec()
    return dP, dq, dA, dl, du, model, results


def solve_x(algebra, P, q, A, l, u):
    model = osqp.OSQP(algebra=algebra)
    model.setup(P, q, A, l, u, **_setup_opts(algebra))
    return model.solve().x


def _check_vec(algebra, got, make_fd, oracle_value):
    """float64 rows: validate against finite differences.  float32 chip
    rows: validate against the float64 oracle's adjoint (FD needs f64)."""
    if algebra == 'jax' and f32_device():
        npt.assert_allclose(got, oracle_value, rtol=f32_tol['rel'], atol=f32_tol['abs'])
    else:
        npt.assert_allclose(got, make_fd(), rtol=rel_tol, atol=abs_tol)


@pytest.mark.parametrize('algebra', ['numpy', 'jax'])
def test_dl_dq(algebra):
    npr.seed(1)
    n, m = 8, 5
    P, q, A, l, u, true_x = get_prob(n=n, m=m)
    dP, dq, dA, dl, du, _, _ = get_grads(algebra, P, q, A, l, u, true_x)

    def f(qv):
        x = solve_x(algebra, P, qv, A, l, u)
        return 0.5 * np.sum((x - true_x) ** 2)

    oracle = (get_grads('numpy', P, q, A, l, u, true_x)[1]
              if algebra == 'jax' and f32_device() else None)
    _check_vec(algebra, dq, lambda: approx_fprime(q, f, grad_precision), oracle)


@pytest.mark.parametrize('algebra', ['numpy', 'jax'])
def test_dl_dbounds(algebra):
    npr.seed(2)
    n, m = 8, 5
    P, q, A, l, u, true_x = get_prob(n=n, m=m)
    dP, dq, dA, dl, du, _, _ = get_grads(algebra, P, q, A, l, u, true_x)

    def f_l(lv):
        x = solve_x(algebra, P, q, A, lv, u)
        return 0.5 * np.sum((x - true_x) ** 2)

    def f_u(uv):
        x = solve_x(algebra, P, q, A, l, uv)
        return 0.5 * np.sum((x - true_x) ** 2)

    if algebra == 'jax' and f32_device():
        _, _, _, dl_o, du_o, _, _ = get_grads('numpy', P, q, A, l, u, true_x)
        npt.assert_allclose(dl, dl_o, rtol=f32_tol['rel'], atol=f32_tol['abs'])
        npt.assert_allclose(du, du_o, rtol=f32_tol['rel'], atol=f32_tol['abs'])
    else:
        npt.assert_allclose(dl, approx_fprime(l, f_l, grad_precision), rtol=rel_tol, atol=abs_tol)
        npt.assert_allclose(du, approx_fprime(u, f_u, grad_precision), rtol=rel_tol, atol=abs_tol)


@pytest.mark.parametrize('algebra', ['numpy', 'jax'])
def test_dl_dq_eq(algebra):
    """Equality-constrained adjoint (ref derivative_test.py:549-591
    test_dl_dq_eq): active equalities change the differentiable active-set
    structure; the adjoint must still match finite differences."""
    npr.seed(11)
    n, m = 20, 15
    P, q, A, l, u, true_x = get_prob(n=n, m=m, equalities=8)
    _, dq, _, _, _, _, _ = get_grads(algebra, P, q, A, l, u, true_x, eq=True)

    def f(qv):
        x = solve_x(algebra, P, qv, A, l, u)
        return 0.5 * np.sum((x - true_x) ** 2)

    oracle = (get_grads('numpy', P, q, A, l, u, true_x)[1]
              if algebra == 'jax' and f32_device() else None)
    _check_vec(algebra, dq, lambda: approx_fprime(q, f, grad_precision), oracle)


def test_dl_dq_eq_large():
    """Large equality+loose variant (ref derivative_test.py:593-637
    test_dl_dq_eq_large, n=100 m=120 with 20 equalities and 20 loose rows)."""
    npr.seed(12)
    n, m = 100, 120
    P, q, A, l, u, true_x = get_prob(n=n, m=m, equalities=20, loose=20)
    _, dq, _, _, _, _, _ = get_grads('numpy', P, q, A, l, u, true_x)

    def f(qv):
        x = solve_x('numpy', P, qv, A, l, u)
        return 0.5 * np.sum((x - true_x) ** 2)

    npt.assert_allclose(dq, approx_fprime(q, f, grad_precision),
                        rtol=rel_tol, atol=abs_tol)


@pytest.mark.parametrize('algebra', ['numpy'])
def test_dl_dA_eq(algebra):
    """dA with equality rows (ref derivative_test.py:502-547 test_dl_dA_eq),
    spot-checked entrywise with central differences."""
    npr.seed(13)
    n, m = 12, 9
    P, q, A, l, u, true_x = get_prob(n=n, m=m, equalities=4)
    _, _, dA, _, _, _, _ = get_grads(algebra, P, q, A, l, u, true_x)

    Ad = A.toarray()
    for (i, j) in [(0, 0), (2, 5), (5, 1), (8, 7)]:
        eps = grad_precision
        Ap = Ad.copy()
        Ap[i, j] += eps
        Am = Ad.copy()
        Am[i, j] -= eps
        fp = 0.5 * np.sum((solve_x(algebra, P, q, sparse.csc_matrix(Ap), l, u) - true_x) ** 2)
        fm = 0.5 * np.sum((solve_x(algebra, P, q, sparse.csc_matrix(Am), l, u) - true_x) ** 2)
        fd = (fp - fm) / (2 * eps)
        npt.assert_allclose(dA[i, j], fd, rtol=1e-2, atol=1e-3)


@pytest.mark.parametrize('algebra', ['numpy'])
def test_dl_dP_dA(algebra):
    npr.seed(3)
    n, m = 6, 4
    P, q, A, l, u, true_x = get_prob(n=n, m=m)
    dP, dq, dA, dl, du, _, _ = get_grads(algebra, P, q, A, l, u, true_x)

    Pd = P.toarray()
    for (i, j) in [(0, 0), (1, 3), (2, 2)]:
        eps = grad_precision
        Pp = Pd.copy()
        Pp[i, j] += eps
        Pp[j, i] = Pp[i, j]
        Pm = Pd.copy()
        Pm[i, j] -= eps
        Pm[j, i] = Pm[i, j]
        fp = 0.5 * np.sum((solve_x(algebra, sparse.csc_matrix(Pp), q, A, l, u) - true_x) ** 2)
        fm = 0.5 * np.sum((solve_x(algebra, sparse.csc_matrix(Pm), q, A, l, u) - true_x) ** 2)
        fd = (fp - fm) / (2 * eps)
        an = dP[i, j] + dP[j, i] if i != j else dP[i, j]
        npt.assert_allclose(an, fd, rtol=1e-2, atol=1e-3)

    Ad = A.toarray()
    for (i, j) in [(0, 0), (2, 4)]:
        eps = grad_precision
        Ap = Ad.copy()
        Ap[i, j] += eps
        Am = Ad.copy()
        Am[i, j] -= eps
        fp = 0.5 * np.sum((solve_x(algebra, P, q, sparse.csc_matrix(Ap), l, u) - true_x) ** 2)
        fm = 0.5 * np.sum((solve_x(algebra, P, q, sparse.csc_matrix(Am), l, u) - true_x) ** 2)
        fd = (fp - fm) / (2 * eps)
        npt.assert_allclose(dA[i, j], fd, rtol=1e-2, atol=1e-3)


def test_derivative_requires_solve():
    npr.seed(4)
    P, q, A, l, u, true_x = get_prob()
    model = osqp.OSQP(algebra='numpy')
    model.setup(P, q, A, l, u, verbose=False)
    with pytest.raises(ValueError):
        model.adjoint_derivative_compute(dx=np.zeros(P.shape[0]))


def test_derivative_dy_seed():
    """Loss including the dual solution: 0.5||x-xt||^2 + 0.5||y-yt||^2."""
    npr.seed(5)
    n, m = 8, 5
    P, q, A, l, u, true_x = get_prob(n=n, m=m)
    true_y = npr.randn(m)

    model = osqp.OSQP(algebra='numpy')
    model.setup(P, q, A, l, u, eps_abs=eps_abs, eps_rel=eps_rel, max_iter=max_iter, verbose=False)
    res = model.solve()
    model.adjoint_derivative_compute(dx=res.x - true_x, dy=res.y - true_y)
    dq, dl, du = model.adjoint_derivative_get_vec()

    def f(qv):
        model = osqp.OSQP(algebra='numpy')
        model.setup(P, qv, A, l, u, eps_abs=eps_abs, eps_rel=eps_rel, max_iter=max_iter, verbose=False)
        r = model.solve()
        return 0.5 * np.sum((r.x - true_x) ** 2) + 0.5 * np.sum((r.y - true_y) ** 2)

    npt.assert_allclose(dq, approx_fprime(q, f, grad_precision), rtol=rel_tol, atol=abs_tol)


def test_forward_derivative_dq():
    """Forward-mode sensitivities: the reference SKIPS these
    (reference derivative_test.py:98 'forward derivatives not implemented
    yet'); implemented and validated here."""
    npr.seed(7)
    n, m = 8, 5
    P, q, A, l, u, true_x = get_prob(n=n, m=m)

    def solve_model(qv):
        model = osqp.OSQP(algebra='numpy')
        model.setup(P, qv, A, l, u, eps_abs=1e-11, eps_rel=1e-11,
                    max_iter=500000, polishing=True, verbose=False)
        return model, model.solve()

    model, res = solve_model(q)
    dq = npr.randn(n)
    dx, dyl, dyu = model.forward_derivative(dq=dq)

    eps = 1e-6
    _, rp = solve_model(q + eps * dq)
    _, rm = solve_model(q - eps * dq)
    npt.assert_allclose(dx, (rp.x - rm.x) / (2 * eps), rtol=5e-3, atol=5e-3)
    npt.assert_allclose(
        dyu, (np.maximum(rp.y, 0) - np.maximum(rm.y, 0)) / (2 * eps),
        rtol=5e-3, atol=5e-3,
    )
    npt.assert_allclose(
        dyl, (np.maximum(-rp.y, 0) - np.maximum(-rm.y, 0)) / (2 * eps),
        rtol=5e-3, atol=5e-3,
    )


def test_forward_derivative_bounds_and_mats():
    npr.seed(8)
    n, m = 6, 4
    P, q, A, l, u, true_x = get_prob(n=n, m=m)

    def solve_model(lv=None, uv=None):
        model = osqp.OSQP(algebra='numpy')
        model.setup(P, q, A, l if lv is None else lv, u if uv is None else uv,
                    eps_abs=1e-11, eps_rel=1e-11, max_iter=500000,
                    polishing=True, verbose=False)
        return model, model.solve()

    model, res = solve_model()
    dl = npr.randn(m)
    du = npr.randn(m)
    dx, dyl, dyu = model.forward_derivative(dl=dl, du=du)
    eps = 1e-6
    _, rp = solve_model(lv=l + eps * dl, uv=u + eps * du)
    _, rm = solve_model(lv=l - eps * dl, uv=u - eps * du)
    npt.assert_allclose(dx, (rp.x - rm.x) / (2 * eps), rtol=5e-3, atol=5e-3)
