"""Basic solve/update/settings behavior (coverage model:
reference src/osqp/tests/basic_test.py).

Organized as a parametrized update matrix: each case stages data updates on a
warm solver and checks the re-solve against the golden fixture for the
equivalent fresh problem.
"""

import numpy as np
import numpy.testing as nptest
import pytest

import osqp_tpu as osqp

import problems
from utils import f32_device, load_high_accuracy, solve_eps

BASE_OPTS = dict(
    verbose=False,
    eps_abs=1e-09,
    eps_rel=1e-09,
    max_iter=2500,
    rho=0.1,
    adaptive_rho=False,
    polishing=False,
    check_termination=1,
    warm_starting=True,
)


def make_model(algebra, solver_type, **extra):
    P, q, A, l, u = problems.basic_qp()
    model = osqp.OSQP(algebra=algebra)
    opts = dict(BASE_OPTS, solver_type=solver_type, **extra)
    model.setup(P=P, q=q, A=A, l=l, u=u, **opts)
    return model


def assert_golden(res, golden, atol, rtol, decimal_tol):
    x_sol, y_sol, obj_sol = load_high_accuracy(golden)
    nptest.assert_allclose(res.x, x_sol, rtol=rtol, atol=atol)
    nptest.assert_allclose(res.y, y_sol, rtol=rtol, atol=atol)
    nptest.assert_almost_equal(res.info.obj_val, obj_sol, decimal=decimal_tol)


UPDATE_CASES = {
    'test_basic_QP': {},
    'test_update_q': dict(q=np.array([10.0, 20.0])),
    'test_update_l': dict(l=-50 * np.ones(5)),
    'test_update_u': dict(u=1000 * np.ones(5)),
    'test_update_bounds': dict(l=-100 * np.ones(5), u=1000 * np.ones(5)),
}


@pytest.mark.parametrize('golden', sorted(UPDATE_CASES))
def test_solve_and_vector_updates(golden, algebra, solver_type, atol, rtol, decimal_tol):
    model = make_model(algebra, solver_type)
    updates = UPDATE_CASES[golden]
    if updates:
        model.update(**updates)
    assert_golden(model.solve(), golden, atol, rtol, decimal_tol)


def test_update_max_iter(algebra, solver_type, atol, rtol, decimal_tol):
    model = make_model(algebra, solver_type)
    model.update_settings(max_iter=80)
    res = model.solve()
    assert res.info.status_val == model.constant('OSQP_MAX_ITER_REACHED')


def test_update_check_termination(algebra, solver_type, atol, rtol, decimal_tol):
    model = make_model(algebra, solver_type)
    model.update_settings(check_termination=0)
    res = model.solve()
    # no in-loop checks -> runs the full budget exactly
    assert res.info.iter == BASE_OPTS['max_iter']


def test_update_rho_determinism(algebra, solver_type, atol, rtol, decimal_tol):
    """update_settings(rho) must reproduce the fresh-setup trajectory exactly
    (reference basic_test.py:119-131)."""
    res_default = make_model(algebra, solver_type).solve()

    model = make_model(algebra, solver_type, rho=0.7)
    model.update_settings(rho=BASE_OPTS['rho'])
    res_updated = model.solve()

    assert res_default.info.iter == res_updated.info.iter


def test_upper_triangular_P(algebra, solver_type, atol, rtol, decimal_tol):
    from scipy import sparse

    res_full = make_model(algebra, solver_type).solve()

    P, q, A, l, u = problems.basic_qp()
    model = osqp.OSQP(algebra=algebra)
    model.setup(
        P=sparse.triu(P, format='csc'), q=q, A=A, l=l, u=u,
        solver_type=solver_type, **BASE_OPTS,
    )
    res_triu = model.solve()

    nptest.assert_allclose(res_full.x, res_triu.x, rtol=rtol, atol=atol)
    nptest.assert_allclose(res_full.y, res_triu.y, rtol=rtol, atol=atol)
    nptest.assert_almost_equal(
        res_full.info.obj_val, res_triu.info.obj_val, decimal=decimal_tol
    )


def test_unknown_setting_rejected(algebra, solver_type, atol, rtol, decimal_tol):
    model = make_model(algebra, solver_type)
    with pytest.raises(ValueError):
        model.update_settings(foo=42)


def test_solve_raise_error(algebra, solver_type, atol, rtol, decimal_tol):
    # float32 rows cannot reach BASE_OPTS' 1e-9 residuals; loosen the solve
    # eps (assert tolerances already come from the ladder)
    extra = {'eps_abs': 1e-5, 'eps_rel': 1e-5} if f32_device() and algebra == 'jax' else {}
    res = make_model(algebra, solver_type, **extra).solve(raise_error=True)
    assert res.info.status_val == model_status_solved()


def model_status_solved():
    return int(osqp.SolverStatus.OSQP_SOLVED)


def test_warm_start_reuses_iterates(algebra, solver_type, atol, rtol, decimal_tol):
    model = make_model(algebra, solver_type)
    first = model.solve()
    second = model.solve()  # warm-started from the optimum
    assert second.info.iter <= first.info.iter


def test_check_dualgap(algebra, solver_type, atol, rtol, decimal_tol):
    """SOLVED with the default check_dualgap=True implies a certified small
    duality gap (OSQP v1 C-core criterion); disabling the check may only
    terminate earlier, never later."""
    P, q, A, l, u = problems.basic_qp()
    eps = solve_eps(1e-6, 1e-4) if algebra == 'jax' else 1e-6
    opts = dict(verbose=False, eps_abs=eps, eps_rel=eps,
                solver_type=solver_type, check_termination=1)

    model = osqp.OSQP(algebra=algebra)
    model.setup(P=P, q=q, A=A, l=l, u=u, check_dualgap=True, **opts)
    res = model.solve()
    assert res.info.status_val == 1
    gap_tol = eps + eps * max(abs(res.info.obj_val), abs(res.info.dual_obj_val))
    assert abs(res.info.duality_gap) < gap_tol

    model2 = osqp.OSQP(algebra=algebra)
    model2.setup(P=P, q=q, A=A, l=l, u=u, check_dualgap=False, **opts)
    res2 = model2.solve()
    assert res2.info.status_val == 1
    assert res2.info.iter <= res.info.iter


def test_adaptive_rho_fraction_time_trigger():
    """adaptive_rho_fraction > 0 with interval == 0 enables the C-core
    profiling-build time trigger on the float64 oracle (bound in the
    reference at bindings.cpp.in:431): the first rho adaptation fires at the
    first termination check past fraction*setup_time.  With an effectively
    zero threshold rho must adapt; with an unreachably large one it must
    never adapt.  (The default fraction is 0 = deterministic fixed interval
    on every backend; see interface.DEFAULT_SETTINGS.)"""
    from osqp_tpu._oracle.solver import ReferenceSolver

    P, q, A, l, u = problems.basic_qp()
    # start rho far from the balanced value so the estimate triggers >5x
    opts = dict(verbose=False, eps_abs=1e-9, eps_rel=1e-9, rho=1e3,
                adaptive_rho=True, adaptive_rho_interval=0,
                check_termination=25, max_iter=20000)

    s = ReferenceSolver()
    s.setup(P, q, A, l, u, adaptive_rho_fraction=1e-12, **opts)
    sol, info = s.solve()
    assert info.status_val in (1, 2)
    assert info.rho_updates >= 1

    s2 = ReferenceSolver()
    s2.setup(P, q, A, l, u, adaptive_rho_fraction=1e12, **opts)
    sol2, info2 = s2.solve()
    assert info2.rho_updates == 0


def test_info_rel_kkt_and_primdual_int(algebra, solver_type, atol, rtol, decimal_tol):
    """rel_kkt_error and primdual_int are real, populated info fields:
    rel_kkt_error is small at a SOLVED solution (same order as eps) and
    primdual_int is a positive finite time integral."""
    P, q, A, l, u = problems.basic_qp()
    model = osqp.OSQP(algebra=algebra)
    model.setup(P=P, q=q, A=A, l=l, u=u, verbose=False,
                eps_abs=1e-6, eps_rel=1e-6, solver_type=solver_type)
    res = model.solve()
    assert res.info.status_val == 1
    assert 0 <= res.info.rel_kkt_error < 1e-4
    assert np.isfinite(res.info.primdual_int)
    assert res.info.primdual_int >= 0
