"""Primal/dual infeasibility detection and certificates (coverage model:
reference src/osqp/tests/{primal,dual}_infeasibility_test.py)."""

import os

import numpy as np
import pytest

import osqp_tpu as osqp

import problems

SOL = os.path.join(os.path.dirname(__file__), 'solutions')


def test_primal_infeasible_problem(algebra, solver_type, atol, rtol, decimal_tol):
    P, q, A, l, u = problems.primal_infeasible()
    model = osqp.OSQP(algebra=algebra)
    model.setup(
        P=P, q=q, A=A, l=l, u=u,
        verbose=False, eps_abs=1e-05, eps_rel=1e-05, eps_dual_inf=1e-20,
        max_iter=2500, polishing=False, solver_type=solver_type,
    )
    res = model.solve()
    assert res.info.status_val == model.constant('OSQP_PRIMAL_INFEASIBLE')

    cert = res.prim_inf_cert / np.linalg.norm(res.prim_inf_cert)
    ref = np.load(os.path.join(SOL, 'test_primal_infeasibility.npz'))[
        'normalized_prim_inf_cert_correct'
    ]
    assert np.allclose(cert, ref, atol=1e-4)


def test_dual_infeasible_lp(algebra, solver_type, atol, rtol, decimal_tol):
    P, q, A, l, u = problems.dual_infeasible_lp()
    model = osqp.OSQP(algebra=algebra)
    model.setup(
        P=P, q=q, A=A, l=l, u=u,
        verbose=False, eps_abs=1e-05, eps_rel=1e-05, eps_prim_inf=1e-15,
        eps_dual_inf=1e-6, scaling=3, max_iter=2500, polishing=False,
        check_termination=1, polish_refine_iter=4, solver_type=solver_type,
    )
    res = model.solve()
    assert res.info.status_val == model.constant('OSQP_DUAL_INFEASIBLE')
    cert = res.dual_inf_cert / np.linalg.norm(res.dual_inf_cert)
    ref = np.load(os.path.join(SOL, 'test_dual_infeasibility.npz'))[
        'lp_normalized_dual_inf_cert_correct'
    ]
    assert np.allclose(cert, ref, atol=1e-4)


def test_dual_infeasible_qp(algebra, solver_type, atol, rtol, decimal_tol):
    P, q, A, l, u = problems.dual_infeasible_qp()
    model = osqp.OSQP(algebra=algebra)
    model.setup(
        P=P, q=q, A=A, l=l, u=u,
        verbose=False, eps_abs=1e-05, eps_rel=1e-05, eps_prim_inf=1e-15,
        eps_dual_inf=1e-6, scaling=3, max_iter=2500, polishing=False,
        check_termination=1, polish_refine_iter=4, solver_type=solver_type,
    )
    res = model.solve()
    assert res.info.status_val == model.constant('OSQP_DUAL_INFEASIBLE')
    cert = res.dual_inf_cert / np.linalg.norm(res.dual_inf_cert)
    ref = np.load(os.path.join(SOL, 'test_dual_infeasibility.npz'))[
        'qp_normalized_dual_inf_cert_correct'
    ]
    assert np.allclose(cert, ref, atol=1e-4)


def test_primal_and_dual_infeasible_problem(algebra, solver_type, atol, rtol, decimal_tol):
    P, q, A, l, u = problems.primal_dual_infeasible()
    model = osqp.OSQP(algebra=algebra)
    model.setup(
        P=P, q=q, A=A, l=l, u=u,
        verbose=False, eps_abs=1e-05, eps_rel=1e-05, eps_dual_inf=1e-20,
        max_iter=2500, polishing=False, solver_type=solver_type,
    )
    res = model.solve()
    assert res.info.status_val in (
        model.constant('OSQP_PRIMAL_INFEASIBLE'),
        model.constant('OSQP_DUAL_INFEASIBLE'),
    )


def test_primal_and_dual_infeasible_warm_started(algebra, solver_type, atol, rtol, decimal_tol):
    P, q, A, l, u = problems.primal_dual_infeasible()
    model = osqp.OSQP(algebra=algebra)
    model.setup(
        P=P, q=q, A=A, l=l, u=u,
        verbose=False, eps_abs=1e-05, eps_rel=1e-05,
        eps_prim_inf=1e-15, eps_dual_inf=1e-6, scaling=3,
        max_iter=2500, polishing=False, check_termination=1,
        solver_type=solver_type,
    )
    model.warm_start(x=25.0 * np.ones(2), y=-2.0 * np.ones(4))
    res = model.solve()
    assert res.info.status_val in (
        model.constant('OSQP_PRIMAL_INFEASIBLE'),
        model.constant('OSQP_DUAL_INFEASIBLE'),
    )
