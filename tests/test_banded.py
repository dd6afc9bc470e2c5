"""Halo-exchange banded huge-QP mode (osqp_tpu/parallel/banded.py) on a
virtual 8-device CPU mesh.

Everything is sharded (x included); per-matvec communication is W-wide
neighbor ppermutes only.  These tests pin: solution parity with the float64
oracle, m != n padding, warm start, distributed polish, and the primal
infeasibility certificate — same contracts as the bigqp tests
(the reference has no distributed runtime to mirror; SURVEY.md section 4).
"""

import numpy as np
import pytest
import scipy.sparse as sparse

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from osqp_tpu._oracle.solver import ReferenceSolver
from osqp_tpu.constants import SolverStatus
from osqp_tpu.parallel.banded import banded_qp_setup, banded_qp_solve


@pytest.fixture(autouse=True)
def _cpu_default_device():
    """Pin eager ops to CPU: these tests target the virtual CPU mesh, but
    in the TPU ladder process (OSQP_TPU_TEST_DEVICE=tpu) the default device
    is the axon tunnel, where every eager setup op pays a ~50 ms roundtrip
    (the round-5 ladder crawled at 2 tests/hour before this pin)."""
    with jax.default_device(jax.devices('cpu')[0]):
        yield


def _mesh(J):
    devs = jax.devices('cpu')
    if len(devs) < J:
        pytest.skip(f'need {J} cpu devices, have {len(devs)}')
    return Mesh(np.array(devs[:J]).reshape(J), ('mp',))


def _banded_qp(n, seed=0, m_eq_n=True):
    """Tridiagonal P; banded A (I + two off-diagonals).  If not m_eq_n,
    A is the (n-1) x n first-difference matrix plus a diagonal band."""
    rng = np.random.default_rng(seed)
    P = sparse.diags(
        [np.full(n, 2.0), np.full(n - 1, -0.7), np.full(n - 1, -0.7)], [0, 1, -1]
    ).tocsc()
    q = rng.standard_normal(n)
    if m_eq_n:
        A = (sparse.eye(n)
             + sparse.diags([np.full(n - 2, 0.4)], [2], shape=(n, n))
             + sparse.diags([np.full(n - 1, -0.3)], [-1], shape=(n, n))).tocsc()
        m = n
    else:
        m = n - 1
        A = (sparse.diags([np.full(m, -1.0)], [0], shape=(m, n))
             + sparse.diags([np.full(m, 1.0)], [1], shape=(m, n))).tocsc()
    x0 = rng.standard_normal(n)
    s0 = rng.random(m) + 0.1
    u = A @ x0 + s0
    l = u - 2 * s0
    # a few equalities and loose rows to exercise rho typing
    l[:3] = u[:3]
    l[3:5] = -1e30
    return P, q, A.tocsc(), l, u


def _oracle(P, q, A, l, u, **kw):
    ref = ReferenceSolver()
    ref.setup(P, q, A, l, u, verbose=False, **kw)
    sol, _ = ref.solve()
    return sol


@pytest.mark.parametrize('m_eq_n', [True, False])
def test_banded_solve_matches_oracle(m_eq_n):
    J = 8
    mesh = _mesh(J)
    n = 192
    P, q, A, l, u = _banded_qp(n, seed=3, m_eq_n=m_eq_n)
    data = banded_qp_setup(P, q, A, l, u, J, dtype=jnp.float64)
    res = banded_qp_solve(mesh, data, eps_abs=1e-6, eps_rel=1e-6,
                          max_iter=20000, cg_tol=1e-12)
    assert int(res.status) == 1, int(res.status)
    sol = _oracle(P, q, A, l, u, eps_abs=1e-9, eps_rel=1e-9, max_iter=100000)
    np.testing.assert_allclose(np.asarray(res.x), sol.x, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.y), sol.y, rtol=1e-3, atol=1e-3)


def test_banded_matches_bigqp_iterations():
    """Same math as bigqp: identical iteration counts on the same problem —
    the halo exchange only changes where values live."""
    from osqp_tpu.parallel.bigqp import big_qp_setup, big_qp_solve

    J = 8
    mesh = _mesh(J)
    n = 128
    P, q, A, l, u = _banded_qp(n, seed=5)
    kw = dict(eps_abs=1e-6, eps_rel=1e-6, max_iter=20000, cg_tol=1e-12)
    res_b = banded_qp_solve(
        mesh, banded_qp_setup(P, q, A, l, u, J, dtype=jnp.float64), **kw
    )
    res_g = big_qp_solve(
        mesh, big_qp_setup(P, q, A, l, u, J, dtype=jnp.float64), **kw
    )
    assert int(res_b.status) == int(res_g.status) == 1
    assert int(res_b.iters) == int(res_g.iters)
    np.testing.assert_allclose(np.asarray(res_b.x), np.asarray(res_g.x),
                               rtol=1e-8, atol=1e-8)


def test_banded_warm_start():
    J = 8
    mesh = _mesh(J)
    n = 128
    P, q, A, l, u = _banded_qp(n, seed=7)
    data = banded_qp_setup(P, q, A, l, u, J, dtype=jnp.float64)
    res = banded_qp_solve(mesh, data, eps_abs=1e-6, eps_rel=1e-6, max_iter=20000)
    assert int(res.status) == 1
    cold_iters = int(res.iters)

    x_scaled = np.asarray(res.x) / np.asarray(data.D.reshape(-1)[:n])
    y_scaled = (np.asarray(res.y) * float(data.c)
                / np.maximum(np.asarray(data.E.reshape(-1)[:A.shape[0]]), 1e-30))
    res2 = banded_qp_solve(mesh, data, eps_abs=1e-6, eps_rel=1e-6,
                           max_iter=20000, x0=x_scaled,
                           z0=np.asarray(res.z), y0=y_scaled)
    assert int(res2.status) == 1
    assert int(res2.iters) <= 25 < cold_iters


def test_banded_polish():
    J = 8
    mesh = _mesh(J)
    n = 160
    P, q, A, l, u = _banded_qp(n, seed=9)
    data = banded_qp_setup(P, q, A, l, u, J, dtype=jnp.float64)
    res = banded_qp_solve(mesh, data, eps_abs=1e-3, eps_rel=1e-3,
                          check_every=5, max_iter=20000, polish=True,
                          cg_tol=1e-12)
    assert int(res.status) == 1
    assert int(res.status_polish) == 1, int(res.status_polish)
    sol = _oracle(P, q, A, l, u, eps_abs=1e-10, eps_rel=1e-10,
                  max_iter=200000, polishing=True)
    np.testing.assert_allclose(np.asarray(res.x), sol.x, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.y), sol.y, rtol=1e-4, atol=1e-5)


def test_banded_primal_infeasible_certificate():
    """A banded QP with an unsatisfiable equality (zero row, l=u=5) must be
    detected with a valid unscaled Farkas certificate."""
    J = 8
    mesh = _mesh(J)
    n = 96
    P, q, A, l, u = _banded_qp(n, seed=11)
    A = A.tolil()
    A[n // 2, :] = 0.0
    A = A.tocsc()
    l[n // 2] = 5.0
    u[n // 2] = 5.0
    data = banded_qp_setup(P, q, A, l, u, J, dtype=jnp.float64)
    res = banded_qp_solve(mesh, data, eps_abs=1e-6, eps_rel=1e-6, max_iter=20000)
    assert int(res.status) in (
        int(SolverStatus.OSQP_PRIMAL_INFEASIBLE),
        int(SolverStatus.OSQP_PRIMAL_INFEASIBLE_INACCURATE),
    ), int(res.status)
    assert np.isnan(np.asarray(res.x)).all()
    dy = np.asarray(res.prim_inf_cert)
    norm_dy = np.abs(dy).max()
    assert norm_dy > 0
    lhs = (np.minimum(u, 1e30) @ np.maximum(dy, 0)
           + np.maximum(l, -1e30) @ np.minimum(dy, 0))
    assert lhs < 0
    assert np.abs(A.T @ dy).max() < 1e-3 * norm_dy


def test_banded_bandwidth_guard():
    """Bandwidth wider than the shard height must be rejected loudly."""
    n = 64
    P = sparse.eye(n, format='csc')
    q = np.zeros(n)
    A = (sparse.eye(n) + sparse.diags([np.ones(n - 40)], [40], shape=(n, n))).tocsc()
    l, u = -np.ones(n), np.ones(n)
    with pytest.raises(ValueError, match='bandwidth'):
        banded_qp_setup(P, q, A, l, u, 8)


def test_banded_update_vec_and_mpc_rollout():
    """update_vec(q) + warm solve chain must match the lax.scan rollout
    step-for-step (iterations AND solutions) — the distributed analogue of
    the single-chip warm update(q)+solve MPC loop (ref update semantics
    osqppurepy/_osqp.py:1312-1429)."""
    from osqp_tpu.parallel.banded import banded_mpc_rollout, banded_qp_update_vec

    J = 8
    mesh = _mesh(J)
    n = 128
    P, q, A, l, u = _banded_qp(n, seed=13)
    data = banded_qp_setup(P, q, A, l, u, J, dtype=jnp.float64)
    kw = dict(eps_abs=1e-6, eps_rel=1e-6, max_iter=20000, cg_tol=1e-12)
    T = 3
    rng = np.random.default_rng(1)
    q_seq = q[None] + 0.05 * rng.standard_normal((T, n))

    roll = banded_mpc_rollout(mesh, data, q_seq, **kw)
    assert (np.asarray(roll.status) == 1).all(), np.asarray(roll.status)
    # warm steps after the first converge faster than a cold solve
    assert int(roll.iters[-1]) <= int(roll.iters[0])

    x0 = z0 = y0 = None
    d = data
    m = A.shape[0]
    for t in range(T):
        d = banded_qp_update_vec(d, q=q_seq[t])
        res = banded_qp_solve(mesh, d, x0=x0, z0=z0, y0=y0, **kw)
        assert int(res.status) == 1
        assert int(res.iters) == int(roll.iters[t]), (t, int(res.iters), int(roll.iters[t]))
        np.testing.assert_allclose(np.asarray(res.x), np.asarray(roll.x[t]),
                                   rtol=1e-9, atol=1e-10)
        x0 = np.asarray(res.x) / np.asarray(d.D.reshape(-1)[:n])
        z0 = np.asarray(res.z)
        y0 = (np.asarray(res.y) * float(d.c)
              / np.maximum(np.asarray(d.E.reshape(-1)[:m]), 1e-30))

    # chaining: a second rollout from the carried iterates re-solves the
    # last cost in <= one check interval
    roll2 = banded_mpc_rollout(mesh, data, q_seq[-1:], x0=roll.x_carry,
                               z0=roll.z_carry, y0=roll.y_carry, **kw)
    assert int(roll2.status[0]) == 1
    assert int(roll2.iters[0]) <= 25


def test_banded_update_bounds_retypes_and_matches_bigqp():
    """Bound updates re-type constraints (eq/ineq/loose), rebuild the typed
    rho vector and the CG preconditioner diagonal; banded and bigqp update
    paths must stay at exact iteration parity, and the solution must match
    the oracle on the updated problem."""
    from osqp_tpu.parallel.banded import banded_qp_update_vec
    from osqp_tpu.parallel.bigqp import (
        big_qp_setup, big_qp_solve, big_qp_update_vec,
    )

    J = 8
    mesh = _mesh(J)
    n = 128
    P, q, A, l, u = _banded_qp(n, seed=17)
    kw = dict(eps_abs=1e-6, eps_rel=1e-6, max_iter=20000, cg_tol=1e-12)
    data_b = banded_qp_setup(P, q, A, l, u, J, dtype=jnp.float64)
    data_g = big_qp_setup(P, q, A, l, u, J, dtype=jnp.float64)

    # new bounds: flip rows 0-2 from equality to inequality, make rows 6-9
    # equalities, loosen row 10, shift the rest
    l2, u2 = l.copy() - 0.05, u.copy() + 0.05
    u2[:3] = l2[:3] + 1.0
    l2[6:10] = u2[6:10] = 0.5 * (l2[6:10] + u2[6:10])
    l2[10], u2[10] = -1e30, 1e30
    q2 = q + 0.1

    data_b2 = banded_qp_update_vec(data_b, q=q2, l=l2, u=u2)
    data_g2 = big_qp_update_vec(data_g, q=q2, l=l2, u=u2)

    # preconditioner diagonal exactness (banded): diag_M = diag(P_s) +
    # sigma + diag(A_s' rho A_s) with the cached scalers and the NEW rho
    D = np.asarray(data_b2.D, np.float64).reshape(-1)[:n]
    E = np.asarray(data_b2.E, np.float64).reshape(-1)[:n]
    c = float(data_b2.c)
    A_s = sparse.diags(E) @ A @ sparse.diags(D)
    rho_new = np.asarray(data_b2.rho_vec, np.float64).reshape(-1)[:n]
    exp = (c * D * D * np.asarray(P.diagonal()) + data_b2.sigma
           + np.asarray((A_s.multiply(A_s)).T @ rho_new).ravel())
    np.testing.assert_allclose(
        np.asarray(data_b2.diag_M, np.float64).reshape(-1)[:n], exp,
        rtol=1e-10, atol=1e-12,
    )

    res_b = banded_qp_solve(mesh, data_b2, **kw)
    res_g = big_qp_solve(mesh, data_g2, **kw)
    assert int(res_b.status) == int(res_g.status) == 1
    assert int(res_b.iters) == int(res_g.iters)
    sol = _oracle(P, q2, A, l2, u2, eps_abs=1e-9, eps_rel=1e-9, max_iter=100000)
    np.testing.assert_allclose(np.asarray(res_b.x), sol.x, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res_g.x), sol.x, rtol=1e-4, atol=1e-4)

    with pytest.raises(ValueError, match='l must be'):
        banded_qp_update_vec(data_b, l=u + 1.0, u=u)
