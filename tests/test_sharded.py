"""Multi-chip sharding tests on a virtual 8-device CPU mesh.

The reference has no distributed runtime to mirror (SURVEY.md section 4:
"Distributed/multi-node testing: none exists"); these tests pin down the new
TPU-native scale-out layer (osqp_tpu/parallel/sharded.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from osqp_tpu.parallel.sharded import dp_mp_solve
from osqp_tpu._oracle.solver import ReferenceSolver

import scipy.sparse as sparse


def _mesh(shape, names):
    devs = jax.devices('cpu')
    need = int(np.prod(shape))
    if len(devs) < need:
        pytest.skip(f'need {need} cpu devices, have {len(devs)}')
    return Mesh(np.array(devs[:need]).reshape(shape), names)


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


@pytest.mark.parametrize('mesh_shape', [(4, 2), (2, 4), (8, 1), (1, 8)])
def test_dp_mp_solve_matches_reference(mesh_shape):
    mesh = _mesh(mesh_shape, ('dp', 'mp'))
    B = 2 * mesh_shape[0]
    n = 10
    m = 8 * mesh_shape[1] if mesh_shape[1] > 1 else 16
    P, q, A, l, u = _random_batch(B, n, m, seed=7)

    res = dp_mp_solve(
        mesh, P, q, A, l, u, eps_abs=1e-7, eps_rel=1e-7, max_iter=20000, check_every=25
    )
    assert bool(res.converged.all()), f'not converged: {np.asarray(res.pri_res)}'

    # row-consensus solution matches an unscaled single-process reference solve
    for b in range(B):
        ref = ReferenceSolver()
        ref.setup(
            sparse.csc_matrix(P[b]), q[b], sparse.csc_matrix(A[b]), l[b], u[b],
            verbose=False, eps_abs=1e-7, eps_rel=1e-7, scaling=0, rho_is_vec=False,
            adaptive_rho=False, max_iter=20000,
        )
        sol, info = ref.solve()
        np.testing.assert_allclose(np.asarray(res.x)[b], sol.x, rtol=1e-3, atol=1e-4)


def test_dp_sharded_batch_qp_solve():
    """dp-shard the fused batched solver with NamedShardings (pure pjit
    path, no shard_map): XLA partitions the vmapped ADMM across devices."""
    from jax.sharding import NamedSharding, PartitionSpec as P_

    mesh = _mesh((8,), ('dp',))
    B, n, m = 16, 8, 12
    P, q, A, l, u = _random_batch(B, n, m, seed=9)

    from osqp_tpu.batch import batch_qp_solve, default_core_settings

    dt = jnp.float64
    s3 = NamedSharding(mesh, P_('dp', None, None))
    s2 = NamedSharding(mesh, P_('dp', None))
    s1 = NamedSharding(mesh, P_('dp'))
    Pj = jax.device_put(jnp.asarray(P, dt), s3)
    qj = jax.device_put(jnp.asarray(q, dt), s2)
    Aj = jax.device_put(jnp.asarray(A, dt), s3)
    lj = jax.device_put(jnp.asarray(l, dt), s2)
    uj = jax.device_put(jnp.asarray(u, dt), s2)
    rho = jax.device_put(jnp.full((B,), 0.1, dt), s1)

    stg = default_core_settings(dt, eps_abs=1e-8, eps_rel=1e-8)
    res = batch_qp_solve(Pj, qj, Aj, lj, uj, stg, rho)
    assert bool((res.status == 1).all())

    # agreement with the unsharded solve
    res0 = batch_qp_solve(
        jnp.asarray(P, dt), jnp.asarray(q, dt), jnp.asarray(A, dt),
        jnp.asarray(l, dt), jnp.asarray(u, dt), stg, jnp.full((B,), 0.1, dt),
    )
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(res0.x), rtol=1e-9, atol=1e-10)
    assert np.array_equal(np.asarray(res.iters), np.asarray(res0.iters))


def _random_sparse_qp(n, m, density, seed=0):
    rng = np.random.default_rng(seed)
    Pt = sparse.random(n, n, density=density, random_state=rng)
    P = (Pt.T @ Pt + 0.1 * sparse.eye(n)).tocsc()
    q = rng.standard_normal(n)
    A = sparse.random(m, n, density=density, random_state=rng)
    A = (A + 0.01 * sparse.random(m, n, density=5.0 / n, random_state=rng)).tocsc()
    x0 = rng.standard_normal(n)
    s0 = rng.random(m) + 0.1
    u = A @ x0 + s0
    l = u - 2 * s0
    return P, q, A, l, u


@pytest.mark.parametrize('J', [8, 4])
def test_big_qp_solve_matches_reference(J):
    """Sharded huge-QP mode (distributed PCG, rows of P/A over the mesh)
    reproduces the reference solution on a virtual CPU mesh."""
    from osqp_tpu.parallel.bigqp import big_qp_setup, big_qp_solve

    mesh = _mesh((J,), ('mp',))
    n, m = 160, 240
    P, q, A, l, u = _random_sparse_qp(n, m, 0.05, seed=11)
    # a few equality + loose rows to exercise rho typing
    l, u = l.copy(), u.copy()
    l[:5] = u[:5]
    l[5:8] = -1e30
    data = big_qp_setup(P, q, A, l, u, J, dtype=jnp.float64)
    res = big_qp_solve(
        mesh, data, eps_abs=1e-6, eps_rel=1e-6, max_iter=20000, cg_tol=1e-12,
    )
    assert int(res.status) == 1, int(res.status)

    ref = ReferenceSolver()
    ref.setup(P, q, A, l, u, verbose=False, eps_abs=1e-9, eps_rel=1e-9,
              max_iter=100000)
    sol, _ = ref.solve()
    np.testing.assert_allclose(np.asarray(res.x), sol.x, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.y), sol.y, rtol=1e-3, atol=1e-3)


def test_big_qp_primal_infeasible_certificate():
    """An infeasible huge QP must return PRIMAL_INFEASIBLE with a valid
    unscaled Farkas certificate (v2 parity with the single-device paths;
    reference semantics bindings.cpp.in:466-470)."""
    from osqp_tpu.parallel.bigqp import big_qp_setup, big_qp_solve
    from osqp_tpu.constants import SolverStatus

    mesh = _mesh((8,), ('mp',))
    n, m = 96, 128
    P, q, A, l, u = _random_sparse_qp(n, m, 0.08, seed=13)
    # contradictory rows: a x <= -1 and a x >= 1 for the same dense row a
    rng = np.random.default_rng(3)
    arow = rng.standard_normal(n)
    A = sparse.vstack([A, sparse.csr_matrix(arow), sparse.csr_matrix(-arow)]).tocsc()
    l = np.concatenate([l, [-1e30, -1e30]])
    u = np.concatenate([u, [-1.0, -1.0]])

    data = big_qp_setup(P, q, A, l, u, 8, dtype=jnp.float64)
    res = big_qp_solve(mesh, data, eps_abs=1e-6, eps_rel=1e-6, max_iter=20000)
    assert int(res.status) in (
        int(SolverStatus.OSQP_PRIMAL_INFEASIBLE),
        int(SolverStatus.OSQP_PRIMAL_INFEASIBLE_INACCURATE),
    ), int(res.status)
    assert np.isnan(np.asarray(res.x)).all()

    # Farkas: u'(dy)_+ + l'(dy)_- < 0 and A' dy ~ 0 on the ORIGINAL data
    dy = np.asarray(res.prim_inf_cert)[: A.shape[0]]
    norm_dy = np.abs(dy).max()
    assert norm_dy > 0
    lhs = np.minimum(u, 1e30) @ np.maximum(dy, 0) + np.maximum(l, -1e30) @ np.minimum(dy, 0)
    assert lhs < 0
    assert np.abs(A.T @ dy).max() < 1e-3 * norm_dy


def test_big_qp_polish():
    """Distributed polish (reduced-KKT via the same Schur PCG) must improve
    residuals and keep the solution at the reference optimum."""
    from osqp_tpu.parallel.bigqp import big_qp_setup, big_qp_solve

    mesh = _mesh((8,), ('mp',))
    n, m = 120, 160
    P, q, A, l, u = _random_sparse_qp(n, m, 0.06, seed=14)
    data = big_qp_setup(P, q, A, l, u, 8, dtype=jnp.float64)
    res = big_qp_solve(mesh, data, eps_abs=1e-4, eps_rel=1e-4, max_iter=20000,
                       polish=True, cg_tol=1e-12)
    assert int(res.status) == 1
    assert int(res.status_polish) == 1, int(res.status_polish)

    ref = ReferenceSolver()
    ref.setup(P, q, A, l, u, verbose=False, eps_abs=1e-10, eps_rel=1e-10,
              max_iter=200000, polishing=True)
    sol, _ = ref.solve()
    # polished solution is high-accuracy despite the loose ADMM eps
    np.testing.assert_allclose(np.asarray(res.x), sol.x, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.y), sol.y, rtol=1e-4, atol=1e-5)


def test_big_qp_warm_start():
    from osqp_tpu.parallel.bigqp import big_qp_setup, big_qp_solve

    mesh = _mesh((8,), ('mp',))
    n, m = 120, 160
    P, q, A, l, u = _random_sparse_qp(n, m, 0.06, seed=12)
    data = big_qp_setup(P, q, A, l, u, 8, dtype=jnp.float64)
    res = big_qp_solve(mesh, data, eps_abs=1e-6, eps_rel=1e-6, max_iter=20000)
    assert int(res.status) == 1
    cold_iters = int(res.iters)

    # warm restart from the solution: terminates at the first check
    x_scaled = jnp.asarray(res.x) / data.D
    res2 = big_qp_solve(
        mesh, data, eps_abs=1e-6, eps_rel=1e-6, max_iter=20000,
        x0=x_scaled, z0=res.z, y0=jnp.asarray(res.y) * data.c / np.maximum(
            np.asarray(data.E.reshape(-1)[:m]), 1e-30),
    )
    assert int(res2.status) == 1
    assert int(res2.iters) <= 25 < cold_iters
