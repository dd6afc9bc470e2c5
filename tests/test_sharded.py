"""Multi-chip sharding tests on a virtual 8-device CPU mesh.

The reference has no distributed runtime to mirror (SURVEY.md section 4:
"Distributed/multi-node testing: none exists"); these tests pin down the new
TPU-native scale-out layer (osqp_tpu/parallel/sharded.py) at **full algorithm
parity**: the dp x mp row-consensus solver runs the oracle's exact algorithm
(Ruiz scaling, vector/adaptive rho, duality-gap termination, certificates,
polish) and must match the float64 oracle's iteration counts at DEFAULT
settings.

Sizes are trimmed for 2-core CI hosts (the heavy mesh matrix is opt-in via
OSQP_TPU_SLOW_TESTS=1).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from osqp_tpu.parallel.sharded import dp_mp_solve
from osqp_tpu._oracle.solver import ReferenceSolver
from osqp_tpu.constants import SolverStatus

import scipy.sparse as sparse

_SLOW = os.environ.get('OSQP_TPU_SLOW_TESTS') == '1'


@pytest.fixture(autouse=True)
def _cpu_default_device():
    """Pin eager ops to CPU: these tests target the virtual CPU mesh, but
    in the TPU ladder process (OSQP_TPU_TEST_DEVICE=tpu) the default device
    is the axon tunnel, where every eager setup op pays a ~50 ms roundtrip
    (the round-5 ladder crawled at 2 tests/hour before this pin)."""
    with jax.default_device(jax.devices('cpu')[0]):
        yield


def _mesh(shape, names):
    devs = jax.devices('cpu')
    need = int(np.prod(shape))
    if len(devs) < need:
        pytest.skip(f'need {need} cpu devices, have {len(devs)}')
    return Mesh(np.array(devs[:need]).reshape(shape), names)


def _random_batch(B, n, m, seed=0, bad_scaling=False):
    rng = np.random.default_rng(seed)
    L = rng.standard_normal((B, n, n))
    P = 0.1 * np.einsum('bij,bkj->bik', L, L) + 0.1 * np.eye(n)
    q = rng.standard_normal((B, n))
    A = rng.standard_normal((B, m, n))
    if bad_scaling:
        # row/column imbalance so Ruiz scaling + adaptive rho do real work
        A *= np.logspace(-1, 1, m)[None, :, None]
        q *= 10.0
    x0 = rng.standard_normal((B, n))
    s0 = rng.random((B, m))
    u = np.einsum('bmn,bn->bm', A, x0) + s0
    l = u - 2 * s0
    return P, q, A, l, u


def _oracle_solve(P, q, A, l, u, **settings):
    ref = ReferenceSolver()
    ref.setup(sparse.csc_matrix(P), q, sparse.csc_matrix(A), l, u,
              verbose=False, **settings)
    return ref.solve()


_MESH_SHAPES = [(2, 4), (4, 2)] + ([(8, 1), (1, 8)] if _SLOW else [])


@pytest.mark.parametrize('mesh_shape', _MESH_SHAPES)
def test_dp_mp_iteration_parity_default_settings(mesh_shape):
    """The flagship parity contract: at DEFAULT settings (scaling=10,
    rho_is_vec=True, adaptive rho ON, duality-gap check ON) the row-consensus
    solver must reproduce the float64 oracle's solution AND its exact
    iteration count / rho-update count per instance."""
    mesh = _mesh(mesh_shape, ('dp', 'mp'))
    B, n, m = 4, 8, 16
    # seed chosen so all instances SOLVE within budget while >=1 instance
    # triggers adaptive-rho refactorizations (oracle: iters 175-425,
    # rho_updates up to 2)
    P, q, A, l, u = _random_batch(B, n, m, seed=11, bad_scaling=True)

    eps = dict(eps_abs=1e-5, eps_rel=1e-5)
    res = dp_mp_solve(mesh, jnp.asarray(P, jnp.float64), q, A, l, u,
                      max_iter=1000, **eps)
    status = np.asarray(res.status)
    iters = np.asarray(res.iters)
    rho_updates = np.asarray(res.rho_updates)
    assert (status == int(SolverStatus.OSQP_SOLVED)).all(), status

    for b in range(B):
        sol, info = _oracle_solve(P[b], q[b], A[b], l[b], u[b],
                                  max_iter=1000, **eps)
        assert info.status_val == status[b], (b, info.status_val, status[b])
        assert iters[b] == info.iter, (b, iters[b], info.iter)
        assert rho_updates[b] == info.rho_updates, (
            b, rho_updates[b], info.rho_updates
        )
        np.testing.assert_allclose(np.asarray(res.x)[b], sol.x, rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(res.y)[b], sol.y, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            float(np.asarray(res.obj_val)[b]), info.obj_val, rtol=1e-8, atol=1e-9
        )


def test_dp_mp_primal_infeasible_certificate():
    """A primal-infeasible instance inside the dp batch must terminate with
    PRIMAL_INFEASIBLE, NaN solution rows, and a valid unscaled Farkas
    certificate (ref semantics bindings.cpp.in:466-470)."""
    mesh = _mesh((2, 4), ('dp', 'mp'))
    B, n, m = 2, 8, 16
    P, q, A, l, u = _random_batch(B, n, m, seed=9)
    # make instance 0 infeasible: contradictory final row pair
    A[0, -2] = A[0, -1] * -1.0
    l[0, -2:] = [-1e30, -1e30]
    u[0, -2:] = [-1.0, -1.0]
    A[0, -2] = -A[0, -1]

    res = dp_mp_solve(mesh, jnp.asarray(P, jnp.float64), q, A, l, u,
                      eps_abs=1e-5, eps_rel=1e-5, max_iter=4000)
    status = np.asarray(res.status)
    assert status[0] in (
        int(SolverStatus.OSQP_PRIMAL_INFEASIBLE),
        int(SolverStatus.OSQP_PRIMAL_INFEASIBLE_INACCURATE),
    ), status
    assert status[1] == int(SolverStatus.OSQP_SOLVED)
    assert np.isnan(np.asarray(res.x)[0]).all()
    assert np.isfinite(np.asarray(res.x)[1]).all()

    # Farkas certificate on the ORIGINAL data: u'(dy)_+ + l'(dy)_- < 0,
    # A' dy ~ 0
    dy = np.asarray(res.prim_inf_cert)[0]
    norm_dy = np.abs(dy).max()
    assert norm_dy > 0
    lhs = np.minimum(u[0], 1e30) @ np.maximum(dy, 0) + np.maximum(l[0], -1e30) @ np.minimum(dy, 0)
    assert lhs < 0
    assert np.abs(A[0].T @ dy).max() < 1e-3 * norm_dy

    # oracle agrees on the statuses
    for b in range(B):
        _, info = _oracle_solve(P[b], q[b], A[b], l[b], u[b],
                                eps_abs=1e-5, eps_rel=1e-5, max_iter=4000)
        assert info.status_val == status[b], (b, info.status_val, status[b])


def test_dp_mp_dual_infeasible_certificate():
    """An unbounded (dual-infeasible) LP instance must yield DUAL_INFEASIBLE
    with a ray certificate."""
    mesh = _mesh((2, 4), ('dp', 'mp'))
    B, n, m = 2, 8, 16  # same shapes as the other (2,4)-mesh tests: reuses
    # the cached compiled program instead of adding a compile
    P, q, A, l, u = _random_batch(B, n, m, seed=12)
    # instance 0: unbounded LP  min q'x  s.t. Ax >= l only (u = +inf)
    P[0] = 0.0
    u[0] = 1e30
    A[0] = np.abs(A[0])  # A x >= l with x -> -inf ray feasible
    q[0] = np.abs(q[0]) + 0.1

    res = dp_mp_solve(mesh, jnp.asarray(P, jnp.float64), q, A, l, u,
                      eps_abs=1e-5, eps_rel=1e-5, max_iter=4000)
    status = np.asarray(res.status)
    assert status[0] in (
        int(SolverStatus.OSQP_DUAL_INFEASIBLE),
        int(SolverStatus.OSQP_DUAL_INFEASIBLE_INACCURATE),
    ), status
    dx = np.asarray(res.dual_inf_cert)[0]
    norm_dx = np.abs(dx).max()
    assert norm_dx > 0
    # ray certificate on the ORIGINAL data: q'dx < 0, P dx ~ 0, A dx
    # admissible for the one-sided rows
    assert q[0] @ dx < 0
    assert np.abs(P[0] @ dx).max() < 1e-3 * norm_dx


def test_dp_mp_warm_start():
    mesh = _mesh((2, 4), ('dp', 'mp'))
    B, n, m = 2, 8, 16
    P, q, A, l, u = _random_batch(B, n, m, seed=3)
    # same (shape, settings) as the infeasibility-certificate tests so all
    # three share ONE compiled program (cold and warm calls share it too:
    # x0/y0 are always materialized arrays) — this test alone cost 208 s
    # when its eps pinned a private compile
    eps = dict(eps_abs=1e-5, eps_rel=1e-5)
    res = dp_mp_solve(mesh, jnp.asarray(P, jnp.float64), q, A, l, u,
                      max_iter=4000, **eps)
    assert (np.asarray(res.status) == 1).all()
    cold = np.asarray(res.iters)

    res2 = dp_mp_solve(mesh, jnp.asarray(P, jnp.float64), q, A, l, u,
                       max_iter=4000, x0=res.x, y0=res.y, **eps)
    assert (np.asarray(res2.status) == 1).all()
    warm = np.asarray(res2.iters)
    # warm start at the optimum terminates at the first check
    # (ref warm_start_test.py:49-57 contract)
    assert (warm <= 25).all(), warm
    assert (warm < cold).all(), (warm, cold)


def test_dp_mp_polish():
    """Distributed active-set polish (masked reduced KKT, psum'd Schur
    assembly) reaches high accuracy from a loose ADMM solve."""
    mesh = _mesh((2, 4), ('dp', 'mp'))
    B, n, m = 2, 8, 16
    P, q, A, l, u = _random_batch(B, n, m, seed=5)
    res = dp_mp_solve(mesh, jnp.asarray(P, jnp.float64), q, A, l, u,
                      eps_abs=1e-4, eps_rel=1e-4, max_iter=4000, polish=True)
    assert (np.asarray(res.status) == 1).all()
    assert (np.asarray(res.status_polish) == 1).all(), np.asarray(res.status_polish)

    for b in range(B):
        sol, info = _oracle_solve(P[b], q[b], A[b], l[b], u[b],
                                  eps_abs=1e-10, eps_rel=1e-10,
                                  max_iter=200000, polishing=True)
        np.testing.assert_allclose(np.asarray(res.x)[b], sol.x, rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(np.asarray(res.y)[b], sol.y, rtol=1e-6, atol=1e-8)


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


@pytest.mark.parametrize('J', [8] + ([4] if _SLOW else []))
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


def test_big_qp_mpc_rollout():
    """lax.scan warm rollout on the row-sharded mode: step 0 matches a
    fresh solve exactly; later warm steps converge in fewer iterations."""
    from osqp_tpu.parallel.bigqp import (
        big_qp_mpc_rollout, big_qp_setup, big_qp_solve,
    )

    mesh = _mesh((8,), ('mp',))
    n, m = 96, 128
    P, q, A, l, u = _random_sparse_qp(n, m, 0.08, seed=21)
    data = big_qp_setup(P, q, A, l, u, 8, dtype=jnp.float64)
    kw = dict(eps_abs=1e-6, eps_rel=1e-6, max_iter=20000, cg_tol=1e-12)

    rng = np.random.default_rng(2)
    q_seq = q[None] + 0.05 * rng.standard_normal((3, n))
    roll = big_qp_mpc_rollout(mesh, data, q_seq, **kw)
    assert (np.asarray(roll.status) == 1).all(), np.asarray(roll.status)

    from osqp_tpu.parallel.bigqp import big_qp_update_vec

    res0 = big_qp_solve(mesh, big_qp_update_vec(data, q=q_seq[0]), **kw)
    assert int(res0.iters) == int(roll.iters[0])
    np.testing.assert_allclose(np.asarray(res0.x), np.asarray(roll.x[0]),
                               rtol=1e-9, atol=1e-10)
    assert int(roll.iters[-1]) <= int(roll.iters[0])
