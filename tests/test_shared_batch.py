"""Shared-structure batched solver (osqp_tpu.batch_shared): correctness vs
the per-instance reference core on the condensed-MPC scenario family."""

import numpy as np
import pytest
import scipy.sparse as sparse

import jax.numpy as jnp

from osqp_tpu._oracle.solver import OracleSettings, ReferenceSolver
from osqp_tpu.batch import default_core_settings
from osqp_tpu.batch_shared import shared_mpc_rollout, shared_setup, shared_solve


def _problems(B, n, m, seed=0):
    rng = np.random.default_rng(seed)
    Lm = rng.standard_normal((n, n)) / np.sqrt(n)
    P = Lm @ Lm.T + 0.1 * np.eye(n)
    A = rng.standard_normal((m, n)) / np.sqrt(n)
    q = rng.standard_normal((B, n))
    x0 = rng.standard_normal((B, n))
    s0 = rng.random((B, m)) + 0.1
    u = x0 @ A.T + s0
    l = u - 2 * s0
    return P, A, q, l, u


def test_shared_solve_accuracy():
    B, n, m = 32, 16, 24
    P, A, q, l, u = _problems(B, n, m)
    f32 = jnp.float32
    host = OracleSettings(eps_abs=1e-4, eps_rel=1e-4)
    stg = default_core_settings(f32, eps_abs=1e-4, eps_rel=1e-4)
    P_s, A_s, Q, L_t, U_t, scal_t, rho0, Minv, M, rho_vec = shared_setup(
        P, A, q, l, u, host, dtype=f32
    )
    out = shared_solve(
        P_s, A_s, Q, L_t, U_t, scal_t, stg, rho0, Minv, M, rho_vec,
        jnp.zeros((n, B), f32), jnp.zeros((m, B), f32), jnp.zeros((m, B), f32),
    )
    status = np.asarray(out['status'])
    assert (status == 1).all(), status

    P_csc, A_csc = sparse.csc_matrix(P), sparse.csc_matrix(A)
    for b in range(0, B, 4):
        ref = ReferenceSolver()
        ref.setup(P_csc, q[b], A_csc, l[b], u[b],
                  verbose=False, eps_abs=1e-9, eps_rel=1e-9, max_iter=100000)
        sol, _ = ref.solve()
        np.testing.assert_allclose(np.asarray(out['x'])[b], sol.x, rtol=1e-2, atol=2e-3)


def test_shared_mpc_rollout_warm():
    B, n, m = 16, 12, 18
    P, A, q, l, u = _problems(B, n, m, seed=1)
    f32 = jnp.float32
    host = OracleSettings(eps_abs=1e-4, eps_rel=1e-4)
    stg = default_core_settings(f32, eps_abs=1e-4, eps_rel=1e-4)
    args = shared_setup(P, A, q, l, u, host, dtype=f32)
    P_s, A_s, Q, L_t, U_t, scal_t, rho0, Minv, M, rho_vec = args

    steps = 3
    rng = np.random.default_rng(2)
    q_seq = jnp.asarray(
        (q[None] + 0.005 * rng.standard_normal((steps, B, n))).transpose(0, 2, 1), f32
    )
    carry, (xs, iters, statuses) = shared_mpc_rollout(
        P_s, A_s, Q, L_t, U_t, scal_t, stg, rho0, Minv, M, rho_vec, q_seq
    )
    statuses = np.asarray(statuses)
    iters = np.asarray(iters)
    assert (statuses == 1).all()
    # warm steps after the first should be cheap
    assert iters[1:].mean() <= iters[0].mean() + 50

    # last step solution matches a fresh reference solve
    qk = np.asarray(q_seq[-1]).T
    b = 0
    ref = ReferenceSolver()
    ref.setup(sparse.csc_matrix(P), qk[b], sparse.csc_matrix(A), l[b], u[b],
              verbose=False, eps_abs=1e-9, eps_rel=1e-9, max_iter=100000)
    sol, _ = ref.solve()
    np.testing.assert_allclose(np.asarray(xs)[-1, b], sol.x, rtol=1e-2, atol=2e-3)


def test_batched_osqp_auto_shared_engine():
    """BatchedOSQP auto-selects the shared engine for unbatched P/A and
    agrees with the vmap engine."""
    from osqp_tpu.batch import BatchedOSQP

    B, n, m = 8, 10, 15
    P, A, q, l, u = _problems(B, n, m, seed=3)
    s = BatchedOSQP()
    s.setup(P, q, A, l, u, verbose=False, eps_abs=1e-4, eps_rel=1e-4)
    assert s._engine == 'shared'
    r = s.solve()
    assert all(v == 1 for v in r.info.status_val)

    sv = BatchedOSQP(engine='vmap')
    sv.setup(np.tile(P, (B, 1, 1)), q, np.tile(A, (B, 1, 1)), l, u,
             verbose=False, eps_abs=1e-4, eps_rel=1e-4)
    rv = sv.solve()
    np.testing.assert_allclose(r.x, rv.x, rtol=1e-2, atol=5e-3)
