"""Interrupt + time-limit semantics of the chunked host solve loop.

The reference C core polls a SIGINT flag inside the ADMM loop and exports
status OSQP_SIGINT (reference src/bindings.cpp.in:349-361) plus a
`time_limit` setting (bindings.cpp.in:440).  The jitted device loop cannot
poll signals, so the jax backend implements both at chunk boundaries of the
chunked continuation loop (osqp_tpu/backends/jax_backend.py::Solver.solve);
these tests pin that contract, including rho_updates accumulation across
chunks.
"""

import numpy as np
import pytest
import scipy.sparse as sparse

import osqp_tpu as osqp
from osqp_tpu.backends import jax_backend
from osqp_tpu.constants import SolverStatus


def _slow_qp(n=40, m=60, seed=4):
    """Badly-scaled-ish QP that needs a few hundred iterations at tight eps."""
    rng = np.random.default_rng(seed)
    L = sparse.random(n, n, density=0.4, random_state=rng)
    P = (L @ L.T + 0.05 * sparse.eye(n)).tocsc()
    q = rng.standard_normal(n)
    A = sparse.random(m, n, density=0.4, random_state=rng).tocsc()
    x0 = rng.standard_normal(n)
    s0 = rng.random(m)
    u = A @ x0 + s0
    l = u - 2 * s0 - 0.1
    return P, q, A, l, u


def _setup(time_limit, **extra):
    from utils import solve_eps

    P, q, A, l, u = _slow_qp()
    m = osqp.OSQP(algebra='jax')
    # f32 chip rows: 1e-9 is unreachable; 1e-6 still needs well over one
    # 50-iteration chunk (the interrupt point) but lets the post-interrupt
    # continuation finish SOLVED/INACCURATE
    eps = solve_eps(1e-9, f32=1e-6)
    m.setup(
        P=P, q=q, A=A, l=l, u=u, verbose=False,
        eps_abs=eps, eps_rel=eps, check_termination=5,
        time_limit=time_limit, **extra,
    )
    return m


def test_time_limit_reached():
    m = _setup(time_limit=1e-9)
    res = m.solve()
    assert res.info.status_val == int(SolverStatus.OSQP_TIME_LIMIT_REACHED)
    assert res.info.status == 'run time limit reached'
    # partial iterates are valid numbers
    assert np.isfinite(res.x).all()
    assert 0 < res.info.iter


def test_keyboard_interrupt_yields_sigint_status(monkeypatch):
    m = _setup(time_limit=1e9, max_iter=100000)
    calls = {'n': 0}

    def raise_after_two():
        calls['n'] += 1
        if calls['n'] >= 2:
            raise KeyboardInterrupt

    monkeypatch.setattr(jax_backend, '_poll_interrupt', raise_after_two)
    res = m.solve()
    assert res.info.status_val == int(SolverStatus.OSQP_SIGINT)
    assert res.info.status == 'interrupted'
    # valid partial iterates from the completed chunks
    assert np.isfinite(res.x).all()
    assert 0 < res.info.iter < 100000
    # a subsequent uninterrupted solve finishes from the partial iterates
    m.update_settings(time_limit=0)
    res2 = m.solve()
    assert res2.info.status_val in (
        int(SolverStatus.OSQP_SOLVED),
        int(SolverStatus.OSQP_SOLVED_INACCURATE),
    )


def test_interrupt_before_first_chunk_propagates(monkeypatch):
    m = _setup(time_limit=1e9)
    monkeypatch.setattr(
        jax_backend, '_poll_interrupt',
        lambda: (_ for _ in ()).throw(KeyboardInterrupt()),
    )
    with pytest.raises(KeyboardInterrupt):
        m.solve()


def test_rho_updates_accumulate_across_chunks():
    """Chunked (time_limit armed but never hit) and unchunked solves of the
    same QP must report the same iteration count AND the same rho_updates -
    regression for the last-chunk-only rho_updates bug."""
    m_plain = _setup(time_limit=0)
    res_plain = m_plain.solve()

    m_chunk = _setup(time_limit=1e9)
    res_chunk = m_chunk.solve()

    assert res_plain.info.iter == res_chunk.info.iter
    assert res_plain.info.rho_updates == res_chunk.info.rho_updates
    # the run must actually exercise >1 chunk and >=1 rho update for the
    # regression to bite
    assert res_chunk.info.iter > 100
    assert res_chunk.info.rho_updates >= 1


def test_plain_solve_interruptible_with_chunked_env(monkeypatch):
    """A plain solve() with NO time_limit can opt into chunked execution
    (OSQP_TPU_CHUNKED_SOLVE=1) and then returns OSQP_SIGINT on interrupt -
    closing the gap vs the C core's every-iteration polling (reference
    bindings.cpp.in:349-361)."""
    monkeypatch.setenv('OSQP_TPU_CHUNKED_SOLVE', '1')
    m = _setup(time_limit=0, max_iter=100000)
    calls = {'n': 0}

    def raise_after_two():
        calls['n'] += 1
        if calls['n'] >= 2:
            raise KeyboardInterrupt

    monkeypatch.setattr(jax_backend, '_poll_interrupt', raise_after_two)
    res = m.solve()
    assert res.info.status_val == int(SolverStatus.OSQP_SIGINT)
    assert np.isfinite(res.x).all()
    assert 0 < res.info.iter < 100000

    # without the env the same plain solve is a single uninterruptible
    # jitted call that completes normally
    monkeypatch.delenv('OSQP_TPU_CHUNKED_SOLVE')
    calls['n'] = 0
    m2 = _setup(time_limit=0, max_iter=100000)
    res2 = m2.solve()
    assert res2.info.status_val in (
        int(SolverStatus.OSQP_SOLVED),
        int(SolverStatus.OSQP_SOLVED_INACCURATE),
    )
