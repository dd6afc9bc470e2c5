"""Concurrent solves (coverage model: reference
src/osqp/tests/multithread_test.py, which proves GIL-release thread scaling).

Two contracts are pinned:

1. Correctness under concurrency (JAX dispatch is async and releases the GIL
   during device execution; the numpy core releases it inside scipy): many
   solvers driven from a thread pool must produce the same answers as serial
   execution.
2. Concurrency SCALING evidence — the TPU analogue of the reference's
   "2-thread pool beats serial" wall-clock test: async dispatch keeps many
   solves in flight, so a pipelined stream (synchronize once at the end)
   must beat a fully synchronized stream (block after every solve).  This is
   the mechanism the reference's GIL-release buys, expressed the jit way.
   The wall-clock assertion runs only on real accelerator devices
   (``OSQP_TPU_TEST_DEVICE=tpu``), where the per-sync cost is architectural
   rather than scheduler noise; on CPU CI it is skipped like the reference
   skips its multithread test on wasm (reference cibuildwheel.toml:24-30).
"""

import os
import time
from multiprocessing.pool import ThreadPool

import numpy as np
import pytest
import scipy.sparse as sparse

import osqp_tpu as osqp

from utils import solve_eps


def _problems(k, n, m, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(k):
        Pt = sparse.random(n, n, density=0.3, random_state=rng)
        P = (Pt.T @ Pt + sparse.eye(n)).tocsc()
        q = rng.standard_normal(n)
        A = sparse.random(m, n, density=0.3, random_state=rng, format='csc')
        u = 2 + rng.standard_normal(m)
        l = -2 - rng.standard_normal(m) ** 2
        out.append((P, q, A, l, u))
    return out

@pytest.mark.parametrize('algebra', ['numpy', 'jax'])
def test_multithreaded_solves_match_serial(algebra):
    probs = _problems(12, 20, 30)
    eps = solve_eps(1e-7, 1e-4) if algebra == 'jax' else 1e-7
    opts = dict(verbose=False, eps_abs=eps, eps_rel=eps)

    def solve_one(prob):
        P, q, A, l, u = prob
        model = osqp.OSQP(algebra=algebra)
        model.setup(P=P, q=q, A=A, l=l, u=u, **opts)
        res = model.solve()
        return res.x, res.info.status_val, res.info.iter

    serial = [solve_one(p) for p in probs]
    with ThreadPool(4) as pool:
        threaded = pool.map(solve_one, probs)

    for (xs, ss, its), (xt, st, itt) in zip(serial, threaded):
        assert ss == st == 1
        assert its == itt
        np.testing.assert_allclose(xs, xt, rtol=1e-10, atol=1e-12)


@pytest.mark.skipif(
    os.environ.get('OSQP_TPU_TEST_DEVICE') != 'tpu',
    reason='wall-clock scaling evidence runs on the real chip only',
)
def test_pipelined_dispatch_beats_synchronized():
    """Async-dispatch scaling (reference multithread_test.py:44-55 analogue):
    K batched solves synchronized once at the end must be strictly faster
    than the same K solves synchronized after each (measured r3: ~50 ms per
    sync on the axon tunnel vs ~4 ms marginal per pipelined solve)."""
    import jax
    import jax.numpy as jnp

    from osqp_tpu.batch import batch_qp_solve, default_core_settings

    rng = np.random.default_rng(0)
    B, n, m = 64, 16, 24
    L = rng.standard_normal((B, n, n))
    P = 0.1 * np.einsum('bij,bkj->bik', L, L) + 0.1 * np.eye(n)
    q = rng.standard_normal((B, n))
    A = rng.standard_normal((B, m, n))
    x0 = rng.standard_normal((B, n))
    s0 = rng.random((B, m)) + 0.1
    u = np.einsum('bmn,bn->bm', A, x0) + s0
    l = u - 2 * s0

    dt = jnp.float32
    stg = default_core_settings(dt, eps_abs=1e-3, eps_rel=1e-3)
    args = tuple(jnp.asarray(v, dt) for v in (P, q, A, l, u))
    rho = jnp.full((B,), 0.1, dt)

    res = batch_qp_solve(*args, stg, rho)  # compile + warm
    jax.block_until_ready(res.x)

    K = 8

    def synchronized():
        t0 = time.perf_counter()
        for _ in range(K):
            r = batch_qp_solve(*args, stg, rho)
            jax.block_until_ready(r.x)
            np.asarray(jnp.zeros(1) + 1)  # axon lazy-completion flush
        return time.perf_counter() - t0

    def pipelined():
        t0 = time.perf_counter()
        rs = [batch_qp_solve(*args, stg, rho) for _ in range(K)]
        jax.block_until_ready([r.x for r in rs])
        np.asarray(jnp.zeros(1) + 1)
        return time.perf_counter() - t0

    # best-of-2 each, pipelined measured second (pessimal cache order)
    t_sync = min(synchronized() for _ in range(2))
    t_pipe = min(pipelined() for _ in range(2))
    assert t_pipe < t_sync, (t_pipe, t_sync)
