"""Concurrent solves (coverage model: reference
src/osqp/tests/multithread_test.py, which proves GIL-release thread scaling).

Here the contract is correctness under concurrency (JAX dispatch is async and
releases the GIL during device execution; the numpy core releases it inside
scipy): many solvers driven from a thread pool must produce the same answers
as serial execution.  Wall-clock assertions are intentionally avoided (flaky
under virtualized CI), matching the spirit, not the letter, of the reference
test.
"""

from multiprocessing.pool import ThreadPool

import numpy as np
import pytest
import scipy.sparse as sparse

import osqp_tpu as osqp


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
    opts = dict(verbose=False, eps_abs=1e-7, eps_rel=1e-7)

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
