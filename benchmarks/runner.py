"""Benchmark suite runner: random sparse QP families with parity reporting.

The reference's accuracy story is pinned by the OSQP paper's Maros-Meszaros
results at eps 1e-3 (see BASELINE.md).  The curated Maros-Meszaros set is not
redistributable inside this repo, so the suite here generates seeded random
families with the same structural variety (inequality QPs, equality-
constrained, degenerate, LPs, wide/tall A) and reports, per backend:

* status parity and iteration-count parity vs the float64 reference core
  (the OSQP-algorithm oracle), and
* wall-clock per solve.

Run:  python benchmarks/runner.py [--sizes small|medium|large] [--algebra jax]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import scipy.sparse as sparse


def problem_family(kind, n, m, seed):
    rng = np.random.default_rng(seed)
    density = min(0.4, 10.0 / n)
    Pt = sparse.random(n, n, density=density, random_state=rng)
    P = (Pt.T @ Pt + 0.05 * sparse.eye(n)).tocsc()
    q = rng.standard_normal(n)
    A = sparse.random(m, n, density=density, random_state=rng, format='csc')
    A = (A + 0.05 * sparse.random(m, n, density=5.0 / n, random_state=rng)).tocsc()
    x0 = rng.standard_normal(n)
    s0 = rng.random(m) + 0.05

    if kind == 'ineq':
        u = A @ x0 + s0
        l = u - 2 * s0
    elif kind == 'eq':
        u = A @ x0
        l = u.copy()
    elif kind == 'mixed':
        u = A @ x0 + s0
        l = u - 2 * s0
        k = m // 3
        u[:k] = l[:k] = (A @ x0)[:k]
    elif kind == 'lp':
        P = sparse.csc_matrix((n, n))
        u = A @ x0 + s0
        l = A @ x0 - 3 * s0
        q = np.abs(q)  # bounded LP-ish
    elif kind == 'loose':
        u = np.full(m, np.inf)
        l = A @ x0 - s0
    else:
        raise ValueError(kind)
    return P, q, A, l, u


SIZES = {
    'small': [(50, 75), (100, 150)],
    'medium': [(200, 300), (500, 750)],
    'large': [(1000, 1500), (2000, 3000)],
}
KINDS = ['ineq', 'eq', 'mixed', 'lp', 'loose']


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--sizes', default='small,medium')
    ap.add_argument('--algebra', default='jax')
    ap.add_argument('--solver-type', default='direct')
    ap.add_argument('--eps', type=float, default=1e-3)
    args = ap.parse_args()

    import osqp_tpu as osqp

    opts = dict(
        verbose=False,
        eps_abs=args.eps,
        eps_rel=args.eps,
        max_iter=20000,
        polishing=False,
    )

    rows = []
    for size_class in args.sizes.split(','):
        for (n, m) in SIZES[size_class]:
            for kind in KINDS:
                P, q, A, l, u = problem_family(kind, n, m, seed=hash((kind, n)) % 2**31)

                # oracle (float64 scipy reference core)
                t0 = time.perf_counter()
                ref = osqp.OSQP(algebra='numpy')
                ref.setup(P=P, q=q, A=A, l=l, u=u, **opts)
                rres = ref.solve()
                t_ref = time.perf_counter() - t0

                # backend under test
                t0 = time.perf_counter()
                model = osqp.OSQP(algebra=args.algebra)
                model.setup(P=P, q=q, A=A, l=l, u=u, solver_type=args.solver_type, **opts)
                t_setup = time.perf_counter() - t0
                t0 = time.perf_counter()
                res = model.solve()
                t_solve = time.perf_counter() - t0

                obj_match = (
                    abs(res.info.obj_val - rres.info.obj_val)
                    <= 1e-3 * max(1.0, abs(rres.info.obj_val))
                    if res.info.status_val == rres.info.status_val == 1
                    else None
                )
                rows.append(
                    dict(
                        kind=kind, n=n, m=m,
                        status=res.info.status_val,
                        status_ref=rres.info.status_val,
                        iters=res.info.iter,
                        iters_ref=rres.info.iter,
                        obj_match=obj_match,
                        t_setup=round(t_setup, 4),
                        t_solve=round(t_solve, 4),
                        t_ref=round(t_ref, 4),
                    )
                )
                r = rows[-1]
                print(
                    f"{kind:6s} n={n:5d} m={m:5d}  status {r['status']}/{r['status_ref']}"
                    f"  iters {r['iters']}/{r['iters_ref']}  solve {r['t_solve']:.3f}s"
                    f"  (ref {r['t_ref']:.3f}s)"
                )

    status_parity = np.mean([r['status'] == r['status_ref'] for r in rows])
    iter_parity = np.mean(
        [r['iters'] == r['iters_ref'] for r in rows if r['status'] == r['status_ref']]
    )
    print('\nsummary:')
    print(json.dumps(dict(
        problems=len(rows),
        status_parity=round(float(status_parity), 3),
        iteration_parity=round(float(iter_parity), 3),
        total_solve_time=round(sum(r['t_solve'] for r in rows), 3),
        total_ref_time=round(sum(r['t_ref'] for r in rows), 3),
    )))


if __name__ == '__main__':
    main()
