"""Benchmark suite runner: QP families with independent parity reporting.

The reference's accuracy story is pinned by the OSQP paper's Maros-Meszaros
results at eps 1e-3 (see BASELINE.md).  Two comparator tiers:

* **oracle** - the repo's own float64 reference core (always available);
* **purepy** - the reference's OWN pure-Python solver imported straight from
  ``/root/reference/src/osqppurepy`` (an implementation this repo did not
  write): status + iteration parity against it breaks any
  self-certification loop.  Matched settings: purepy checks termination
  every iteration, has no duality-gap criterion, and adapts rho every 200
  iterations (reference _osqp.py:1225-1243), so the solver under test runs
  ``check_termination=1, check_dualgap=False, adaptive_rho_interval=200``
  for those rows.

Problem sources:

* seeded random families with the Maros-Meszaros structural variety
  (inequality QPs, equality-constrained, degenerate, LPs, wide/tall A);
* ``--maros-dir DIR`` - a directory of Maros-Meszaros ``.mat`` files in the
  osqp_benchmarks layout (keys P, q, A, l, u) is used INSTEAD when provided.

Run:  python benchmarks/runner.py [--sizes small|medium|large]
      [--algebra jax] [--comparator oracle|purepy|both] [--maros-dir DIR]

Interpreting iteration parity: 100% is not attainable across independent
implementations — the adaptive-rho trigger is a knife edge.  E.g. on
``mixed-100x150`` the oracle (sparse-LDL KKT) and the jax core (dense-Schur
Cholesky) accumulate ~1e-4 of FP-path iterate divergence by iteration 100,
which moves the ill-conditioned normalized-residual ratio across the 5x
trigger in one but not the other (estimates 0.56 vs 0.36 around the 0.50
threshold), costing 75 extra iterations.  Both solvers implement the same
formula (ref _osqp.py:880-908); statuses and objectives still agree.  The
suite reports the honest fraction rather than excluding such rows.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import time

import numpy as np
import scipy.sparse as sparse

_REFERENCE_SRC = '/root/reference/src'

# purepy (0.6-era) status values -> this package's SolverStatus values
_PUREPY_STATUS = {
    1: 1,    # SOLVED
    2: 2,    # SOLVED_INACCURATE
    -3: 3,   # PRIMAL_INFEASIBLE
    3: 4,    # PRIMAL_INFEASIBLE_INACCURATE
    -4: 5,   # DUAL_INFEASIBLE
    4: 6,    # DUAL_INFEASIBLE_INACCURATE
    -2: 7,   # MAX_ITER_REACHED
    -7: 9,   # NON_CVX
    -10: 11,  # UNSOLVED
}


def load_purepy():
    """Import the reference's own pure-Python solver as an independent
    comparator; None when the reference tree is unavailable."""
    import sys

    if not os.path.isdir(os.path.join(_REFERENCE_SRC, 'osqppurepy')):
        return None
    if _REFERENCE_SRC not in sys.path:
        sys.path.insert(0, _REFERENCE_SRC)
    try:
        import osqppurepy  # noqa: PLC0415

        return osqppurepy
    except Exception:
        return None


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
    elif kind == 'banded':
        # MPC-cascade structure: tridiagonal P, banded square A — exercises
        # the DIA SpMV path (ops/spmv.py) in the parity loop
        P = sparse.diags(
            [np.full(n, 2.0), np.full(n - 1, -0.7), np.full(n - 1, -0.7)],
            [0, 1, -1],
        ).tocsc()
        A = (sparse.eye(n)
             + sparse.diags([np.full(n - 2, 0.4)], [2], shape=(n, n))
             + sparse.diags([np.full(n - 1, -0.3)], [-1], shape=(n, n))).tocsc()
        x0 = x0[:n]
        s0 = rng.random(n) + 0.05
        u = A @ x0 + s0
        l = u - 2 * s0
    elif kind == 'pinf':
        # primal infeasible: the last two rows duplicate one constraint with
        # disjoint equality levels (ref certificate spec _osqp.py:796-820)
        u = A @ x0 + s0
        l = u - 2 * s0
        arow = sparse.csr_matrix(rng.standard_normal(n))
        A = sparse.vstack([A, arow, arow]).tocsc()
        l = np.concatenate([l, [1.0, 3.0]])
        u = np.concatenate([u, [1.0, 3.0]])
    elif kind == 'dinf':
        # dual infeasible (unbounded LP): nonnegative A, lower bounds only,
        # strictly negative costs -> a feasible improving ray exists
        # (ref certificate spec _osqp.py:822-878)
        P = sparse.csc_matrix((n, n))
        A = sparse.csc_matrix(np.abs(A.toarray()))
        q = -np.abs(q) - 0.1
        l = A @ np.abs(x0) - s0
        u = np.full(m, np.inf)
    elif kind == 'degen':
        # rank-deficient P (rank n//2) + duplicated constraint rows: the
        # degenerate/dual-nonunique corner of the Maros-Meszaros variety
        Pt = sparse.random(n, n // 2, density=density, random_state=rng)
        P = (Pt @ Pt.T).tocsc()
        A = sparse.vstack([A[: m // 2], A[: m - m // 2]]).tocsc()
        Ax = A @ x0
        s2 = np.concatenate([s0[: m // 2], s0[: m - m // 2]])
        u = Ax + s2
        l = u - 2 * s2
    elif kind == 'illcond':
        # ~1e8-condition P via geometric row/col scaling, plus row-scaled A
        s = np.logspace(-2, 2, n)
        P = sparse.diags(s) @ P @ sparse.diags(s)
        P = (0.5 * (P + P.T)).tocsc()
        r = np.logspace(-1, 1, m)
        A = (sparse.diags(r) @ A).tocsc()
        u = A @ x0 + r * s0
        l = u - 2 * r * s0
    else:
        raise ValueError(kind)
    return P, q, A, l, u


def load_maros_dir(path):
    """Yield (name, P, q, A, l, u) from Maros-Meszaros .mat files in the
    osqp_benchmarks layout (sparse P/A, vector q/l/u; key aliases accepted)."""
    import scipy.io as sio

    for fn in sorted(glob.glob(os.path.join(path, '*.mat'))):
        try:
            d = sio.loadmat(fn)
        except Exception as e:  # unreadable file: report, keep going
            print(f'skip {fn}: {e}')
            continue

        def pick(*keys):
            for k in keys:
                if k in d:
                    return d[k]
            return None

        P = pick('P', 'Q')
        q = pick('q', 'c')
        A = pick('A')
        l = pick('l', 'rl')
        u = pick('u', 'ru')
        if P is None or q is None or A is None:
            print(f'skip {fn}: missing P/q/A keys')
            continue
        P = sparse.csc_matrix(P)
        A = sparse.csc_matrix(A)
        q = np.asarray(q, float).ravel()
        l = (np.full(A.shape[0], -np.inf) if l is None
             else np.asarray(l, float).ravel())
        u = (np.full(A.shape[0], np.inf) if u is None
             else np.asarray(u, float).ravel())
        yield os.path.splitext(os.path.basename(fn))[0], P, q, A, l, u


SIZES = {
    'small': [(50, 75), (100, 150)],
    'medium': [(200, 300), (500, 750)],
    'large': [(1000, 1500), (2000, 3000)],
}
KINDS = ['ineq', 'eq', 'mixed', 'lp', 'loose', 'banded',
         'pinf', 'dinf', 'degen', 'illcond']
# families re-run with polishing ON (high-accuracy refinement parity,
# ref polish spec _osqp.py:1710-1828) at the first size of each class
POLISH_KINDS = ['ineq', 'mixed', 'degen']


def _iter_problems(args):
    if args.maros_dir:
        for name, P, q, A, l, u in load_maros_dir(args.maros_dir):
            yield name, P, q, A, l, u, False
        return
    import zlib

    for size_class in args.sizes.split(','):
        for si, (n, m) in enumerate(SIZES[size_class]):
            for kind in KINDS:
                # deterministic seed (builtin hash() is salted per process,
                # which made the suite non-reproducible run to run)
                seed = zlib.crc32(f'{kind}-{n}'.encode()) % 2**31
                P, q, A, l, u = problem_family(kind, n, m, seed=seed)
                # label with the ACTUAL constraint count (some families
                # reshape A)
                yield f'{kind}-{n}x{A.shape[0]}', P, q, A, l, u, False
                if si == 0 and kind in POLISH_KINDS:
                    yield f'{kind}-pol-{n}x{A.shape[0]}', P, q, A, l, u, True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--sizes', default='small,medium')
    ap.add_argument('--algebra', default='jax')
    ap.add_argument('--solver-type', default='direct')
    ap.add_argument('--eps', type=float, default=1e-3)
    ap.add_argument('--comparator', default='both',
                    choices=['oracle', 'purepy', 'both'])
    ap.add_argument('--maros-dir', default=os.environ.get('OSQP_TPU_MAROS_DIR'))
    args = ap.parse_args()

    # Parity is judged against float64 comparators (the reference's builtin
    # backend and purepy are both f64), so run the jax algebra at f64 on
    # CPU; f32 parity is covered separately by the TPU test ladder.  (Also
    # keeps the runner off the single-client TPU tunnel.)
    import jax

    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)

    import osqp_tpu as osqp

    purepy = load_purepy() if args.comparator in ('purepy', 'both') else None
    if args.comparator in ('purepy', 'both') and purepy is None:
        print('note: reference osqppurepy unavailable; oracle rows only')

    base_opts = dict(
        verbose=False,
        eps_abs=args.eps,
        eps_rel=args.eps,
        max_iter=20000,
        polishing=False,
        # pin the adaptive-rho cadence: at interval=0 (automatic) the f64
        # oracle uses the C core's TIME-BASED first trigger (it has real
        # timers) while the jitted core uses the fixed no-profiling
        # fallback — the same divergence a profiling vs non-profiling C
        # build shows.  Parity is only well-defined at a pinned interval.
        adaptive_rho_interval=100,
    )
    # purepy comparability settings (see module docstring)
    purepy_match = dict(check_termination=1, check_dualgap=False,
                        adaptive_rho_interval=200)

    rows = []
    for name, P, q, A, l, u, polish in _iter_problems(args):
        row = dict(name=name, n=P.shape[0], m=A.shape[0],
                   family=name.split('-')[0] + ('-pol' if polish else ''))
        opts = dict(base_opts, polishing=polish)

        if args.comparator in ('oracle', 'both'):
            t0 = time.perf_counter()
            ref = osqp.OSQP(algebra='numpy')
            ref.setup(P=P, q=q, A=A, l=l, u=u, **opts)
            rres = ref.solve()
            row['t_oracle'] = round(time.perf_counter() - t0, 4)

            t0 = time.perf_counter()
            model = osqp.OSQP(algebra=args.algebra)
            model.setup(P=P, q=q, A=A, l=l, u=u,
                        solver_type=args.solver_type, **opts)
            row['t_setup'] = round(time.perf_counter() - t0, 4)
            t0 = time.perf_counter()
            res = model.solve()
            row['t_solve'] = round(time.perf_counter() - t0, 4)
            row.update(
                status=res.info.status_val, status_oracle=rres.info.status_val,
                iters=res.info.iter, iters_oracle=rres.info.iter,
                obj_match=(
                    abs(res.info.obj_val - rres.info.obj_val)
                    <= 1e-3 * max(1.0, abs(rres.info.obj_val))
                    if res.info.status_val == rres.info.status_val == 1
                    else None
                ),
            )
            if polish:
                row['polish'] = res.info.status_polish
                row['polish_oracle'] = rres.info.status_polish

        if purepy is not None:
            pp = purepy.OSQP()
            t0 = time.perf_counter()
            pp.setup(P=P, q=q, A=A, l=l, u=u, verbose=False,
                     eps_abs=args.eps, eps_rel=args.eps,
                     max_iter=20000, polish=polish)
            rp = pp.solve()
            row['t_purepy'] = round(time.perf_counter() - t0, 4)

            mp_model = osqp.OSQP(algebra=args.algebra)
            mp_model.setup(P=P, q=q, A=A, l=l, u=u,
                           solver_type=args.solver_type,
                           **dict(opts, **purepy_match))
            mp_res = mp_model.solve()
            row.update(
                status_pp=mp_res.info.status_val,
                status_purepy=_PUREPY_STATUS.get(rp.info.status_val,
                                                 rp.info.status_val),
                iters_pp=mp_res.info.iter,
                iters_purepy=rp.info.iter,
            )
            if polish:
                row['polish_pp'] = mp_res.info.status_polish
                row['polish_purepy'] = int(getattr(rp.info, 'status_polish', 0))

        rows.append(row)
        msg = f"{name:22s} n={row['n']:5d} m={row['m']:5d}"
        if 'status' in row:
            msg += (f"  vs-oracle {row['status']}/{row['status_oracle']}"
                    f" it {row['iters']}/{row['iters_oracle']}")
        if 'status_purepy' in row:
            msg += (f"  vs-purepy {row['status_pp']}/{row['status_purepy']}"
                    f" it {row['iters_pp']}/{row['iters_purepy']}")
        if polish:
            msg += (f"  pol {row.get('polish')}/{row.get('polish_oracle')}"
                    f"/{row.get('polish_purepy')}")
        print(msg)

    summary = dict(problems=len(rows))
    oracle_rows = [r for r in rows if 'status_oracle' in r]
    if oracle_rows:
        summary['status_parity_vs_oracle'] = round(float(np.mean(
            [r['status'] == r['status_oracle'] for r in oracle_rows])), 3)
        summary['iteration_parity_vs_oracle'] = round(float(np.mean(
            [r['iters'] == r['iters_oracle'] for r in oracle_rows
             if r['status'] == r['status_oracle']])), 3)
        summary['total_solve_time'] = round(
            sum(r['t_solve'] for r in oracle_rows), 3)
        summary['total_oracle_time'] = round(
            sum(r['t_oracle'] for r in oracle_rows), 3)
    pp_rows = [r for r in rows if 'status_purepy' in r]
    if pp_rows:
        summary['status_parity_vs_reference_purepy'] = round(float(np.mean(
            [r['status_pp'] == r['status_purepy'] for r in pp_rows])), 3)
        summary['iteration_parity_vs_reference_purepy'] = round(float(np.mean(
            [r['iters_pp'] == r['iters_purepy'] for r in pp_rows
             if r['status_pp'] == r['status_purepy']])), 3)

    # per-family breakdown (vs the strongest available comparator)
    by_family = {}
    for r in rows:
        fam = r.get('family', r['name'].split('-')[0])
        sk, ik = (('status_pp', 'status_purepy') if 'status_purepy' in r
                  else ('status', 'status_oracle'))
        if sk not in r:
            continue
        ent = by_family.setdefault(fam, dict(n=0, status_ok=0, iter_ok=0))
        ent['n'] += 1
        ent['status_ok'] += int(r[sk] == r[ik])
        ent['iter_ok'] += int(
            r[sk] == r[ik]
            and r[('iters_pp' if sk == 'status_pp' else 'iters')]
            == r[('iters_purepy' if sk == 'status_pp' else 'iters_oracle')]
        )
    summary['by_family'] = {
        fam: dict(n=e['n'],
                  status_parity=round(e['status_ok'] / e['n'], 3),
                  iteration_parity=round(e['iter_ok'] / e['n'], 3))
        for fam, e in sorted(by_family.items())
    }
    print('\nsummary:')
    print(json.dumps(summary))


if __name__ == '__main__':
    main()
