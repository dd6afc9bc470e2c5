"""Generate golden solutions for the test suite.

Solves every deterministic test problem with the float64 reference core at
tight tolerances (+polish) and stores ``x_val, y_val, obj`` npz fixtures in
tests/solutions/ - mirroring the reference's offline-generated golden pattern
(reference src/osqp/tests/solutions/*.npz, loader tests/utils.py:5-8).

Run:  python tools/make_goldens.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tests'))

import problems  # noqa: E402
from osqp_tpu._oracle.solver import ReferenceSolver  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), '..', 'tests', 'solutions')

TIGHT = dict(
    verbose=False,
    eps_abs=1e-10,
    eps_rel=1e-10,
    max_iter=400000,
    polishing=True,
    polish_refine_iter=10,
    check_termination=25,
)


def solve_tight(P, q, A, l, u, **over):
    s = ReferenceSolver()
    opts = dict(TIGHT)
    opts.update(over)
    s.setup(P, q, A, l, u, **opts)
    sol, info = s.solve()
    assert info.status_val in (1, 2), f'golden solve failed: {info.status}'
    return sol, info


def save(name, sol, info):
    os.makedirs(OUT, exist_ok=True)
    np.savez(
        os.path.join(OUT, f'{name}.npz'),
        x_val=sol.x,
        y_val=sol.y,
        obj=info.obj_val,
    )
    print(f'{name}: obj={info.obj_val:.10f} iters={info.iter}')


def main():
    # basic family
    P, q, A, l, u = problems.basic_qp()
    save('test_basic_QP', *solve_tight(P, q, A, l, u))
    save('test_update_q', *solve_tight(P, np.array([10.0, 20.0]), A, l, u))
    save('test_update_l', *solve_tight(P, q, A, -50 * np.ones(5), u))
    save('test_update_u', *solve_tight(P, q, A, l, 1000 * np.ones(5)))
    save('test_update_bounds', *solve_tight(P, q, A, -100 * np.ones(5), 1000 * np.ones(5)))

    # update_matrices family
    d = problems.update_matrices_family()
    save('test_solve', *solve_tight(d['P'], d['q'], d['A'], d['l'], d['u']))
    save('test_update_P', *solve_tight(d['P_new'], d['q'], d['A'], d['l'], d['u']))
    save('test_update_A', *solve_tight(d['P'], d['q'], d['A_new'], d['l'], d['u']))
    save('test_update_P_A', *solve_tight(d['P_new'], d['q'], d['A_new'], d['l'], d['u']))

    # polish family
    save('test_polish_simple', *solve_tight(*problems.polish_simple()))
    save('test_polish_unconstrained', *solve_tight(*problems.polish_unconstrained()))
    save('test_polish_random', *solve_tight(*problems.polish_random()))

    # others
    save('test_unconstrained_problem', *solve_tight(*problems.unconstrained()))
    save('test_feasibility_problem', *solve_tight(*problems.feasibility(), polishing=False))

    # infeasibility certificates (solved at the test's own settings)
    P, q, A, l, u = problems.primal_infeasible()
    s = ReferenceSolver()
    s.setup(P, q, A, l, u, verbose=False, eps_abs=1e-5, eps_rel=1e-5, eps_dual_inf=1e-20, max_iter=2500, polishing=False)
    sol, info = s.solve()
    assert info.status_val == 3, info.status
    cert = sol.prim_inf_cert / np.linalg.norm(sol.prim_inf_cert)
    np.savez(os.path.join(OUT, 'test_primal_infeasibility.npz'), normalized_prim_inf_cert_correct=cert)
    print('test_primal_infeasibility: cert saved')

    certs = {}
    for key, prob in (('lp', problems.dual_infeasible_lp()), ('qp', problems.dual_infeasible_qp())):
        P, q, A, l, u = prob
        s = ReferenceSolver()
        s.setup(
            P, q, A, l, u,
            verbose=False, eps_abs=1e-5, eps_rel=1e-5, eps_prim_inf=1e-15,
            eps_dual_inf=1e-6, scaling=3, max_iter=2500, polishing=False,
            check_termination=1, polish_refine_iter=4,
        )
        sol, info = s.solve()
        assert info.status_val == 5, info.status
        certs[f'{key}_normalized_dual_inf_cert_correct'] = sol.dual_inf_cert / np.linalg.norm(sol.dual_inf_cert)
    np.savez(os.path.join(OUT, 'test_dual_infeasibility.npz'), **certs)
    print('test_dual_infeasibility: certs saved')


if __name__ == '__main__':
    main()
