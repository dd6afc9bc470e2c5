"""Adjoint derivatives of the QP solution map.

Implements the reference's ``osqp_adjoint_derivative_{compute,get_mat,get_vec}``
surface (reference src/bindings.cpp.in:302-318, validated against finite
differences by reference tests/derivative_test.py) via implicit
differentiation of the active-set KKT conditions.

At a non-degenerate solution (x*, y*) with active rows  A_act x = b
(b = l on lower-active rows, u on upper-active), the solution locally solves
the equality-constrained QP with KKT operator

    K = [[P, A_act'], [A_act, 0]].

Given adjoint seeds (dx, dy) of a loss l(x*, y*), solve K r = [dx; dy_act]
(delta-regularized + iterative refinement, same machinery as polish) and read
off

    dq = -r_x
    dl_i = r_y_i   (lower-active i),   du_i = r_y_i  (upper-active i)
    dP = -(r_x x*' + x* r_x') / 2
    dA_i = -(y_i r_x + r_y_i x*)'      (active rows; 0 otherwise)

Derivation: dl/dtheta = -[dx;dy]' K^{-1} dF/dtheta for the KKT residual F.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla


def adjoint_derivative(P, q, A, l, u, x, y, dx, dy, delta=1e-8, refine_iters=8):
    """Compute adjoint derivatives.  All inputs numpy/scipy (unscaled problem
    space); returns dict(dq, dl, du, dP (n,n) dense sym, dA (m,n) dense)."""
    P = sp.csc_matrix(P)
    # accept triu-only storage
    P_full = sp.triu(P, format='csc')
    P_full = (P_full + P_full.T - sp.diags(P_full.diagonal())).tocsc()
    A = sp.csc_matrix(A)
    n = P_full.shape[0]
    m = A.shape[0]
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64) if m else np.zeros(0)
    dx = np.asarray(dx, np.float64)
    dy = np.asarray(dy, np.float64) if dy is not None else np.zeros(m)

    if m:
        z = A @ x
        # Active-set guess via slack-vs-multiplier comparison (same rule as
        # polish, ref _osqp.py:1719-1720): robust to |y| ~ solver-tolerance
        # noise on inactive rows.  Weakly-active ties are excluded (gradient
        # correct almost everywhere, matching the reference's behavior).
        low = (z - l) < -y
        upp = (u - z) < y
        active = low | upp
        idx = np.where(active)[0]
    else:
        idx = np.zeros(0, dtype=int)
        low = upp = np.zeros(0, dtype=bool)

    A_act = A[idx] if m else sp.csc_matrix((0, n))
    k = A_act.shape[0]

    K = sp.bmat(
        [
            [P_full + delta * sp.eye(n), A_act.T if k else None],
            [A_act if k else None, -delta * sp.eye(k) if k else None],
        ],
        format='csc',
    )
    solve = spla.splu(K).solve
    rhs = np.concatenate([dx, dy[idx]])
    r = solve(rhs)
    # refinement against the unregularized K
    for _ in range(refine_iters):
        res = rhs - np.concatenate(
            [
                P_full @ r[:n] + (A_act.T @ r[n:] if k else 0.0),
                A_act @ r[:n] if k else np.zeros(0),
            ]
        )
        r = r + solve(res)

    r_x = r[:n]
    r_nu = r[n:]

    dq = -r_x
    dl = np.zeros(m)
    du = np.zeros(m)
    r_y_full = np.zeros(m)
    r_y_full[idx] = r_nu
    dl[low] = r_y_full[low]
    du[upp] = r_y_full[upp]

    dP = -0.5 * (np.outer(r_x, x) + np.outer(x, r_x))
    dA = np.zeros((m, n))
    if k:
        dA[idx] = -(np.outer(y[idx], r_x) + np.outer(r_nu, x))

    return {'dq': dq, 'dl': dl, 'du': du, 'dP': dP, 'dA': dA}


def forward_derivative(P, q, A, l, u, x, y, dP=None, dq=None, dA=None, dl=None,
                       du=None, delta=1e-8, refine_iters=8):
    """Forward-mode sensitivities of the solution map.

    Given data perturbation directions (dP, dq, dA, dl, du), returns
    ``(dx, dyl, dyu)`` - the directional derivatives of the primal solution
    and of the split dual multipliers ``yl = max(-y, 0)``, ``yu = max(y, 0)``
    (the contract of the reference's not-yet-implemented
    ``forward_derivative``, reference tests/derivative_test.py:79-98).

    Same active-set implicit-function machinery as :func:`adjoint_derivative`:
    solve K [dx; dnu] = -[dP x + dq + dA' nu_act ; (dA x - db)_act].
    """
    P = sp.csc_matrix(P)
    P_full = sp.triu(P, format='csc')
    P_full = (P_full + P_full.T - sp.diags(P_full.diagonal())).tocsc()
    A = sp.csc_matrix(A)
    n = P_full.shape[0]
    m = A.shape[0]
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64) if m else np.zeros(0)

    dP_m = np.zeros((n, n)) if dP is None else np.asarray(sp.csc_matrix(dP).todense())
    dP_m = np.triu(dP_m) + np.triu(dP_m, 1).T  # symmetric perturbation
    dq_v = np.zeros(n) if dq is None else np.asarray(dq, np.float64)
    dA_m = np.zeros((m, n)) if dA is None else np.asarray(sp.csc_matrix(dA).todense())
    dl_v = np.zeros(m) if dl is None else np.asarray(dl, np.float64)
    du_v = np.zeros(m) if du is None else np.asarray(du, np.float64)

    if m:
        z = A @ x
        low = (z - np.asarray(l, np.float64)) < -y
        upp = (np.asarray(u, np.float64) - z) < y
        active = low | upp
        idx = np.where(active)[0]
    else:
        low = upp = np.zeros(0, dtype=bool)
        idx = np.zeros(0, dtype=int)

    A_act = A[idx] if m else sp.csc_matrix((0, n))
    k = A_act.shape[0]
    db = np.where(low, dl_v, np.where(upp, du_v, 0.0))[idx] if m else np.zeros(0)

    r1 = dP_m @ x + dq_v + (dA_m.T @ y if m else 0.0)
    r2 = (dA_m[idx] @ x - db) if k else np.zeros(0)

    K = sp.bmat(
        [
            [P_full + delta * sp.eye(n), A_act.T if k else None],
            [A_act if k else None, -delta * sp.eye(k) if k else None],
        ],
        format='csc',
    )
    solve = spla.splu(K).solve
    rhs = -np.concatenate([r1, r2])
    sol = solve(rhs)
    for _ in range(refine_iters):
        res = rhs - np.concatenate(
            [
                P_full @ sol[:n] + (A_act.T @ sol[n:] if k else 0.0),
                A_act @ sol[:n] if k else np.zeros(0),
            ]
        )
        sol = sol + solve(res)

    dx = sol[:n]
    dnu = np.zeros(m)
    dnu[idx] = sol[n:]
    dyu = np.where(upp, dnu, 0.0)
    dyl = np.where(low, -dnu, 0.0)
    return dx, dyl, dyu
