"""Shared-structure batched solver: the MXU speed-of-light path.

The canonical MPC/scenario workload solves thousands of QPs with the SAME
``P`` and ``A`` (same plant/constraint structure) and per-instance
``q, l, u`` (initial states, references).  With a shared KKT operator the
per-iteration linear algebra collapses from batched matvecs into single
dense matmuls:

    RHS = sigma X - Q + A' (rho * B2)        (n,m) @ (m,B)
    Xt  = Minv @ RHS (+ one refinement)      (n,n) @ (n,B)  <- MXU
    AXt = A @ Xt                             (m,n) @ (n,B)  <- MXU

so one TPU chip advances the whole batch at matrix-unit throughput - the
design the reference's CUDA backend cannot express (it solves instances
independently; reference nn/torch.py:200-217 threads them on CPU).

Semantics notes vs the per-instance path:

* rho is a single shared scalar (vector rho by constraint type is still
  applied, using the shared constraint typing of the FIRST instance's
  bounds pattern when bounds differ only in values; loose/equality typing
  uses per-instance bounds for projection and termination, but the KKT
  operator uses the shared rho_vec).  Adaptive rho uses the batch-median
  estimate and refactorizes the single shared operator.
* Ruiz scaling is computed from the shared P/A (cost normalization uses the
  batch-mean |q|), so D/E/c are shared.
* Termination, certificates and statuses remain exact per instance.
"""

from __future__ import annotations

import functools
import os
import time
from types import SimpleNamespace
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .constants import SolverStatus, status_string
from .ops.shared_epoch import shared_body_pallas
from .solver import core

_UNSOLVED = int(SolverStatus.OSQP_UNSOLVED)
_MAX_ITER = int(SolverStatus.OSQP_MAX_ITER_REACHED)
_PRIM_INF = int(SolverStatus.OSQP_PRIMAL_INFEASIBLE)
_PRIM_INF_INACC = int(SolverStatus.OSQP_PRIMAL_INFEASIBLE_INACCURATE)
_DUAL_INF = int(SolverStatus.OSQP_DUAL_INFEASIBLE)
_DUAL_INF_INACC = int(SolverStatus.OSQP_DUAL_INFEASIBLE_INACCURATE)


class SharedState(NamedTuple):
    it: jax.Array
    S: jax.Array  # (n+2m, B) stacked iterates [x; z; y]
    dX: jax.Array  # (n, B)
    dY: jax.Array  # (m, B)
    rho: jax.Array  # shared scalar
    rho_vec: jax.Array  # (m,)
    rho_inv: jax.Array  # (m,)
    Minv: jax.Array  # (n, n)
    M: jax.Array  # (n, n)
    F: jax.Array  # (n+m, n+2m) affine iteration map (see _build_affine)
    c0: jax.Array  # (n+m, B) affine constant
    status: jax.Array  # (B,)
    iters_done: jax.Array
    rho_updates: jax.Array  # scalar
    fS: jax.Array  # (n+2m, B) captured solution iterates
    fdX: jax.Array
    fdY: jax.Array
    pri_res: jax.Array
    dua_res: jax.Array
    obj_val: jax.Array
    dual_obj_val: jax.Array


def _build_affine(A, At, Minv, M, rho_vec, rho_inv, sigma, alpha, Q, mm, dtype):
    """Assemble the affine iteration map.

    One ADMM iteration (ref _osqp.py:644-703) with the explicit-inverse KKT
    solve (one refinement step folded into ``R2 = 2 Minv - Minv M Minv``,
    identical operator in exact arithmetic) and the algebraic identity
    ``z_tilde == A x_tilde`` (the dual recovery ``nu = rho(A x_t - b2)``
    makes ``z + (nu - y)/rho == A x_t`` for rho > 0) collapses to::

        [x_tilde; pre_proj_z] = F @ [x; z; y] + c0
        z_new = clip(pre_proj_z, l, u)
        y_new = y + rho (pre_proj_z - y/rho - z_new)
        x_new = alpha x_tilde + (1-alpha) x

    which is ONE (n+m, n+2m) matmul per iteration — fully packed on the
    MXU for typical MPC shapes — instead of five small ones.
    """
    n = Minv.shape[0]
    m = A.shape[0]
    R2 = 2.0 * Minv - mm(Minv, mm(M, Minv))
    W1 = mm(R2, At)  # (n, m) = R2 A'
    AR2 = mm(A, R2)  # (m, n)
    W2 = mm(A, W1)  # (m, m) = A R2 A'
    J = rho_vec * rho_inv  # elementwise in {0, 1}; 0 only on padded rows
    Fx_t = sigma * R2
    Fz_t = W1 * rho_vec[None, :]
    Fy_t = -W1 * J[None, :]
    Fx_p = (sigma * alpha) * AR2
    Fz_p = alpha * (W2 * rho_vec[None, :]) + (1 - alpha) * jnp.eye(m, dtype=dtype)
    Fy_p = -alpha * (W2 * J[None, :]) + jnp.diag(rho_inv)
    F = jnp.concatenate([
        jnp.concatenate([Fx_t, Fz_t, Fy_t], axis=1),
        jnp.concatenate([Fx_p, Fz_p, Fy_p], axis=1),
    ], axis=0)
    G1 = mm(R2, Q)  # (n, B)
    c0 = jnp.concatenate([-G1, -alpha * mm(A, G1)], axis=0)
    return F, c0


def _round_up(x: int, k: int) -> int:
    return -(-x // k) * k


def _fused_epoch_mode(dtype, n: int, m: int, B: int):
    """Trace-time dispatch for the Pallas fused-epoch kernel.

    ``OSQP_TPU_FUSED_SHARED``: ``auto`` (default; on for TPU+float32 when the
    shared matrices fit VMEM), ``0`` (off), ``interpret`` (Pallas interpreter,
    any backend — used by the CPU equivalence tests).
    """
    env = os.environ.get('OSQP_TPU_FUSED_SHARED', 'auto')
    if env == '0' or m == 0 or B == 0:
        return None
    if env == 'interpret':
        return 'interpret'
    if dtype != jnp.float32 or jax.default_backend() != 'tpu':
        return None
    n8, m8 = _round_up(n, 8), _round_up(m, 8)
    shared_bytes = (2 * n8 * n8 + 2 * m8 * n8 + 2 * m8) * 4
    if shared_bytes + 21 * max(n8, m8) * 128 * 4 > 12 * 2**20:
        return None
    return 'tpu'


def _batch_rho_estimate(CH, At, n, Q, X, Z, Y, rho, mm):
    """Per-column rho estimate (ref _osqp.py:880-908): same math as
    core.rho_estimate_fn but over the whole batch as two stacked matmuls
    (``[P; A] @ X`` and ``A' @ Y``) plus columnwise inf-norm reductions."""
    dtype = X.dtype
    PAX = mm(CH, X)
    PX, AX = PAX[:n], PAX[n:]
    AtY = mm(At, Y)

    def cm(V):
        return jnp.max(jnp.abs(V), axis=0)

    eps10 = jnp.asarray(1e-10, dtype)
    pri_n = cm(AX - Z) / (jnp.maximum(cm(AX), cm(Z)) + eps10)
    dua_n = cm(PX + Q + AtY) / (
        jnp.maximum(jnp.maximum(cm(AtY), cm(PX)), cm(Q)) + eps10
    )
    return jnp.clip(
        rho * jnp.sqrt(pri_n / (dua_n + eps10)), core.RHO_MIN, core.RHO_MAX
    )


def _pad2(V, r, c):
    """Zero-pad a 2-D array to (r, c)."""
    return jnp.pad(V, ((0, r - V.shape[0]), (0, c - V.shape[1])))


def _pad1(v, r, value=0.0):
    return jnp.pad(v, (0, r - v.shape[0]), constant_values=value)


def _batch_check_shared(P, A, Q, L_b, U_b, scal, settings, X, Z, Y, dX, dY,
                        approximate, mm):
    """Batch-level termination check for the shared engine: same math as
    core.termination_status (ref _osqp.py:705-878, 998-1077) but expressed as
    three dense matmuls + columnwise reductions instead of vmapped
    per-instance matvecs.  Equivalence is pinned by
    tests/test_shared_batch.py::test_batch_check_equivalence."""
    n, B = X.shape
    m = Z.shape[0]
    dtype = X.dtype
    MIN_SCALING = 1e-4
    OSQP_INFTY = 1e30

    factor = jnp.where(approximate, 10.0, 1.0)
    eps_abs = settings.eps_abs * factor
    eps_rel = settings.eps_rel * factor
    eps_pinf = settings.eps_prim_inf * factor
    eps_dinf = settings.eps_dual_inf * factor
    unscaled = ~settings.scaled_termination

    PX = mm(P, X)
    AX = mm(A, X) if m else jnp.zeros((0, B), dtype)
    AtY = mm(A.T, Y) if m else jnp.zeros((n, B), dtype)

    def colmax(V):
        return jnp.max(jnp.abs(V), axis=0) if V.shape[0] else jnp.zeros((B,), dtype)

    Einv = scal.Einv[:, None]
    Dinv = scal.Dinv[:, None]

    # primal residual
    pri_vec = AX - Z
    pri_res = jnp.where(unscaled, colmax(Einv * pri_vec), colmax(pri_vec)) if m else jnp.zeros((B,), dtype)

    # dual residual
    dua_vec = PX + Q + AtY
    dua_res = jnp.where(unscaled, scal.cinv * colmax(Dinv * dua_vec), colmax(dua_vec))

    # objective + negative-curvature guard
    quad = 0.5 * jnp.sum(X * PX, axis=0)
    obj = (quad + jnp.sum(Q * X, axis=0)) * scal.cinv
    noncvx_neg = (quad * scal.cinv) < (-1e-12 * jnp.maximum(1.0, jnp.sum(X * X, axis=0)))
    pri_res = jnp.where(noncvx_neg, 2 * OSQP_INFTY, pri_res)

    # dual objective (loose-bound contributions dropped)
    if m:
        Yu = scal.cinv * (scal.E[:, None] * Y)
        # zero computational-noise duals before the sup (see
        # core.compute_info; columnwise noise floor)
        y_tol = jnp.finfo(dtype).eps * jnp.max(jnp.abs(Yu), axis=0, keepdims=True)
        Yu = jnp.where(jnp.abs(Yu) > y_tol, Yu, 0.0)
        Lu = Einv * L_b
        Uu = Einv * U_b
        sup_pos = jnp.where(Uu < OSQP_INFTY * MIN_SCALING, Uu * jnp.maximum(Yu, 0), 0.0)
        sup_neg = jnp.where(Lu > -OSQP_INFTY * MIN_SCALING, Lu * jnp.minimum(Yu, 0), 0.0)
        sup = jnp.sum(sup_pos, axis=0) + jnp.sum(sup_neg, axis=0)
        sup_mag = jnp.sum(jnp.abs(sup_pos), axis=0) + jnp.sum(jnp.abs(sup_neg), axis=0)
    else:
        sup = jnp.zeros((B,), dtype)
        sup_mag = jnp.zeros((B,), dtype)
    dual_obj = -quad * scal.cinv - sup
    # rounding-noise scale of the computed gap (see core.compute_info; zero
    # effect at float64)
    gap_noise = jnp.finfo(dtype).eps * (
        sup_mag + jnp.abs(quad * scal.cinv) + jnp.abs(jnp.sum(Q * X, axis=0)) * scal.cinv
    )

    # tolerances
    if m:
        Ax_t = jnp.where(unscaled, colmax(Einv * AX), colmax(AX))
        z_t = jnp.where(unscaled, colmax(Einv * Z), colmax(Z))
        eps_pri = eps_abs + eps_rel * jnp.maximum(Ax_t, z_t)
    else:
        eps_pri = jnp.full((B,), eps_abs, dtype)

    def dscale(V):
        return jnp.where(unscaled, colmax(Dinv * V), colmax(V))

    scale_d = jnp.where(unscaled, scal.cinv, jnp.ones((), dtype))
    q_t = dscale(Q)
    eps_dua = eps_abs + eps_rel * scale_d * jnp.maximum(jnp.maximum(dscale(AtY), dscale(PX)), q_t)

    noncvx = (pri_res > OSQP_INFTY) | (dua_res > OSQP_INFTY)
    pri_check = (pri_res < eps_pri) if m else jnp.ones((B,), bool)
    dua_check = dua_res < eps_dua

    # primal infeasibility (ref _osqp.py:796-820)
    if m:
        norm_dY = jnp.where(unscaled, colmax(scal.E[:, None] * dY), colmax(dY))
        lhs = jnp.sum(U_b * jnp.maximum(dY, 0) + L_b * jnp.minimum(dY, 0), axis=0)
        AtdY = mm(A.T, dY)
        AtdY_n = jnp.where(unscaled, colmax(Dinv * AtdY), colmax(AtdY))
        pinf = (norm_dY > eps_pinf) & (lhs < -eps_pinf * norm_dY) & (AtdY_n < eps_pinf * norm_dY)
    else:
        pinf = jnp.zeros((B,), bool)
    pinf = jnp.where(pri_check, False, pinf)

    # dual infeasibility (ref _osqp.py:822-878)
    norm_dX = jnp.where(unscaled, colmax(scal.D[:, None] * dX), colmax(dX))
    cost_scale = jnp.where(unscaled, scal.c, jnp.ones((), dtype))
    dinf = norm_dX > eps_dinf
    dinf &= jnp.sum(Q * dX, axis=0) < (-cost_scale * eps_dinf * norm_dX)
    PdX = mm(P, dX)
    PdX_n = jnp.where(unscaled, colmax(Dinv * PdX), colmax(PdX))
    dinf &= PdX_n < cost_scale * eps_dinf * norm_dX
    if m:
        AdX = mm(A, dX)
        AdX = jnp.where(unscaled, Einv * AdX, AdX)
        u_fin = U_b < OSQP_INFTY * MIN_SCALING
        l_fin = L_b > -OSQP_INFTY * MIN_SCALING
        bad = (u_fin & (AdX > eps_dinf * norm_dX[None])) | (l_fin & (AdX < -eps_dinf * norm_dX[None]))
        dinf &= ~jnp.any(bad, axis=0)
    dinf = jnp.where(dua_check, False, dinf)

    solved_code = jnp.where(approximate, 2, 1)
    pinf_code = jnp.where(approximate, 4, 3)
    dinf_code = jnp.where(approximate, 6, 5)

    # duality-gap criterion (OSQP v1 C core; gated by check_dualgap)
    gap = obj - dual_obj
    eps_gap = (
        eps_abs + eps_rel * jnp.maximum(jnp.abs(obj), jnp.abs(dual_obj))
        + 10.0 * gap_noise
    )
    gap_ok = (~settings.check_dualgap) | (jnp.isfinite(gap) & (jnp.abs(gap) < eps_gap))

    status = jnp.where(
        noncvx, 9,
        jnp.where(pri_check & dua_check & gap_ok, solved_code,
                  jnp.where(pinf, pinf_code, jnp.where(dinf, dinf_code, _UNSOLVED))),
    ).astype(jnp.int32)

    obj = jnp.where(
        status == 9, jnp.nan,
        jnp.where(status == pinf_code, OSQP_INFTY,
                  jnp.where(status == dinf_code, -OSQP_INFTY, obj)),
    )
    return status, pri_res, dua_res, obj, dual_obj


def _iter_precision_mode() -> str:
    """Matmul precision for the ADMM *iteration* map (trace-time static).

    Termination checks, residuals, certificates and the rho estimate always
    run at HIGHEST — a solution is only accepted if it passes the full-
    precision check, so lowering the iteration precision can cost iterations
    but never correctness.  ``OSQP_TPU_ITER_PRECISION``:

    * ``highest`` — 6-pass bf16 (exact f32; round-1 behavior)
    * ``high``    — 3-pass bf16 (~f32 accuracy, 2x fewer MXU cycles)
    * ``default`` — 1-pass bf16 (fastest; ~4e-3 relative noise)
    """
    return os.environ.get('OSQP_TPU_ITER_PRECISION', 'highest')


_PRECISIONS = {
    'highest': jax.lax.Precision.HIGHEST,
    'high': jax.lax.Precision.HIGH,
    'default': jax.lax.Precision.DEFAULT,
}


def shared_solve(
    P: jax.Array,  # (n, n) scaled shared
    A: jax.Array,  # (m, n) scaled shared
    Q: jax.Array,  # (n, B) scaled per-instance costs
    L_b: jax.Array,  # (m, B) scaled per-instance bounds
    U_b: jax.Array,  # (m, B)
    scal: core.Scaling,  # shared
    settings: core.Settings,
    rho0: jax.Array,  # scalar
    Minv: jax.Array,  # (n, n)
    M: jax.Array,  # (n, n)
    rho_vec: jax.Array,  # (m,)
    X0: jax.Array,  # (n, B)
    Z0: jax.Array,
    Y0: jax.Array,
):
    fused = _fused_epoch_mode(Q.dtype, Q.shape[0], A.shape[0], Q.shape[1])
    return _shared_solve_impl(
        P, A, Q, L_b, U_b, scal, settings, rho0, Minv, M, rho_vec,
        X0, Z0, Y0, fused=fused, iter_prec=_iter_precision_mode(),
        compact=os.environ.get('OSQP_TPU_COMPACT', 'auto'),
    )


@functools.partial(jax.jit, static_argnames=('fused', 'iter_prec', 'compact'))
def _shared_solve_impl(
    P, A, Q, L_b, U_b, scal, settings, rho0, Minv, M, rho_vec,
    X0, Z0, Y0, *, fused, iter_prec='highest', compact='auto',
):
    n0, B0 = Q.shape
    m0 = A.shape[0]
    dtype = Q.dtype
    if fused is not None:
        # Pad once per solve (features to sublane multiples, batch to lane
        # multiples) so every epoch runs the Pallas kernel without repacking.
        # Padded columns have Q=L=U=X=Z=Y=0: they stay identically zero
        # through the iteration, register as solved at the first termination
        # check, and are sliced away before returning.
        n = _round_up(n0, 8)
        m = _round_up(m0, 8)
        B = _round_up(B0, 128)
        P = _pad2(P, n, n)
        A = _pad2(A, m, n)
        Q = _pad2(Q, n, B)
        L_b = _pad2(L_b, m, B)
        U_b = _pad2(U_b, m, B)
        Minv = _pad2(Minv, n, n)
        M = _pad2(M, n, n)
        rho_vec = _pad1(rho_vec, m)
        X0 = _pad2(X0, n, B)
        Z0 = _pad2(Z0, m, B)
        Y0 = _pad2(Y0, m, B)
        scal = core.Scaling(
            D=_pad1(scal.D, n, 1.0), Dinv=_pad1(scal.Dinv, n, 1.0),
            E=_pad1(scal.E, m, 1.0), Einv=_pad1(scal.Einv, m, 1.0),
            c=scal.c, cinv=scal.cinv,
        )
    else:
        n, m, B = n0, m0, B0
    At = A.T
    sigma = settings.sigma
    alpha = settings.alpha

    ct = settings.check_termination
    epoch_len = jnp.where(ct > 0, ct, settings.iter_cap).astype(jnp.int32)
    epochs_per_adapt = jnp.maximum(
        (settings.adaptive_rho_interval + epoch_len - 1) // jnp.maximum(epoch_len, 1), 1
    )

    mm = functools.partial(jnp.matmul, preferred_element_type=dtype)

    rho_inv0 = jnp.where(rho_vec > 0, 1.0 / rho_vec, 0.0)
    F0, c00 = _build_affine(
        A, A.T, Minv, M, rho_vec, rho_inv0, sigma, alpha, Q, mm, dtype
    )
    CH = jnp.concatenate([P, A], axis=0)  # (n+m, n) stacked residual operator

    st = SharedState(
        it=jnp.int32(0),
        S=jnp.concatenate([X0, Z0, Y0], axis=0),
        dX=jnp.zeros((n, B), dtype), dY=jnp.zeros((m, B), dtype),
        rho=rho0, rho_vec=rho_vec, rho_inv=rho_inv0,
        Minv=Minv, M=M, F=F0, c0=c00,
        status=jnp.full((B,), _UNSOLVED, jnp.int32),
        iters_done=jnp.zeros((B,), jnp.int32),
        rho_updates=jnp.int32(0),
        fS=jnp.concatenate([X0, Z0, Y0], axis=0),
        fdX=jnp.zeros((n, B), dtype), fdY=jnp.zeros((m, B), dtype),
        pri_res=jnp.full((B,), jnp.inf, dtype),
        dua_res=jnp.full((B,), jnp.inf, dtype),
        obj_val=jnp.full((B,), jnp.nan, dtype),
        dual_obj_val=jnp.full((B,), jnp.nan, dtype),
    )

    codes = dict(
        solved=int(SolverStatus.OSQP_SOLVED),
        pinf=_PRIM_INF, dinf=_DUAL_INF,
        unsolved=_UNSOLVED, noncvx=int(SolverStatus.OSQP_NON_CVX),
    )
    # shared constraint typing from the FIRST instance's bound pattern (see
    # module docstring) — captured before any compaction so both loop phases
    # type identically
    l0, u0 = L_b[:, 0], U_b[:, 0]

    def make_loop(Qc, Lc, Uc, B_real, valid=None):
        """Build the epoch-loop (cond, body, check) over a column set.

        Per-column math is independent of which other columns share the
        buffer, so running the still-active tail in a compacted (narrower)
        buffer is exact — same per-instance trajectories, statuses and
        iteration counts as the full-width loop.  ``valid`` (bool (B_real,),
        optional) marks the columns that are REAL instances; duplicate fill
        columns (see the compaction gather below) are excluded from the
        adaptive-rho median so the compacted loop adapts rho over exactly
        the same instance set as the full-width loop would.
        """

        def iteration(F, c0, rvec, rinv, carry):
            """Affine-form ADMM iteration (same math as the Pallas kernel;
            see _build_affine)."""
            S, dX, dY = carry
            X = S[:n]
            Y = S[n + m:]
            V = jnp.matmul(F, S, preferred_element_type=dtype,
                           precision=_PRECISIONS.get(iter_prec)) + c0
            Xt = V[:n]
            Pz = V[n:]
            Zn = jnp.clip(Pz, Lc, Uc)
            Yn = Y + rvec[:, None] * (Pz - rinv[:, None] * Y - Zn)
            Xn = alpha * Xt + (1 - alpha) * X
            Sn = jnp.concatenate([Xn, Zn, Yn], axis=0)
            return Sn, Xn - X, Yn - Y

        def check(S, dX, dY, approximate):
            return _batch_check_shared(
                P, A, Qc, Lc, Uc, scal, settings,
                S[:n], S[n:n + m], S[n + m:], dX, dY,
                jnp.asarray(approximate), mm,
            )

        def cond(st: SharedState):
            return (st.it < settings.iter_cap) & jnp.any(st.status == _UNSOLVED)

        def body(st: SharedState):
            this_epoch = jnp.minimum(epoch_len, settings.iter_cap - st.it)
            it = st.it + this_epoch
            active = st.status == _UNSOLVED
            if fused is not None:
                # One kernel launch: epoch + merge + termination check +
                # capture, all (feature, B) traffic stays in VMEM.
                (S, dX, dY, fS, fdX, fdY,
                 status_new, pri, dua, obj, dobj) = shared_body_pallas(
                    st.F, CH, At, st.rho_vec, st.rho_inv,
                    scal.D, scal.Dinv, scal.E, scal.Einv,
                    st.c0, Qc, Lc, Uc, st.S, st.dX, st.dY,
                    st.fS, st.fdX, st.fdY, st.status,
                    settings, scal.c, scal.cinv, codes, this_epoch,
                    interpret=(fused == 'interpret'),
                    iter_mode=iter_prec,
                )
                st = st._replace(
                    it=it, S=S, dX=dX, dY=dY, fS=fS, fdX=fdX, fdY=fdY,
                    status=status_new,
                    iters_done=jnp.where(active, it, st.iters_done),
                    pri_res=jnp.where(active, pri, st.pri_res),
                    dua_res=jnp.where(active, dua, st.dua_res),
                    obj_val=jnp.where(active, obj, st.obj_val),
                    dual_obj_val=jnp.where(active, dobj, st.dual_obj_val),
                )
            else:
                F, c0, rvec, rinv = st.F, st.c0, st.rho_vec, st.rho_inv
                carry = lax.fori_loop(
                    0, this_epoch,
                    lambda k, c: iteration(F, c0, rvec, rinv, c),
                    (st.S, st.dX, st.dY),
                )
                S, dX, dY = carry
                st = st._replace(
                    it=it,
                    S=jnp.where(active[None], S, st.S),
                    dX=jnp.where(active[None], dX, st.dX),
                    dY=jnp.where(active[None], dY, st.dY),
                )

                status_new, pri, dua, obj, dobj = check(st.S, st.dX, st.dY, False)
                newly = active & (status_new != _UNSOLVED)
                st = st._replace(
                    status=jnp.where(newly, status_new, st.status),
                    iters_done=jnp.where(active, it, st.iters_done),
                    pri_res=jnp.where(active, pri, st.pri_res),
                    dua_res=jnp.where(active, dua, st.dua_res),
                    obj_val=jnp.where(active, obj, st.obj_val),
                    dual_obj_val=jnp.where(active, dobj, st.dual_obj_val),
                    fS=jnp.where(newly[None], st.S, st.fS),
                    fdX=jnp.where(newly[None], st.dX, st.fdX),
                    fdY=jnp.where(newly[None], st.dY, st.fdY),
                )

            epoch_idx = (it + epoch_len - 1) // jnp.maximum(epoch_len, 1)
            do_adapt = (
                settings.adaptive_rho
                & (settings.adaptive_rho_interval > 0)
                & (epoch_idx % epochs_per_adapt == 0)
                & jnp.any(st.status == _UNSOLVED)
            )

            def adapt(st: SharedState):
                # batch rho estimate over still-active instances, as 2 stacked
                # matmuls + columnwise reductions (the vmapped per-instance
                # core.rho_estimate_fn lowers ~13x slower; exact equivalence
                # is pinned by test_rho_estimate_equivalence).  Real columns
                # only: padded columns would bias the median.
                ests = _batch_rho_estimate(
                    CH, At, n, Qc[:, :B_real], st.S[:n, :B_real],
                    st.S[n:n + m, :B_real], st.S[n + m:, :B_real], st.rho, mm,
                )
                still = st.status[:B_real] == _UNSOLVED
                if valid is not None:
                    still &= valid
                # masked median over still-ACTIVE instances (solved instances
                # no longer inform the step-size balance; also keeps the
                # estimate invariant under tail compaction)
                cnt = jnp.sum(still)
                vals = jnp.sort(jnp.where(still, ests, jnp.inf))
                med_lo = vals[jnp.maximum(cnt - 1, 0) // 2]
                med_hi = vals[jnp.minimum(cnt // 2, vals.shape[0] - 1)]
                rho_new = jnp.where(cnt > 0, 0.5 * (med_lo + med_hi), st.rho)
                tolr = settings.adaptive_rho_tolerance
                trig = (rho_new > tolr * st.rho) | (rho_new < st.rho / tolr)

                def do(st):
                    types = core.constraint_types(l0, u0)
                    vec = core.rho_vec_from_types(types, rho_new, settings.rho_is_vec)
                    fac = core.factorize(P, A, sigma, vec, 'inv')
                    rinv = jnp.where(vec > 0, 1.0 / vec, 0.0)
                    F_new, c0_new = _build_affine(
                        A, At, fac.Minv, fac.L, vec, rinv, sigma, alpha, Qc, mm, dtype
                    )
                    return st._replace(
                        rho=jnp.clip(rho_new, 1e-6, 1e6),
                        rho_vec=vec,
                        rho_inv=rinv,
                        Minv=fac.Minv,
                        M=fac.L,
                        F=F_new,
                        c0=c0_new,
                        rho_updates=st.rho_updates + 1,
                    )

                return lax.cond(trig, do, lambda s: s, st)

            st = lax.cond(do_adapt, adapt, lambda s: s, st)
            return st

        return cond, body, check

    cond_full, body_full, check = make_loop(Q, L_b, U_b, B0)

    # Straggler compaction: once the active tail fits a narrow buffer, gather
    # it and finish there — the slowest instance no longer forces full-batch
    # epochs.  Exact (see make_loop docstring); worth ~2-4x on cold batches
    # whose max iteration count is ~5x the mean.
    # ``OSQP_TPU_COMPACT``: 'auto' (default; on when the batch is at least
    # 4x the tail buffer), '0' (off) — the equivalence tests force both.
    tail_width = max(128, _round_up(B0 // 16, 128))
    do_compact = B0 >= 4 * tail_width and m > 0 and compact != '0'

    if do_compact:
        thr = jnp.int32(tail_width)
        st = lax.while_loop(
            lambda s: cond_full(s) & (jnp.sum(s.status == _UNSOLVED) > thr),
            body_full, st,
        )
        # gather still-active columns (fill duplicates column 0 — its values
        # are recomputed identically and scattered back unchanged; the fills
        # are masked out of the adaptive-rho median via ``valid`` so a
        # still-active column 0 cannot bias the estimate)
        cnt_active = jnp.sum(st.status == _UNSOLVED)
        idx = jnp.nonzero(st.status == _UNSOLVED, size=tail_width, fill_value=0)[0]
        valid = jnp.arange(tail_width) < cnt_active

        def g2(V):
            return V[:, idx]

        stc = st._replace(
            S=g2(st.S), dX=g2(st.dX), dY=g2(st.dY),
            fS=g2(st.fS), fdX=g2(st.fdX), fdY=g2(st.fdY), c0=g2(st.c0),
            status=st.status[idx], iters_done=st.iters_done[idx],
            pri_res=st.pri_res[idx], dua_res=st.dua_res[idx],
            obj_val=st.obj_val[idx], dual_obj_val=st.dual_obj_val[idx],
        )
        cond_t, body_t, _ = make_loop(g2(Q), g2(L_b), g2(U_b), tail_width, valid)
        stc = lax.while_loop(cond_t, body_t, stc)

        def s2(V, Vc):
            return V.at[:, idx].set(Vc)

        st = st._replace(
            S=s2(st.S, stc.S), dX=s2(st.dX, stc.dX), dY=s2(st.dY, stc.dY),
            fS=s2(st.fS, stc.fS), fdX=s2(st.fdX, stc.fdX), fdY=s2(st.fdY, stc.fdY),
            status=st.status.at[idx].set(stc.status),
            iters_done=st.iters_done.at[idx].set(stc.iters_done),
            pri_res=st.pri_res.at[idx].set(stc.pri_res),
            dua_res=st.dua_res.at[idx].set(stc.dua_res),
            obj_val=st.obj_val.at[idx].set(stc.obj_val),
            dual_obj_val=st.dual_obj_val.at[idx].set(stc.dual_obj_val),
            it=stc.it, rho=stc.rho, rho_vec=stc.rho_vec, rho_inv=stc.rho_inv,
            Minv=stc.Minv, M=stc.M, rho_updates=stc.rho_updates,
        )
    else:
        st = lax.while_loop(cond_full, body_full, st)

    # post-loop max-iter handling
    active = st.status == _UNSOLVED
    status_ex, pri_ex, dua_ex, obj_ex, dobj_ex = check(st.S, st.dX, st.dY, False)
    status_ap, _, _, obj_ap, _ = check(st.S, st.dX, st.dY, True)
    status_fin = jnp.where(
        status_ex != _UNSOLVED,
        status_ex,
        jnp.where(status_ap != _UNSOLVED, status_ap, _MAX_ITER),
    ).astype(jnp.int32)
    st = st._replace(
        status=jnp.where(active, status_fin, st.status),
        iters_done=jnp.where(active, st.it, st.iters_done),
        pri_res=jnp.where(active, pri_ex, st.pri_res),
        dua_res=jnp.where(active, dua_ex, st.dua_res),
        obj_val=jnp.where(active, jnp.where(status_ex != _UNSOLVED, obj_ex, obj_ap), st.obj_val),
        dual_obj_val=jnp.where(active, dobj_ex, st.dual_obj_val),
        fS=jnp.where(active[None], st.S, st.fS),
        fdX=jnp.where(active[None], st.dX, st.fdX),
        fdY=jnp.where(active[None], st.dY, st.fdY),
    )

    infeasible = jnp.isin(
        st.status, jnp.array([_PRIM_INF, _PRIM_INF_INACC, _DUAL_INF, _DUAL_INF_INACC])
    )
    unscaled = ~settings.scaled_termination
    fX = st.fS[:n]
    fY = st.fS[n + m:]
    X_out = jnp.where(infeasible[None], jnp.nan, scal.D[:, None] * fX)
    Y_out = jnp.where(infeasible[None], jnp.nan, scal.cinv * (scal.E[:, None] * fY))
    prim_cert = jnp.where(unscaled, scal.E[:, None] * st.fdY, st.fdY)
    dual_cert = jnp.where(unscaled, scal.D[:, None] * st.fdX, st.fdX)

    return dict(
        x=X_out[:n0, :B0].T, y=Y_out[:m0, :B0].T,
        prim_inf_cert=prim_cert[:m0, :B0].T, dual_inf_cert=dual_cert[:n0, :B0].T,
        status=st.status[:B0], iters=st.iters_done[:B0],
        pri_res=st.pri_res[:B0], dua_res=st.dua_res[:B0],
        obj_val=st.obj_val[:B0], dual_obj_val=st.dual_obj_val[:B0],
        rho=st.rho, rho_vec=st.rho_vec[:m0],
        Minv=st.Minv[:n0, :n0], M=st.M[:n0, :n0],
        rho_updates=st.rho_updates,
        X=st.S[:n0, :B0], Z=st.S[n:n + m0, :B0], Y=st.S[n + m:n + m + m0, :B0],
    )


def shared_mpc_rollout(P, A, Q0, L_b, U_b, scal, settings, rho0, Minv, M, rho_vec,
                       q_seq, steps: int = None):
    """Scan of warm MPC steps on the shared path.  q_seq: (S, n, B) of
    UNSCALED per-step cost vectors.  Mode env vars (iteration precision,
    fused kernel, compaction) are read here, outside the jit cache, so a
    sweep within one process retraces correctly."""
    fused = _fused_epoch_mode(Q0.dtype, Q0.shape[0], A.shape[0], Q0.shape[1])
    return _shared_mpc_rollout_impl(
        P, A, Q0, L_b, U_b, scal, settings, rho0, Minv, M, rho_vec, q_seq,
        fused=fused, iter_prec=_iter_precision_mode(),
        compact=os.environ.get('OSQP_TPU_COMPACT', 'auto'),
    )


@functools.partial(jax.jit, static_argnames=('fused', 'iter_prec', 'compact'))
def _shared_mpc_rollout_impl(P, A, Q0, L_b, U_b, scal, settings, rho0, Minv, M,
                             rho_vec, q_seq, *, fused, iter_prec, compact):
    n, B = Q0.shape
    m = A.shape[0]
    dtype = Q0.dtype

    def step(carry, q_new):
        X, Z, Y, rho, Minv_c, M_c, rho_vec_c = carry
        Qs = settings_scale_q(scal, q_new)
        out = _shared_solve_impl(
            P, A, Qs, L_b, U_b, scal, settings, rho, Minv_c, M_c,
            rho_vec_c, X, Z, Y, fused=fused, iter_prec=iter_prec,
            compact=compact,
        )
        carry = (out['X'], out['Z'], out['Y'], out['rho'], out['Minv'], out['M'],
                 out['rho_vec'])
        return carry, (out['x'], out['iters'], out['status'])

    X0 = jnp.zeros((n, B), dtype)
    Z0 = jnp.zeros((m, B), dtype)
    Y0 = jnp.zeros((m, B), dtype)
    carry, ys = jax.lax.scan(step, (X0, Z0, Y0, rho0, Minv, M, rho_vec), q_seq)
    return carry, ys


def settings_scale_q(scal: core.Scaling, q_new):
    return scal.c * (scal.D[:, None] * q_new)


def shared_setup(P, A, q_b, l_b, u_b, settings_host, dtype=jnp.float32):
    """Host-side setup for the shared path.  P (n,n), A (m,n) shared numpy;
    q_b (B,n), l_b/u_b (B,m) per instance.  Returns all device arrays needed
    by shared_solve (feature-first layouts)."""
    import scipy.sparse as sp

    n = P.shape[0]
    m = A.shape[0]
    P_full = np.asarray(sp.csc_matrix(P).todense(), np.float64)
    P_full = np.triu(P_full) + np.triu(P_full, 1).T
    A_d = np.asarray(sp.csc_matrix(A).todense(), np.float64)
    q_b = np.asarray(q_b, np.float64)
    l_b = np.maximum(np.asarray(l_b, np.float64), -1e30)
    u_b = np.minimum(np.asarray(u_b, np.float64), 1e30)
    B = q_b.shape[0]

    # shared Ruiz from P/A with the batch-mean |q| as cost proxy
    q_repr = np.mean(np.abs(q_b), axis=0)

    ruiz_dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    rho0 = jnp.asarray(min(max(settings_host.rho, 1e-6), 1e6), dtype)
    # ONE jitted program for Ruiz + typing + factorization: every extra
    # program (and every eager op) pays a dispatch/compile roundtrip on
    # remote-tunnel backends — measured as minutes of setup variance on axon
    P_s, A_s, scal, rho_vec, Minv, M_out = _shared_setup_device(
        jnp.asarray(P_full, ruiz_dt),
        jnp.asarray(q_repr, ruiz_dt),
        jnp.asarray(A_d, ruiz_dt),
        jnp.asarray(l_b[0], ruiz_dt),
        jnp.asarray(u_b[0], ruiz_dt),
        rho0,
        jnp.asarray(bool(settings_host.rho_is_vec)),
        jnp.asarray(settings_host.sigma, dtype),
        scaling_iters=int(settings_host.scaling),
        out_dtype=dtype,
    )
    D = np.asarray(scal.D, np.float64)
    E = np.asarray(scal.E, np.float64)
    c = float(scal.c)

    scal_t = core.Scaling(
        D=jnp.asarray(D, dtype), Dinv=jnp.asarray(1.0 / D, dtype),
        E=jnp.asarray(E, dtype), Einv=jnp.asarray(1.0 / E if m else E, dtype),
        c=jnp.asarray(c, dtype), cinv=jnp.asarray(1.0 / c, dtype),
    )
    Q = jnp.asarray(c * (D[None] * q_b).T, dtype)  # (n, B)
    L_t = jnp.asarray((E[None] * l_b).T, dtype)
    U_t = jnp.asarray((E[None] * u_b).T, dtype)

    return P_s, A_s, Q, L_t, U_t, scal_t, rho0, Minv, M_out, rho_vec


@functools.partial(jax.jit, static_argnames=('scaling_iters', 'out_dtype'))
def _shared_setup_device(P_full, q_repr, A_d, l0, u0, rho0, rho_is_vec, sigma,
                         *, scaling_iters, out_dtype):
    data, scal = core.ruiz_scale(
        P_full, q_repr, A_d, jnp.zeros_like(l0), jnp.zeros_like(u0),
        scaling_iters,
    )
    P_s = data.P.astype(out_dtype)
    A_s = data.A.astype(out_dtype)
    l0s = (scal.E * l0).astype(out_dtype)
    u0s = (scal.E * u0).astype(out_dtype)
    types = core.constraint_types(l0s, u0s)
    rho_vec = core.rho_vec_from_types(types, rho0, rho_is_vec)
    fac = core.factorize(P_s, A_s, sigma, rho_vec, 'inv')
    return P_s, A_s, scal, rho_vec, fac.Minv, fac.L
