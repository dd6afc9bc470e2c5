"""Multi-chip QP solving over a jax.sharding.Mesh (dp x mp).

The reference has **no** distributed runtime (SURVEY.md section 2: its entire
parallelism story is a CUDA backend + GIL-release threads).  This module is
the TPU-native scale-out design:

* **dp axis** - independent QP instances sharded across devices (the batched
  MPC/scenario workload).  Embarrassingly parallel; collectives only inside
  each instance's mp group.
* **mp axis** - one QP's constraint rows split across devices (row-consensus
  ADMM).  Each device owns a row block of A and the matching slices of
  l, u, z, y, rho; x (and P, q) are replicated.  Per ADMM iteration the
  normal-equations rhs needs ONE ``psum`` (of ``A_loc' rho b2_loc``) over
  ICI; the Schur operator ``M = P + sigma I + sum_s A_s' rho_s A_s`` is
  assembled with a ``psum`` at (re)factorization; residual inf-norms reduce
  with ``pmax``.

**Algorithm parity.**  The math is the FULL single-device algorithm of
``osqp_tpu.solver.core`` (itself re-derived from the reference spec
/root/reference/src/osqppurepy/_osqp.py) - every formula is mirrored with a
collective at each m-axis reduction point, so iteration counts match the
float64 oracle exactly at default settings:

* in-trace Ruiz equilibration (column norms ``pmax``-reduced over the row
  shards; ref _osqp.py:389-497),
* constraint typing + vector rho (local; ref :499-524),
* adaptive rho with in-loop distributed refactorization (ref :880-930),
* unscaled-residual termination incl. the duality-gap criterion
  (sup terms ``psum``-reduced; ref :998-1077),
* primal/dual infeasibility certificates from the carried deltas
  (ref :796-878), 10x-inaccurate fallback at max_iter (ref :1018-1022),
* optional active-set polish via the masked reduced KKT (ref :1710-1828),
* warm starting (x0/y0 scaled in-trace like ref :1493-1545).

Both axes compose: ``dp_mp_solve`` shard_maps a vmapped row-sharded solver
over a 2-D mesh.  This is the "full training step" analogue the multi-chip
dryrun exercises (``__graft_entry__.dryrun_multichip``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import ADAPTIVE_RHO_FIXED, OSQP_INFTY, MIN_SCALING, RHO_MIN, RHO_MAX
from ..solver import core
from ..solver.core import (
    RhoState,
    _SOLVED,
    _SOLVED_INACC,
    _PRIM_INF,
    _PRIM_INF_INACC,
    _DUAL_INF,
    _DUAL_INF_INACC,
    _MAX_ITER,
    _NON_CVX,
    _UNSOLVED,
    _limit_scaling,
    rho_vec_from_types,
)


class ShardedResult(NamedTuple):
    """Batch-leading global arrays (unscaled problem space)."""

    x: jax.Array  # (B, n) primal (NaN rows when infeasible)
    y: jax.Array  # (B, m) dual (NaN rows when infeasible)
    z: jax.Array  # (B, m) primal slack iterate
    status: jax.Array  # (B,) int32 SolverStatus values
    iters: jax.Array  # (B,)
    pri_res: jax.Array  # (B,)
    dua_res: jax.Array  # (B,)
    obj_val: jax.Array  # (B,)
    dual_obj_val: jax.Array  # (B,)
    rho: jax.Array  # (B,) final rho setting value
    rho_updates: jax.Array  # (B,)
    prim_inf_cert: jax.Array  # (B, m) unscaled delta_y certificate
    dual_inf_cert: jax.Array  # (B, n) unscaled delta_x certificate
    status_polish: jax.Array  # (B,) 1 accepted / -1 rejected / 0 not attempted


class ShardedSettings(NamedTuple):
    """Traced scalars (one compile serves all values)."""

    sigma: jax.Array
    alpha: jax.Array
    eps_abs: jax.Array
    eps_rel: jax.Array
    eps_prim_inf: jax.Array
    eps_dual_inf: jax.Array
    max_iter: jax.Array  # int32
    check_termination: jax.Array  # int32 (0 = only at max_iter)
    scaled_termination: jax.Array  # bool
    check_dualgap: jax.Array  # bool
    adaptive_rho: jax.Array  # bool
    adaptive_rho_interval: jax.Array  # int32 (effective, host-resolved)
    adaptive_rho_tolerance: jax.Array
    rho_is_vec: jax.Array  # bool
    rho: jax.Array  # initial rho
    n_scaling: jax.Array  # int32 Ruiz iterations (0 = off)
    delta: jax.Array  # polish regularization
    polish_refine_iter: jax.Array  # int32


class _Scal(NamedTuple):
    """Row-sharded scaling state: D/Dinv replicated, E/Einv local slices."""

    D: jax.Array
    Dinv: jax.Array
    E: jax.Array
    Einv: jax.Array
    c: jax.Array
    cinv: jax.Array


def _inf(v):
    return jnp.max(jnp.abs(v), initial=jnp.zeros((), v.dtype))


def _pmax_inf(v, axis):
    return lax.pmax(_inf(v), axis)


# ---------------------------------------------------------------------------
# Ruiz equilibration, distributed (mirror of core.ruiz_scale / ref
# _osqp.py:389-497): column inf-norms of the row-sharded A pmax-reduce over
# the mp axis; row norms and E stay local.
# ---------------------------------------------------------------------------


def _ruiz_scale_sh(P_mat, q, A_loc, l_loc, u_loc, n_iters, axis):
    n = P_mat.shape[0]
    m_loc = A_loc.shape[0]
    dtype = P_mat.dtype

    def body(_, carry):
        P_mat, q, A, l, u, D, E, c = carry
        norm_P_col = jnp.max(jnp.abs(P_mat), axis=0)
        norm_A_col = lax.pmax(jnp.max(jnp.abs(A), axis=0), axis)
        norm_A_row = jnp.max(jnp.abs(A), axis=1)
        d = 1.0 / jnp.sqrt(_limit_scaling(jnp.maximum(norm_P_col, norm_A_col)))
        e = 1.0 / jnp.sqrt(_limit_scaling(norm_A_row))

        P_mat = d[:, None] * P_mat * d[None, :]
        A = e[:, None] * A * d[None, :]
        q = d * q
        l = e * l
        u = e * u
        D = D * d
        E = E * e

        # cost normalization (ref _osqp.py:443-468); P is replicated so the
        # column-mean needs no collective
        norm_P_cols_mean = jnp.mean(jnp.max(jnp.abs(P_mat), axis=0))
        inf_norm_q = _limit_scaling(_inf(q))
        scale_cost = 1.0 / _limit_scaling(jnp.maximum(inf_norm_q, norm_P_cols_mean))
        P_mat = scale_cost * P_mat
        q = scale_cost * q
        c = scale_cost * c
        return (P_mat, q, A, l, u, D, E, c)

    D0 = jnp.ones((n,), dtype)
    E0 = jnp.ones((m_loc,), dtype)
    c0 = jnp.ones((), dtype)
    P_mat, q, A_loc, l_loc, u_loc, D, E, c = lax.fori_loop(
        0, n_iters, body, (P_mat, q, A_loc, l_loc, u_loc, D0, E0, c0)
    )
    scal = _Scal(D=D, Dinv=1.0 / D, E=E, Einv=1.0 / E, c=c, cinv=1.0 / c)
    return P_mat, q, A_loc, l_loc, u_loc, scal


# ---------------------------------------------------------------------------
# KKT operator (mirror of core.build_M/factorize): one psum of the local
# Gram block at (re)factorization time
# ---------------------------------------------------------------------------


def _factorize_sh(P_mat, A_loc, sigma, rho_loc, axis):
    n = P_mat.shape[0]
    M_local = A_loc.T @ (rho_loc[:, None] * A_loc)
    M = P_mat + sigma * jnp.eye(n, dtype=P_mat.dtype) + lax.psum(M_local, axis)
    return jnp.linalg.cholesky(M)


def _cho_solve(L, b):
    t = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, t, lower=False)


# ---------------------------------------------------------------------------
# Residuals / termination (mirror of core.compute_info /
# core.termination_status; ref _osqp.py:705-878, 998-1077)
# ---------------------------------------------------------------------------


def _compute_info_sh(P_mat, q, A_loc, l_loc, u_loc, scal, x, z, y,
                     eps_abs, eps_rel, scaled_termination, check_dualgap, axis):
    dtype = x.dtype
    unscaled = ~scaled_termination
    Px = P_mat @ x
    Ax = A_loc @ x
    Aty = lax.psum(A_loc.T @ y, axis)

    # primal residual (ref _osqp.py:714-726)
    pri_vec = Ax - z
    pri_res = jnp.where(
        unscaled, _pmax_inf(scal.Einv * pri_vec, axis), _pmax_inf(pri_vec, axis)
    )

    # dual residual (ref _osqp.py:753-764); Aty is replicated after the psum
    dua_vec = Px + q + Aty
    dua_res = jnp.where(
        unscaled, scal.cinv * _inf(scal.Dinv * dua_vec), _inf(dua_vec)
    )

    # objective (ref _osqp.py:705-712)
    quad = 0.5 * (x @ Px)
    obj_val = (quad + q @ x) * scal.cinv

    # unscaled dual objective (mirror of core.compute_info): sup terms are
    # per-row -> local sums psum-reduced
    y_u = scal.cinv * (scal.E * y)
    y_tol = jnp.finfo(dtype).eps * _pmax_inf(y_u, axis)
    y_u = jnp.where(jnp.abs(y_u) > y_tol, y_u, 0.0)
    l_u = scal.Einv * l_loc
    u_u = scal.Einv * u_loc
    sup_pos = jnp.where(u_u < OSQP_INFTY * MIN_SCALING, u_u * jnp.maximum(y_u, 0), 0.0)
    sup_neg = jnp.where(l_u > -OSQP_INFTY * MIN_SCALING, l_u * jnp.minimum(y_u, 0), 0.0)
    sup = lax.psum(jnp.sum(sup_pos) + jnp.sum(sup_neg), axis)
    sup_mag = lax.psum(jnp.sum(jnp.abs(sup_pos)) + jnp.sum(jnp.abs(sup_neg)), axis)
    dual_obj_val = -quad * scal.cinv - sup
    gap_noise = jnp.finfo(dtype).eps * (
        sup_mag + jnp.abs(quad * scal.cinv) + jnp.abs(q @ x) * scal.cinv
    )

    # negative curvature -> non-convex flag via exploding residual
    noncvx = quad * scal.cinv < -1e-12 * jnp.maximum(1.0, x @ x)
    pri_res = jnp.where(noncvx, 2 * OSQP_INFTY, pri_res)

    # tolerances (ref _osqp.py:728-751, 766-794)
    Ax_t = jnp.where(unscaled, _pmax_inf(scal.Einv * Ax, axis), _pmax_inf(Ax, axis))
    z_t = jnp.where(unscaled, _pmax_inf(scal.Einv * z, axis), _pmax_inf(z, axis))
    eps_pri = eps_abs + eps_rel * jnp.maximum(Ax_t, z_t)

    def _d(v):
        return jnp.where(unscaled, _inf(scal.Dinv * v), _inf(v))

    scale_d = jnp.where(unscaled, scal.cinv, jnp.ones((), dtype))
    max_rel_dua = scale_d * jnp.maximum(jnp.maximum(_d(Aty), _d(Px)), _d(q))
    eps_dua = eps_abs + eps_rel * max_rel_dua

    return pri_res, dua_res, obj_val, dual_obj_val, eps_pri, eps_dua, gap_noise


def _primal_infeasible_sh(q, A_loc, l_loc, u_loc, scal, dy, eps_pinf,
                          unscaled, axis):
    """(mirror of core.primal_infeasibility; ref _osqp.py:796-820)"""
    norm_dy = jnp.where(
        unscaled, _pmax_inf(scal.E * dy, axis), _pmax_inf(dy, axis)
    )
    lhs = lax.psum(
        u_loc @ jnp.maximum(dy, 0) + l_loc @ jnp.minimum(dy, 0), axis
    )
    At_dy = lax.psum(A_loc.T @ dy, axis)
    At_dy_n = jnp.where(unscaled, _inf(scal.Dinv * At_dy), _inf(At_dy))
    return (
        (norm_dy > eps_pinf)
        & (lhs < -eps_pinf * norm_dy)
        & (At_dy_n < eps_pinf * norm_dy)
    )


def _dual_infeasible_sh(P_mat, q, A_loc, l_loc, u_loc, scal, dx, eps_dinf,
                        unscaled, axis):
    """(mirror of core.dual_infeasibility; ref _osqp.py:822-878)"""
    dtype = dx.dtype
    norm_dx = jnp.where(unscaled, _inf(scal.D * dx), _inf(dx))
    cost_scale = jnp.where(unscaled, scal.c, jnp.ones((), dtype))
    ok = norm_dx > eps_dinf
    ok &= (q @ dx) < -cost_scale * eps_dinf * norm_dx
    P_dx = P_mat @ dx
    P_dx_n = jnp.where(unscaled, _inf(scal.Dinv * P_dx), _inf(P_dx))
    ok &= P_dx_n < cost_scale * eps_dinf * norm_dx
    A_dx = A_loc @ dx
    A_dx = jnp.where(unscaled, scal.Einv * A_dx, A_dx)
    u_fin = u_loc < OSQP_INFTY * MIN_SCALING
    l_fin = l_loc > -OSQP_INFTY * MIN_SCALING
    bad = (u_fin & (A_dx > eps_dinf * norm_dx)) | (l_fin & (A_dx < -eps_dinf * norm_dx))
    bad_any = lax.pmax(jnp.max(jnp.where(bad, 1, 0), initial=0), axis) > 0
    return ok & ~bad_any


def _termination_status_sh(P_mat, q, A_loc, l_loc, u_loc, scal, st, stg,
                           approximate, axis):
    """(mirror of core.termination_status)"""
    factor = 10.0 if approximate else 1.0
    eps_abs = stg.eps_abs * factor
    eps_rel = stg.eps_rel * factor
    eps_pinf = stg.eps_prim_inf * factor
    eps_dinf = stg.eps_dual_inf * factor
    unscaled = ~stg.scaled_termination

    pri_res, dua_res, obj_val, dual_obj, eps_pri, eps_dua, gap_noise = (
        _compute_info_sh(
            P_mat, q, A_loc, l_loc, u_loc, scal, st.x, st.z, st.y,
            eps_abs, eps_rel, stg.scaled_termination, stg.check_dualgap, axis,
        )
    )

    noncvx = (pri_res > OSQP_INFTY) | (dua_res > OSQP_INFTY)
    pri_check = pri_res < eps_pri
    dua_check = dua_res < eps_dua
    gap = obj_val - dual_obj
    eps_gap = (
        eps_abs
        + eps_rel * jnp.maximum(jnp.abs(obj_val), jnp.abs(dual_obj))
        + 10.0 * gap_noise
    )
    gap_ok = (~stg.check_dualgap) | (jnp.isfinite(gap) & (jnp.abs(gap) < eps_gap))
    pinf = jnp.where(
        pri_check, False,
        _primal_infeasible_sh(q, A_loc, l_loc, u_loc, scal, st.delta_y,
                              eps_pinf, unscaled, axis),
    )
    dinf = jnp.where(
        dua_check, False,
        _dual_infeasible_sh(P_mat, q, A_loc, l_loc, u_loc, scal, st.delta_x,
                            eps_dinf, unscaled, axis),
    )

    solved_code = _SOLVED_INACC if approximate else _SOLVED
    pinf_code = _PRIM_INF_INACC if approximate else _PRIM_INF
    dinf_code = _DUAL_INF_INACC if approximate else _DUAL_INF

    status = jnp.where(
        noncvx,
        _NON_CVX,
        jnp.where(
            pri_check & dua_check & gap_ok,
            solved_code,
            jnp.where(pinf, pinf_code, jnp.where(dinf, dinf_code, _UNSOLVED)),
        ),
    ).astype(jnp.int32)

    obj_val = jnp.where(
        status == _NON_CVX,
        jnp.nan,
        jnp.where(
            status == pinf_code,
            OSQP_INFTY,
            jnp.where(status == dinf_code, -OSQP_INFTY, obj_val),
        ),
    )
    return status, pri_res, dua_res, obj_val, dual_obj


# ---------------------------------------------------------------------------
# ADMM step + adaptive rho (mirrors of core.admm_iteration / core.adapt_rho)
# ---------------------------------------------------------------------------


class _LoopState(NamedTuple):
    it: jax.Array
    status: jax.Array
    x: jax.Array
    z: jax.Array
    y: jax.Array
    delta_x: jax.Array
    delta_y: jax.Array
    rho: RhoState
    L: jax.Array  # replicated Cholesky factor of the psum'd Schur operator
    pri_res: jax.Array
    dua_res: jax.Array
    obj_val: jax.Array
    dual_obj_val: jax.Array
    rho_updates: jax.Array


def _admm_step_sh(P_mat, q, A_loc, l_loc, u_loc, stg, st, axis):
    """(mirror of core.admm_iteration; ref _osqp.py:644-703)"""
    x_prev, z_prev, y = st.x, st.z, st.y
    rho_vec, rho_inv = st.rho.rho_vec, st.rho.rho_inv_vec

    b1 = stg.sigma * x_prev - q
    b2 = z_prev - rho_inv * y
    rhs = b1 + lax.psum(A_loc.T @ (rho_vec * b2), axis)
    x_tilde = _cho_solve(st.L, rhs)

    nu = rho_vec * (A_loc @ x_tilde - b2)
    z_tilde = z_prev + rho_inv * (nu - y)

    alpha = stg.alpha
    x = alpha * x_tilde + (1.0 - alpha) * x_prev
    z_relax = alpha * z_tilde + (1.0 - alpha) * z_prev
    z = jnp.clip(z_relax + rho_inv * y, l_loc, u_loc)
    delta_y = rho_vec * (z_relax - z)
    y = y + delta_y

    return st._replace(x=x, z=z, y=y, delta_x=x - x_prev, delta_y=delta_y)


def _rho_estimate_sh(P_mat, q, A_loc, scal, x, z, y, rho, axis):
    """(mirror of core.rho_estimate_fn; ref _osqp.py:880-908)"""
    Ax = A_loc @ x
    Px = P_mat @ x
    Aty = lax.psum(A_loc.T @ y, axis)
    pri = _pmax_inf(Ax - z, axis)
    pri = pri / (jnp.maximum(_pmax_inf(Ax, axis), _pmax_inf(z, axis)) + 1e-10)
    dua = _inf(Px + q + Aty)
    dua = dua / (jnp.maximum(jnp.maximum(_inf(Aty), _inf(Px)), _inf(q)) + 1e-10)
    new_rho = rho * jnp.sqrt(pri / (dua + 1e-10))
    return jnp.clip(new_rho, RHO_MIN, RHO_MAX)


def _adapt_rho_sh(P_mat, q, A_loc, scal, stg, st, axis):
    """(mirror of core.adapt_rho; distributed refactorization under cond)"""
    rho_new = _rho_estimate_sh(P_mat, q, A_loc, scal, st.x, st.z, st.y,
                               st.rho.rho, axis)
    tol = stg.adaptive_rho_tolerance
    trigger = (rho_new > tol * st.rho.rho) | (rho_new < st.rho.rho / tol)

    def do_update(st):
        vec = rho_vec_from_types(st.rho.constr_type, rho_new, stg.rho_is_vec)
        inv = jnp.where(vec > 0, 1.0 / vec, 0.0)
        rho = RhoState(
            rho=jnp.clip(rho_new, RHO_MIN, RHO_MAX),
            rho_vec=vec,
            rho_inv_vec=inv,
            constr_type=st.rho.constr_type,
        )
        L = _factorize_sh(P_mat, A_loc, stg.sigma, vec, axis)
        return st._replace(rho=rho, L=L, rho_updates=st.rho_updates + 1)

    return lax.cond(trigger, do_update, lambda s: s, st)


# ---------------------------------------------------------------------------
# Polish (mirror of core.polish; ref _osqp.py:1693-1828).  The masked
# reduced-KKT Schur operator assembles with one psum; everything else local.
# ---------------------------------------------------------------------------


def _polish_sh(P_mat, q, A_loc, l_loc, u_loc, scal, stg, st, axis):
    n = P_mat.shape[0]
    dtype = st.x.dtype

    low = (st.z - l_loc) < -st.y  # ref _osqp.py:1719
    upp = (u_loc - st.z) < st.y  # ref _osqp.py:1720
    active = low | upp
    mask = active.astype(dtype)
    b2 = jnp.where(low, l_loc, jnp.where(upp, u_loc, 0.0))

    delta = stg.delta
    Ared = mask[:, None] * A_loc
    M = (
        P_mat
        + delta * jnp.eye(n, dtype=dtype)
        + lax.psum(Ared.T @ (Ared / delta), axis)
    )
    L = jnp.linalg.cholesky(M)

    def ared_mv(v):
        return mask * (A_loc @ v)

    def aredt_mv(w):
        return lax.psum(A_loc.T @ (mask * w), axis)

    def kkt_solve(r1, r2):
        rhs = r1 + aredt_mv(r2 / delta)
        xs = _cho_solve(L, rhs)
        ys = (ared_mv(xs) - r2) / delta
        return xs, ys

    b1 = -q
    x_pol, y_red = kkt_solve(b1, b2)

    def refine(i, carry):
        xs, ys = carry
        r1 = b1 - (P_mat @ xs + aredt_mv(ys))
        r2 = b2 - ared_mv(xs)
        dxs, dys = kkt_solve(r1, r2)
        return (xs + dxs, ys + dys)

    x_pol, y_red = lax.fori_loop(0, stg.polish_refine_iter, refine, (x_pol, y_red))

    z_pol = A_loc @ x_pol
    y_pol = jnp.where(active, y_red, 0.0)
    tmp = z_pol + y_pol  # normal-cone projection (ref _osqp.py:676-680)
    z_pol = jnp.clip(tmp, l_loc, u_loc)
    y_pol = tmp - z_pol

    pri_pol, dua_pol, obj_pol, dobj_pol, _, _, _ = _compute_info_sh(
        P_mat, q, A_loc, l_loc, u_loc, scal, x_pol, z_pol, y_pol,
        stg.eps_abs, stg.eps_rel, stg.scaled_termination, stg.check_dualgap, axis,
    )

    # acceptance test (ref _osqp.py:1786-1793)
    success = (
        ((pri_pol < st.pri_res) & (dua_pol < st.dua_res))
        | ((pri_pol < st.pri_res) & (st.dua_res < 1e-10))
        | ((dua_pol < st.dua_res) & (st.pri_res < 1e-10))
    )

    def adopt(st):
        return st._replace(
            x=x_pol, z=z_pol, y=y_pol,
            pri_res=pri_pol, dua_res=dua_pol,
            obj_val=obj_pol, dual_obj_val=dobj_pol,
        ), jnp.int32(1)

    def reject(st):
        return st, jnp.int32(-1)

    return lax.cond(success, adopt, reject, st)


# ---------------------------------------------------------------------------
# The row-consensus solve of ONE QP (called inside shard_map + vmap)
# ---------------------------------------------------------------------------


def _row_consensus_solve(P_mat, q, A_loc, l_loc, u_loc, x0, y0,
                         stg: ShardedSettings, axis, polish: bool):
    """Full-parity row-sharded ADMM for one QP.

    ``A_loc (m_loc, n)`` is this device's row block; x is replicated across
    the mp axis (every device computes the identical x update after the
    psum).  ``x0 (n,)`` / ``y0 (m_loc,)`` warm-start in UNSCALED problem
    space (zeros = cold start; scaling zeros is a no-op, matching
    ref _osqp.py:1493-1545).
    """
    n = P_mat.shape[0]
    m_loc = A_loc.shape[0]
    dtype = P_mat.dtype

    # in-trace distributed Ruiz (0 iterations = identity scaling)
    P_mat, q, A_loc, l_loc, u_loc, scal = _ruiz_scale_sh(
        P_mat, q, A_loc, l_loc, u_loc, stg.n_scaling, axis
    )

    # constraint typing + vector rho on the LOCAL row slice (ref :499-524)
    rho0 = core.make_rho_state(l_loc, u_loc, stg.rho, stg.rho_is_vec)
    L0 = _factorize_sh(P_mat, A_loc, stg.sigma, rho0.rho_vec, axis)

    # warm start: scale the unscaled iterates in-trace (ref :1493-1545)
    x_init = scal.Dinv * x0
    z_init = A_loc @ x_init
    y_init = scal.c * (scal.Einv * y0)

    st = _LoopState(
        it=jnp.int32(0),
        status=jnp.int32(_UNSOLVED),
        x=x_init,
        z=z_init,
        y=y_init,
        delta_x=jnp.zeros((n,), dtype),
        delta_y=jnp.zeros((m_loc,), dtype),
        rho=rho0,
        L=L0,
        pri_res=jnp.asarray(jnp.inf, dtype),
        dua_res=jnp.asarray(jnp.inf, dtype),
        obj_val=jnp.asarray(jnp.nan, dtype),
        dual_obj_val=jnp.asarray(jnp.nan, dtype),
        rho_updates=jnp.int32(0),
    )

    # Epoch structure: EXACTLY core.solve_scaled_impl's (checks and rho
    # adaptation only at epoch boundaries) so iteration counts match the
    # single-device solver and the float64 oracle.
    ct = stg.check_termination
    epoch_len = jnp.where(ct > 0, ct, stg.max_iter).astype(jnp.int32)
    interval = stg.adaptive_rho_interval
    epochs_per_adapt = jnp.maximum(
        (interval + epoch_len - 1) // jnp.maximum(epoch_len, 1), 1
    )

    def _run_check(st, approximate=False):
        status, pri, dua, obj, dobj = _termination_status_sh(
            P_mat, q, A_loc, l_loc, u_loc, scal, st, stg, approximate, axis
        )
        return st._replace(
            status=status, pri_res=pri, dua_res=dua, obj_val=obj,
            dual_obj_val=dobj,
        )

    def cond(st):
        return (st.it < stg.max_iter) & (st.status == _UNSOLVED)

    def body(st):
        this_epoch = jnp.minimum(epoch_len, stg.max_iter - st.it)

        def inner(_, s):
            return _admm_step_sh(P_mat, q, A_loc, l_loc, u_loc, stg, s, axis)

        st = lax.fori_loop(0, this_epoch, inner, st)
        it = st.it + this_epoch
        st = st._replace(it=it)

        do_check = (ct > 0) & (it % jnp.maximum(ct, 1) == 0)
        st = lax.cond(do_check, _run_check, lambda s: s, st)

        epoch_idx = (it + epoch_len - 1) // jnp.maximum(epoch_len, 1)
        do_adapt = (
            stg.adaptive_rho
            & (interval > 0)
            & (epoch_idx % epochs_per_adapt == 0)
            & (st.status == _UNSOLVED)
        )
        st = lax.cond(
            do_adapt,
            lambda s: _adapt_rho_sh(P_mat, q, A_loc, scal, stg, s, axis),
            lambda s: s,
            st,
        )
        return st

    st = lax.while_loop(cond, body, st)

    # Post-loop (ref _osqp.py:1248-1275): exact re-check, then 10x-approximate,
    # else MAX_ITER_REACHED.
    def finish_unsolved(st):
        st = _run_check(st)

        def approx(st):
            status, pri, dua, obj, dobj = _termination_status_sh(
                P_mat, q, A_loc, l_loc, u_loc, scal, st, stg, True, axis
            )
            status = jnp.where(status == _UNSOLVED, _MAX_ITER, status).astype(jnp.int32)
            return st._replace(
                status=status,
                obj_val=jnp.where(
                    jnp.isin(status, jnp.array([_PRIM_INF_INACC, _DUAL_INF_INACC, _NON_CVX])),
                    obj, st.obj_val,
                ),
            )

        return lax.cond(st.status == _UNSOLVED, approx, lambda s: s, st)

    st = lax.cond(
        (st.status == _UNSOLVED) & (st.it >= stg.max_iter),
        finish_unsolved,
        lambda s: s,
        st,
    )

    status_polish = jnp.int32(0)
    if polish:
        solved = st.status == _SOLVED
        st, status_polish = lax.cond(
            solved,
            lambda s: _polish_sh(P_mat, q, A_loc, l_loc, u_loc, scal, stg, s, axis),
            lambda s: (s, jnp.int32(0)),
            st,
        )

    # unscale (ref _osqp.py:1098-1115)
    infeasible = jnp.isin(
        st.status, jnp.array([_PRIM_INF, _PRIM_INF_INACC, _DUAL_INF, _DUAL_INF_INACC])
    )
    x_out = jnp.where(infeasible, jnp.nan, scal.D * st.x)
    y_out = jnp.where(infeasible, jnp.nan, scal.cinv * (scal.E * st.y))
    z_out = scal.Einv * st.z
    unscaled = ~stg.scaled_termination
    prim_cert = jnp.where(unscaled, scal.E * st.delta_y, st.delta_y)
    dual_cert = jnp.where(unscaled, scal.D * st.delta_x, st.delta_x)

    return ShardedResult(
        x=x_out,
        y=y_out,
        z=z_out,
        status=st.status,
        iters=st.it,
        pri_res=st.pri_res,
        dua_res=st.dua_res,
        obj_val=st.obj_val,
        dual_obj_val=st.dual_obj_val,
        rho=st.rho.rho,
        rho_updates=st.rho_updates,
        prim_inf_cert=prim_cert,
        dual_inf_cert=dual_cert,
        status_polish=status_polish,
    )


# ---------------------------------------------------------------------------
# Public entry point
# ---------------------------------------------------------------------------


def dp_mp_solve(mesh: Mesh, P_mat, q, A, l, u, *,
                sigma=1e-6, rho=0.1, alpha=1.6,
                eps_abs=1e-3, eps_rel=1e-3,
                eps_prim_inf=1e-4, eps_dual_inf=1e-4,
                max_iter=4000, check_termination=25, check_every=None,
                scaled_termination=False, check_dualgap=True,
                scaling=10, rho_is_vec=True,
                adaptive_rho=True, adaptive_rho_interval=0,
                adaptive_rho_tolerance=5.0,
                polish=False, delta=1e-6, polish_refine_iter=3,
                x0=None, y0=None,
                dp_axis='dp', mp_axis='mp'):
    """Solve a dp-sharded batch of QPs, each with mp-row-sharded constraints.

    Args: ``P_mat (B,n,n)``, ``q (B,n)``, ``A (B,m,n)``, ``l,u (B,m)``.
    B must divide by ``mesh.shape[dp_axis]``, m by ``mesh.shape[mp_axis]``.
    Settings carry the reference defaults (ref _osqp.py:145-166 /
    bindings.cpp.in:405-447); ``check_every`` is a deprecated alias of
    ``check_termination``.  ``x0 (B,n)`` / ``y0 (B,m)`` warm-start in
    unscaled problem space.  Returns a :class:`ShardedResult` with
    batch-leading global arrays.
    """
    if check_every is not None:
        check_termination = check_every
    dtype = jnp.asarray(P_mat).dtype
    if dtype not in (jnp.float32, jnp.float64):
        dtype = jnp.float32
    B, n = P_mat.shape[0], P_mat.shape[1]
    m = A.shape[1]
    ndp = mesh.shape[dp_axis]
    nmp = mesh.shape[mp_axis]
    assert B % ndp == 0 and m % nmp == 0, (B, ndp, m, nmp)
    assert m > 0, 'dp_mp_solve requires m >= 1 constraint rows'

    f = lambda v: jnp.asarray(v, dtype)
    ct = int(check_termination)
    # host-side interval resolution, identical to the jax backend's
    # (_core_settings): 0 = AUTOMATIC -> fixed fallback, never below ct
    interval = int(adaptive_rho_interval) or ADAPTIVE_RHO_FIXED
    if ct:
        interval = max(interval, ct)
    stg = ShardedSettings(
        sigma=f(sigma),
        alpha=f(alpha),
        eps_abs=f(eps_abs),
        eps_rel=f(eps_rel),
        eps_prim_inf=f(eps_prim_inf),
        eps_dual_inf=f(eps_dual_inf),
        max_iter=jnp.int32(max_iter),
        check_termination=jnp.int32(ct),
        scaled_termination=jnp.asarray(bool(scaled_termination)),
        check_dualgap=jnp.asarray(bool(check_dualgap)),
        adaptive_rho=jnp.asarray(bool(adaptive_rho)),
        adaptive_rho_interval=jnp.int32(interval),
        adaptive_rho_tolerance=f(adaptive_rho_tolerance),
        rho_is_vec=jnp.asarray(bool(rho_is_vec)),
        rho=f(rho),
        n_scaling=jnp.int32(scaling),
        delta=f(delta),
        polish_refine_iter=jnp.int32(polish_refine_iter),
    )

    x0 = jnp.zeros((B, n), dtype) if x0 is None else f(x0)
    y0 = jnp.zeros((B, m), dtype) if y0 is None else f(y0)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(dp_axis, None, None),     # P
            P(dp_axis, None),           # q
            P(dp_axis, mp_axis, None),  # A rows sharded
            P(dp_axis, mp_axis),        # l
            P(dp_axis, mp_axis),        # u
            P(dp_axis, None),           # x0 (replicated over mp)
            P(dp_axis, mp_axis),        # y0
        ),
        out_specs=ShardedResult(
            x=P(dp_axis, None),
            y=P(dp_axis, mp_axis),
            z=P(dp_axis, mp_axis),
            status=P(dp_axis),
            iters=P(dp_axis),
            pri_res=P(dp_axis),
            dua_res=P(dp_axis),
            obj_val=P(dp_axis),
            dual_obj_val=P(dp_axis),
            rho=P(dp_axis),
            rho_updates=P(dp_axis),
            prim_inf_cert=P(dp_axis, mp_axis),
            dual_inf_cert=P(dp_axis, None),
            status_polish=P(dp_axis),
        ),
        check_vma=False,
    )
    def run(P_loc, q_loc, A_loc, l_loc, u_loc, x0_loc, y0_loc):
        def one(P1, q1, A1, l1, u1, x01, y01):
            return _row_consensus_solve(
                P1, q1, A1, l1, u1, x01, y01, stg, mp_axis, polish
            )

        return jax.vmap(one)(P_loc, q_loc, A_loc, l_loc, u_loc, x0_loc, y0_loc)

    return run(f(P_mat), f(q), f(A), f(l), f(u), x0, y0)


def make_batch_shardings(mesh: Mesh, dp_axis='dp'):
    """NamedShardings for dp-sharding the fused batched solver
    (osqp_tpu.batch.batch_qp_solve) across a mesh: batch axis split, all else
    follows."""
    s3 = NamedSharding(mesh, P(dp_axis, None, None))
    s2 = NamedSharding(mesh, P(dp_axis, None))
    s1 = NamedSharding(mesh, P(dp_axis))
    return {'mat': s3, 'vec': s2, 'scalar': s1}
