"""Distributed BANDED huge-QP mode: halo-exchange DIA over the device mesh.

`parallel/bigqp.py` scales an arbitrary sparse QP by sharding matrix ROWS and
replicating ``x`` — every CG iteration moves O(n) floats (one ``all_gather``
+ one ``psum``).  For BANDED structure (MPC cascades, finite differences,
chained couplings — the structure the single-chip DIA format targets,
``osqp_tpu/ops/spmv.py``) we can do strictly better: shard EVERYTHING —
``x`` included — into contiguous row blocks, store each block's DIA bands
locally, and exchange only W-wide HALOS with mesh neighbors per matvec
(``lax.ppermute``), where W is the matrix bandwidth.

Communication per CG iteration drops from O(n) per device to O(W):
6 neighbor ppermutes of W floats (P v, A v, A' w — one halo pair each) plus
2 scalar psums for the dot products.  This is the structural cousin of
ring/blockwise attention — shard the coupled axis, pass boundary state
around the ring — and rides ICI neighbor links only.

Memory is fully sharded too: no replica of ``x``/``q``/``D`` exists, so the
solvable ``n`` scales linearly with the mesh (a 256-device pod holds a
quarter-billion-variable banded QP in f32 iterate state comfortably).

Misaligned shapes (m != n) are handled by padding both to J*L: extra
constraint rows are loose (rho = RHO_MIN, bounds +-INFTY — exactly bigqp's
padding) and extra variables are free with unit curvature (P_ii = 1, q_i = 0,
no coupling), which pins them to 0 without affecting the real block; CG
preserves their exact zeros (their residuals start and stay 0).

The math is the same vector-rho ADMM as the single-device indirect solver
and bigqp (ref algorithm spec /root/reference/src/osqppurepy/_osqp.py:
644-703 iterations, 705-794 residuals, 796-878 certificates, 880-930
adaptive rho, 998-1077 termination, 1710-1828 polish), so iteration counts
match the single-chip solver — the mesh only changes where each row block
lives and how boundary values travel.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..constants import OSQP_INFTY, SolverStatus
from ..ops.spmv import _dia_arrays
from ..utils.scaling_host import ruiz_scale_scipy
from .bigqp import BigQPResult

_MIN_SCALING = 1e-4
_RHO_MIN, _RHO_MAX = 1e-6, 1e6
_RHO_EQ_FACTOR = 1e3
_RHO_TOL = 1e-4


class BandedQPData(NamedTuple):
    """Host-prepared sharded banded problem (leading axis J = #shards).

    Band arrays are (J, D, L): shard j holds the bands of its L global rows.
    All vectors are (J, L) row slices.  Offsets are static and live in
    ``offsets_*`` (tuples — closed over at trace time, not sharded).
    """

    p_bands: jax.Array   # (J, Dp, L)
    a_bands: jax.Array   # (J, Da, L)
    at_bands: jax.Array  # (J, Dt, L)  bands of A'
    a2t_bands: jax.Array  # (J, Dt, L) bands of (A')^2 elementwise (gram diag)
    q: jax.Array         # (J, L) scaled
    l: jax.Array         # (J, L) (padding: -INFTY)
    u: jax.Array         # (J, L) (padding: +INFTY)
    rho_vec: jax.Array   # (J, L) (padding: RHO_MIN)
    types: jax.Array     # (J, L) int8: -1 loose, 0 ineq, 1 eq
    diag_M: jax.Array    # (J, L) CG preconditioner diag
    D: jax.Array         # (J, L) Ruiz scalers (padding: 1.0)
    Dinv: jax.Array
    E: jax.Array         # (J, L) (padding: 1.0)
    Einv: jax.Array
    c: jax.Array
    cinv: jax.Array
    offsets_p: tuple
    offsets_a: tuple
    offsets_at: tuple
    n: int
    m: int
    L: int
    # setup-time scalars carried so solve() stays consistent with the baked
    # diag_M / rho_vec (defaults keep older pickles/constructions working)
    sigma: float = 1e-6
    rho0: float = 0.1
    rho_is_vec: bool = True


def _pad_square(S, n_rows, n_cols, N, extra_diag=0.0):
    """Embed an (n_rows, n_cols) sparse matrix into the top-left of (N, N),
    optionally adding ``extra_diag`` on the padded tail of the diagonal."""
    C = S.tocoo()
    data, rows, cols = C.data, C.row, C.col
    if extra_diag and N > n_rows:
        tail = np.arange(n_rows, N)
        data = np.concatenate([data, np.full(N - n_rows, extra_diag)])
        rows = np.concatenate([rows, tail])
        cols = np.concatenate([cols, tail])
    return sp.coo_matrix((data, (rows, cols)), shape=(N, N))


def _split_bands(bands, offsets, J, L):
    """(D, N) global bands -> (J, D, L) row blocks (N = J*L)."""
    D = bands.shape[0]
    if D == 0:
        return np.zeros((J, 1, L), bands.dtype), (0,)
    return bands.reshape(D, J, L).transpose(1, 0, 2), offsets


def banded_qp_setup(P_sp, q, A_sp, l, u, J, *, scaling=10, sigma=1e-6,
                    rho=0.1, rho_is_vec=True, dtype=jnp.float32) -> BandedQPData:
    """Host-side preparation: Ruiz scaling, rho typing, padding to J*L,
    DIA band extraction and row-block splitting.

    P must be the FULL symmetric matrix (not triu).  Raises if the bandwidth
    exceeds the shard height L (use fewer devices or ``bigqp`` instead).
    """
    n, m = P_sp.shape[0], A_sp.shape[0]
    if scaling > 0:
        P_s, A_s, q_s, l_s, u_s, D, E, c = ruiz_scale_scipy(P_sp, A_sp, q, l, u, scaling)
    else:
        P_s, A_s = sp.csc_matrix(P_sp, dtype=np.float64), sp.csc_matrix(A_sp, dtype=np.float64)
        q_s, l_s, u_s = np.asarray(q, np.float64), np.asarray(l, np.float64), np.asarray(u, np.float64)
        D, E, c = np.ones(n), np.ones(m), 1.0

    # constraint typing + vector rho (ref _osqp.py:499-524)
    loose = (l_s < -OSQP_INFTY * _MIN_SCALING) & (u_s > OSQP_INFTY * _MIN_SCALING)
    eq = (~loose) & (u_s - l_s < _RHO_TOL)
    types = np.where(loose, -1, np.where(eq, 1, 0)).astype(np.int8)
    rho0 = float(np.clip(rho, _RHO_MIN, _RHO_MAX))
    if rho_is_vec:
        rho_vec = np.where(loose, _RHO_MIN, np.where(eq, _RHO_EQ_FACTOR * rho0, rho0))
    else:
        rho_vec = np.full(m, rho0)

    L = max(-(-n // J), -(-m // J))
    N = J * L
    # dummy variables: unit curvature, no coupling -> pinned to 0
    P_pad = _pad_square(P_s, n, n, N, extra_diag=1.0)
    A_pad = _pad_square(A_s, m, n, N)

    p_bands_g, offs_p = _dia_arrays(P_pad.tocsr(), np.float64)
    a_bands_g, offs_a = _dia_arrays(A_pad.tocsr(), np.float64)
    at_bands_g, offs_at = _dia_arrays(A_pad.T.tocsr(), np.float64)

    W = max((max(abs(o) for o in offs) if offs else 0)
            for offs in (offs_p, offs_a, offs_at))
    if W > L:
        raise ValueError(
            f'bandwidth {W} exceeds shard height {L} (n={n}, m={m}, J={J}); '
            'use fewer shards or parallel.bigqp for this problem'
        )

    p_bands, offs_p = _split_bands(p_bands_g, offs_p, J, L)
    a_bands, offs_a = _split_bands(a_bands_g, offs_a, J, L)
    at_bands, offs_at = _split_bands(at_bands_g, offs_at, J, L)
    a2t_bands = at_bands * at_bands

    def padv(v, size, fill):
        return np.pad(np.asarray(v, np.float64), (0, N - size),
                      constant_values=fill).reshape(J, L)

    rho_pad = padv(rho_vec, m, _RHO_MIN)
    # CG preconditioner diagonal diag(P + sigma I + A' rho A), on host
    A_csc = A_pad.tocsc()
    gram = np.asarray((A_csc.multiply(A_csc)).T @ rho_pad.reshape(-1)).ravel()
    diag_M = np.asarray(P_pad.diagonal()).ravel() + sigma + gram

    f = lambda v: jnp.asarray(v, dtype)
    return BandedQPData(
        p_bands=f(p_bands), a_bands=f(a_bands),
        at_bands=f(at_bands), a2t_bands=f(a2t_bands),
        q=f(padv(q_s, n, 0.0)),
        l=f(padv(l_s, m, -OSQP_INFTY)), u=f(padv(u_s, m, OSQP_INFTY)),
        rho_vec=f(rho_pad),
        types=jnp.asarray(padv(types, m, -1), jnp.int8),
        diag_M=f(diag_M.reshape(J, L)),
        D=f(padv(D, n, 1.0)), Dinv=f(padv(1.0 / D, n, 1.0)),
        E=f(padv(E, m, 1.0)), Einv=f(padv(1.0 / E, m, 1.0)),
        c=f(c), cinv=f(1.0 / c),
        offsets_p=offs_p, offsets_a=offs_a, offsets_at=offs_at,
        n=n, m=m, L=L, sigma=float(sigma), rho0=rho0,
        rho_is_vec=bool(rho_is_vec),
    )


def _make_banded_run(mesh: Mesh, data: BandedQPData, *, sigma=None, alpha=1.6,
                     eps_abs=1e-3, eps_rel=1e-3, eps_prim_inf=1e-4,
                     eps_dual_inf=1e-4, max_iter=4000, check_every=25,
                     adaptive_rho=True, adaptive_rho_interval=100,
                     adaptive_rho_tolerance=5.0, cg_tol=None, cg_max_iter=None,
                     polish=False, delta=1e-6, polish_refine_iter=3,
                     axis='mp'):
    """Build the shard_map'd solver kernel for this (mesh, settings) pair.

    The returned ``run`` takes the sharded data arrays plus scaled/padded
    warm-start iterates and returns a block-sharded :class:`BigQPResult`;
    it is a pure jittable function, so :func:`banded_qp_solve` calls it
    once and :func:`banded_mpc_rollout` scans it over a cost sequence."""
    J = mesh.shape[axis]
    n, m, L = data.n, data.m, data.L
    N = J * L
    dtype = data.q.dtype
    f = lambda v: jnp.asarray(v, dtype)
    # diag_M was baked with setup's sigma; if the caller overrides sigma the
    # preconditioner diagonal shifts by exactly (sigma - data.sigma)
    if sigma is None:
        sigma = data.sigma
    sigma_shift = float(sigma) - float(data.sigma)
    sigma_t, alpha_t = f(sigma), f(alpha)
    eps_abs_t, eps_rel_t = f(eps_abs), f(eps_rel)
    eps_pinf_t, eps_dinf_t = f(eps_prim_inf), f(eps_dual_inf)
    delta_t = f(delta)
    if cg_tol is None:
        cg_tol = 1e-12 if dtype == jnp.float64 else 1e-7
    cg_tol_t = f(cg_tol)
    cg_cap = jnp.int32(cg_max_iter if cg_max_iter is not None else max(2 * n, 100))
    tolr = f(adaptive_rho_tolerance)
    epochs_per_adapt = max(adaptive_rho_interval // max(check_every, 1), 1)

    offs_p, offs_a, offs_at = data.offsets_p, data.offsets_a, data.offsets_at
    W = max(1, max((max(abs(o) for o in offs) if offs else 0)
                   for offs in (offs_p, offs_a, offs_at)))
    fwd = [(j, j + 1) for j in range(J - 1)]   # send to right neighbor
    bwd = [(j + 1, j) for j in range(J - 1)]   # send to left neighbor

    spec_sh = P(axis)
    spec_rep = P()

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec_sh,) * 14 + (spec_rep, spec_rep) + (spec_sh,) * 3,
        out_specs=BigQPResult(
            x=spec_sh, y=spec_sh, z=spec_sh,
            status=spec_rep, iters=spec_rep,
            pri_res=spec_rep, dua_res=spec_rep, obj_val=spec_rep,
            rho=spec_rep, rho_updates=spec_rep,
            prim_inf_cert=spec_sh, dual_inf_cert=spec_sh,
            status_polish=spec_rep,
        ),
        check_vma=False,
    )
    def run(p_b, a_b, at_b, a2t_b, q_b, l_b, u_b, rho_b, types_b, diagM_b,
            D_b, Dinv_b, E_b, Einv_b, c_in, cinv_in, x_i, z_i, y_i):
        p_bands = p_b[0]
        a_bands = a_b[0]
        at_bands = at_b[0]
        a2t_bands = a2t_b[0]
        q = q_b[0]
        l_loc, u_loc = l_b[0], u_b[0]
        rho_loc0 = rho_b[0]
        types_loc = types_b[0]
        diag_M = diagM_b[0]
        D, Dinv = D_b[0], Dinv_b[0]
        E_loc, Einv_loc = E_b[0], Einv_b[0]
        x_i_loc, z_i_loc, y_i_loc = x_i[0], z_i[0], y_i[0]
        data_c = c_in.astype(dtype)
        data_cinv = cinv_in.astype(dtype)

        def halo_window(v_loc):
            """(L,) local slice -> (L + 2W,) window incl. neighbor halos.
            Edge devices receive zeros (ppermute zero-fills missing links),
            which is exactly the DIA out-of-range convention."""
            left = lax.ppermute(v_loc[-W:], axis, fwd)
            right = lax.ppermute(v_loc[:W], axis, bwd)
            return jnp.concatenate([left, v_loc, right])

        def dia_mv(bands, offsets, v_loc):
            """Local rows of (global DIA) @ (sharded v): one halo exchange
            then static shifted-FMA slices — zero gathers, O(W) comms."""
            w = halo_window(v_loc)
            acc = bands[0] * lax.slice(w, (W + offsets[0],), (W + offsets[0] + L,))
            for d, o in enumerate(offsets[1:], start=1):
                acc = acc + bands[d] * lax.slice(w, (W + o,), (W + o + L,))
            return acc

        def Pmv(v_loc):
            return dia_mv(p_bands, offs_p, v_loc)

        def Amv(v_loc):
            return dia_mv(a_bands, offs_a, v_loc)

        def Atmv(w_loc):
            return dia_mv(at_bands, offs_at, w_loc)

        def gram_diag(rho_loc):
            return dia_mv(a2t_bands, offs_at, rho_loc)

        def dot(a, b):
            return lax.psum(a @ b, axis)

        def vmax(v):
            return lax.pmax(jnp.max(jnp.abs(v), initial=0.0), axis)

        def Mmv(v, rho_loc, shift=sigma_t):
            return Pmv(v) + shift * v + Atmv(rho_loc * Amv(v))

        diag_M = diag_M + f(sigma_shift)
        dinv0 = 1.0 / diag_M
        gram0 = gram_diag(rho_loc0)
        diagPsig = diag_M - gram0

        def pcg(rhs, xk, rho_loc, dinv, shift=sigma_t):
            b_norm = jnp.sqrt(dot(rhs, rhs))
            tol = jnp.maximum(cg_tol_t * b_norm, jnp.finfo(dtype).tiny)
            r0 = rhs - Mmv(xk, rho_loc, shift)
            zz0 = dinv * r0

            def cond(cr):
                xk, r, zv, p, rz, k = cr
                return (jnp.sqrt(dot(r, r)) > tol) & (k < cg_cap)

            def body(cr):
                xk, r, zv, p, rz, k = cr
                Mp = Mmv(p, rho_loc, shift)
                denom = dot(p, Mp)
                a = rz / jnp.where(denom != 0, denom, 1.0)
                xk = xk + a * p
                r = r - a * Mp
                zv = dinv * r
                rzn = dot(r, zv)
                beta = rzn / jnp.where(rz != 0, rz, 1.0)
                return (xk, r, zv, zv + beta * p, rzn, k + 1)

            out = lax.while_loop(cond, body, (xk, r0, zz0, zz0, dot(r0, zz0), jnp.int32(0)))
            return out[0]

        def admm_step(x, z, y, xt_prev, dx, dy, rho_loc, rinv_loc, dinv):
            b2 = z - rinv_loc * y
            rhs = sigma_t * x - q + Atmv(rho_loc * b2)
            x_t = pcg(rhs, xt_prev, rho_loc, dinv)
            Axt = Amv(x_t)
            nu = rho_loc * (Axt - b2)
            z_t = z + rinv_loc * (nu - y)
            x_new = alpha_t * x_t + (1 - alpha_t) * x
            z_rel = alpha_t * z_t + (1 - alpha_t) * z
            z_new = jnp.clip(z_rel + rinv_loc * y, l_loc, u_loc)
            dy_new = rho_loc * (z_rel - z_new)
            y_new = y + dy_new
            return x_new, z_new, y_new, x_t, x_new - x, dy_new

        def is_primal_infeasible(dy, factor):
            """(ref _osqp.py:796-820; all pieces sharded)"""
            eps = eps_pinf_t * factor
            norm_dy = vmax(E_loc * dy)
            lhs = lax.psum(
                jnp.sum(u_loc * jnp.maximum(dy, 0) + l_loc * jnp.minimum(dy, 0)),
                axis,
            )
            At_dy = Atmv(dy)
            return (
                (norm_dy > eps)
                & (lhs < -eps * norm_dy)
                & (vmax(Dinv * At_dy) < eps * norm_dy)
            )

        def is_dual_infeasible(dx, factor):
            """(ref _osqp.py:822-878; dx sharded)"""
            eps = eps_dinf_t * factor
            norm_dx = vmax(D * dx)
            ok = norm_dx > eps
            ok &= dot(q, dx) < -data_c * eps * norm_dx
            P_dx = Pmv(dx)
            ok &= vmax(Dinv * P_dx) < data_c * eps * norm_dx
            A_dx = Einv_loc * Amv(dx)
            u_fin = u_loc < OSQP_INFTY * _MIN_SCALING
            l_fin = l_loc > -OSQP_INFTY * _MIN_SCALING
            bad = (u_fin & (A_dx > eps * norm_dx)) | (l_fin & (A_dx < -eps * norm_dx))
            bad_any = lax.pmax(jnp.max(jnp.where(bad, 1.0, 0.0), initial=0.0), axis) > 0
            return ok & ~bad_any

        def check(x, z, y, factor=1.0):
            """Unscaled residual norms + tolerances (ref _osqp.py:705-794)."""
            ea = eps_abs_t * factor
            er = eps_rel_t * factor
            Ax = Amv(x)
            Px = Pmv(x)
            Aty = Atmv(y)
            pri = vmax(Einv_loc * (Ax - z))
            dua = data_cinv * vmax(Dinv * (Px + q + Aty))
            eps_pri = ea + er * jnp.maximum(vmax(Einv_loc * Ax), vmax(Einv_loc * z))
            eps_dua = ea + er * data_cinv * jnp.maximum(
                jnp.maximum(vmax(Dinv * Aty), vmax(Dinv * Px)), vmax(Dinv * q)
            )
            obj = (0.5 * dot(x, Px) + dot(q, x)) * data_cinv
            pri_n = vmax(Ax - z) / (jnp.maximum(vmax(Ax), vmax(z)) + 1e-10)
            dua_n = vmax(Px + q + Aty) / (
                jnp.maximum(jnp.maximum(vmax(Aty), vmax(Px)), vmax(q)) + 1e-10
            )
            return pri, dua, eps_pri, eps_dua, obj, pri_n, dua_n

        _UNSOLVED = jnp.int32(int(SolverStatus.OSQP_UNSOLVED))

        def full_status(x, z, y, dx, dy, factor, solved, pinf_c, dinf_c):
            pri, dua, eps_pri, eps_dua, obj, pri_n, dua_n = check(x, z, y, factor)
            pri_ok = pri < eps_pri
            dua_ok = dua < eps_dua
            pinf = (~pri_ok) & is_primal_infeasible(dy, factor)
            dinf = (~dua_ok) & is_dual_infeasible(dx, factor)
            status = jnp.where(
                pri_ok & dua_ok, jnp.int32(solved),
                jnp.where(pinf, jnp.int32(pinf_c),
                          jnp.where(dinf, jnp.int32(dinf_c), _UNSOLVED)),
            )
            return status, pri, dua, obj, pri_n, dua_n

        def cond(st):
            (x, z, y, xt, dx, dy, rho_loc, rinv, dinv, rho_s, it, status,
             pri, dua, obj, rupd) = st
            return (it < max_iter) & (status == _UNSOLVED)

        def body(st):
            (x, z, y, xt, dx, dy, rho_loc, rinv, dinv, rho_s, it, status,
             pri, dua, obj, rupd) = st

            def inner(_, c):
                return admm_step(*c, rho_loc, rinv, dinv)

            x, z, y, xt, dx, dy = lax.fori_loop(
                0, check_every, inner, (x, z, y, xt, dx, dy)
            )
            it = it + check_every
            status, pri, dua, obj, pri_n, dua_n = full_status(
                x, z, y, dx, dy, 1.0,
                int(SolverStatus.OSQP_SOLVED),
                int(SolverStatus.OSQP_PRIMAL_INFEASIBLE),
                int(SolverStatus.OSQP_DUAL_INFEASIBLE),
            )

            epoch = it // jnp.maximum(check_every, 1)
            do_adapt = (
                jnp.asarray(adaptive_rho)
                & (epoch % epochs_per_adapt == 0)
                & (status == _UNSOLVED)
            )

            def adapt(args):
                rho_s, rho_loc, rinv, dinv, rupd = args
                est = jnp.clip(
                    rho_s * jnp.sqrt(pri_n / (dua_n + 1e-10)), _RHO_MIN, _RHO_MAX
                )
                trig = (est > tolr * rho_s) | (est < rho_s / tolr)

                def apply(_):
                    new_loc = jnp.where(
                        types_loc == -1, _RHO_MIN,
                        jnp.where(types_loc == 1, _RHO_EQ_FACTOR * est, est),
                    ).astype(dtype)
                    # preconditioner diag tracks rho via a LOCAL gram-band
                    # matvec (one halo exchange; bigqp needed a psum here)
                    return (
                        est, new_loc, 1.0 / new_loc,
                        1.0 / (diagPsig + gram_diag(new_loc)), rupd + 1,
                    )

                return lax.cond(trig, apply,
                                lambda _: (rho_s, rho_loc, rinv, dinv, rupd), None)

            rho_s, rho_loc, rinv, dinv, rupd = lax.cond(
                do_adapt, adapt, lambda a: a, (rho_s, rho_loc, rinv, dinv, rupd)
            )
            return (x, z, y, xt, dx, dy, rho_loc, rinv, dinv, rho_s, it,
                    status, pri, dua, obj, rupd)

        # the setup-time clipped scalar rho (matches the single-chip core,
        # which adapts from settings.rho even for all-equality QPs)
        rho_s0 = f(data.rho0)
        st0 = (
            x_i_loc, z_i_loc, y_i_loc, x_i_loc,
            jnp.zeros((L,), dtype), jnp.zeros((L,), dtype),
            rho_loc0, jnp.where(rho_loc0 > 0, 1.0 / rho_loc0, 0.0), dinv0,
            rho_s0, jnp.int32(0), _UNSOLVED,
            f(jnp.inf), f(jnp.inf), f(jnp.nan), jnp.int32(0),
        )
        (x, z, y, xt, dx, dy, rho_loc, rinv, dinv, rho_s, it, status, pri,
         dua, obj, rupd) = lax.while_loop(cond, body, st0)

        # max-iter fallback: retry at 10x tolerances -> *_INACCURATE
        def approx_retry(_):
            status_ap, pri_ap, dua_ap, obj_ap, _, _ = full_status(
                x, z, y, dx, dy, 10.0,
                int(SolverStatus.OSQP_SOLVED_INACCURATE),
                int(SolverStatus.OSQP_PRIMAL_INFEASIBLE_INACCURATE),
                int(SolverStatus.OSQP_DUAL_INFEASIBLE_INACCURATE),
            )
            return jnp.where(
                status_ap == _UNSOLVED,
                jnp.int32(int(SolverStatus.OSQP_MAX_ITER_REACHED)),
                status_ap,
            )

        status = lax.cond(status == _UNSOLVED, approx_retry, lambda _: status, None)

        # polish (ref _osqp.py:1710-1828): same halo-exchange PCG with
        # rho := act/delta on the guessed active rows
        status_polish = jnp.int32(0)
        if polish:
            solved = status == jnp.int32(int(SolverStatus.OSQP_SOLVED))

            def do_polish(args):
                x, z, y, pri, dua = args
                low = (z - l_loc) < -y
                upp = (u_loc - z) < y
                act = low | upp
                b_loc = jnp.where(low, l_loc, jnp.where(upp, u_loc, 0.0))
                rho_pol = jnp.where(act, 1.0 / delta_t, 0.0).astype(dtype)
                dinv_pol = 1.0 / (diagPsig - sigma_t + delta_t + gram_diag(rho_pol))
                rhs = -q + Atmv(rho_pol * b_loc)
                x_pol = pcg(rhs, x, rho_pol, dinv_pol, shift=delta_t)

                def refine(_, xp):
                    resid = rhs - Mmv(xp, rho_pol, delta_t)
                    return xp + pcg(resid, jnp.zeros_like(xp), rho_pol,
                                    dinv_pol, shift=delta_t)

                x_pol = lax.fori_loop(0, polish_refine_iter, refine, x_pol)
                y_pol = rho_pol * (Amv(x_pol) - b_loc)
                z_pol = jnp.where(act, b_loc, Amv(x_pol))
                pri_p, dua_p, _, _, obj_p, _, _ = check(x_pol, z_pol, y_pol)
                better = (pri_p < pri) & (dua_p < dua)
                return lax.cond(
                    better,
                    lambda _: (x_pol, z_pol, y_pol, pri_p, dua_p, obj_p, jnp.int32(1)),
                    lambda _: (x, z, y, pri, dua,
                               (0.5 * dot(x, Pmv(x)) + dot(q, x)) * data_cinv,
                               jnp.int32(-1)),
                    None,
                )

            x, z, y, pri, dua, obj, status_polish = lax.cond(
                solved, do_polish,
                lambda a: (a[0], a[1], a[2], a[3], a[4], obj, jnp.int32(0)),
                (x, z, y, pri, dua),
            )

        infeasible = jnp.isin(status, jnp.array([
            int(SolverStatus.OSQP_PRIMAL_INFEASIBLE),
            int(SolverStatus.OSQP_PRIMAL_INFEASIBLE_INACCURATE),
            int(SolverStatus.OSQP_DUAL_INFEASIBLE),
            int(SolverStatus.OSQP_DUAL_INFEASIBLE_INACCURATE),
        ], dtype=jnp.int32))
        x_out = jnp.where(infeasible, jnp.nan, D * x)
        y_out = jnp.where(infeasible, jnp.nan, data_cinv * (E_loc * y))
        prim_cert = E_loc * dy
        dual_cert = D * dx
        return BigQPResult(
            x=x_out[None], y=y_out[None], z=z[None],
            status=status, iters=it, pri_res=pri, dua_res=dua, obj_val=obj,
            rho=rho_s, rho_updates=rupd,
            prim_inf_cert=prim_cert[None], dual_inf_cert=dual_cert[None],
            status_polish=status_polish,
        )

    return run


def _pad_init(data: BandedQPData, v, size, fill=0.0):
    J, L = data.q.shape
    dtype = data.q.dtype
    if v is None:
        return jnp.zeros((J, L), dtype) + jnp.asarray(fill, dtype)
    return jnp.pad(jnp.asarray(v, dtype), (0, J * L - size),
                   constant_values=fill).reshape(J, L)


def banded_qp_solve(mesh: Mesh, data: BandedQPData, *, x0=None, z0=None,
                    y0=None, axis='mp', **settings) -> BigQPResult:
    """Solve the banded sharded QP.  Same result contract as
    ``bigqp.big_qp_solve`` (unscaled x/y, statuses, certificates, polish);
    ``x0``/``z0``/``y0`` warm-start with scaled iterates (length n/m).
    Settings (eps/max_iter/adaptive rho/cg/polish/sigma) are forwarded to
    :func:`_make_banded_run` — see its signature for defaults."""
    n, m = data.n, data.m
    run = _make_banded_run(mesh, data, axis=axis, **settings)
    res = run(
        data.p_bands, data.a_bands, data.at_bands, data.a2t_bands,
        data.q, data.l, data.u, data.rho_vec, data.types, data.diag_M,
        data.D, data.Dinv, data.E, data.Einv, data.c, data.cinv,
        _pad_init(data, x0, n), _pad_init(data, z0, m), _pad_init(data, y0, m),
    )
    # un-pad: x/dual_inf_cert to n; y/z/prim_inf_cert to m
    return res._replace(
        x=res.x.reshape(-1)[:n],
        y=res.y.reshape(-1)[:m],
        z=res.z.reshape(-1)[:m],
        prim_inf_cert=res.prim_inf_cert.reshape(-1)[:m],
        dual_inf_cert=res.dual_inf_cert.reshape(-1)[:n],
    )


# ---------------------------------------------------------------------------
# MPC workload surface: vector updates + warm rollout
# (ref update semantics /root/reference/src/osqppurepy/_osqp.py:1312-1429)
# ---------------------------------------------------------------------------


def _host_dia_mv(bands_jl, offsets, v, out_len):
    """Host-side DIA matvec on the (J, D, L) band blocks (un-splits them
    back to global (D, N) bands) — used to rebuild the preconditioner
    diagonal on bound updates without touching the device."""
    b = np.asarray(bands_jl, np.float64)
    J, D, L = b.shape
    bands_g = b.transpose(1, 0, 2).reshape(D, J * L)
    m = out_len
    vp = np.concatenate([np.zeros(m), np.asarray(v, np.float64), np.zeros(m)])
    acc = np.zeros(m)
    for d, o in enumerate(offsets):
        acc += bands_g[d] * vp[m + o: 2 * m + o]
    return acc


def banded_qp_update_vec(data: BandedQPData, q=None, l=None, u=None) -> BandedQPData:
    """Update q/l/u WITHOUT re-running setup: rescale the new vectors with
    the cached Ruiz scalers, and on bound changes re-type constraints,
    rebuild the typed rho vector from the setup-time rho, and refresh the
    CG preconditioner diagonal (all O(n) host work, no re-scaling pass) —
    the distributed analogue of the single-chip backend's
    ``update_data_vec`` (backends/jax_backend.py).  Returns a new
    BandedQPData with identical pytree structure (safe to reuse compiled
    solvers)."""
    J, L = data.q.shape
    n, m, N = data.n, data.m, J * L
    dtype = data.q.dtype

    def padv(v, size, fill):
        return np.pad(np.asarray(v, np.float64), (0, N - size),
                      constant_values=fill).reshape(J, L)

    if q is not None:
        q = np.asarray(q, np.float64).ravel()
        if q.shape != (n,):
            raise ValueError(f'q must have shape ({n},)')
        D = np.asarray(data.D, np.float64).reshape(-1)[:n]
        q_s = float(data.c) * (D * q)
        data = data._replace(q=jnp.asarray(padv(q_s, n, 0.0), dtype))

    if l is None and u is None:
        return data

    E = np.asarray(data.E, np.float64).reshape(-1)[:m]
    l_new = (np.asarray(data.l, np.float64).reshape(-1)[:m] if l is None
             else E * np.clip(np.asarray(l, np.float64).ravel(), -OSQP_INFTY, None))
    u_new = (np.asarray(data.u, np.float64).reshape(-1)[:m] if u is None
             else E * np.clip(np.asarray(u, np.float64).ravel(), None, OSQP_INFTY))
    if l_new.shape != (m,) or u_new.shape != (m,):
        raise ValueError(f'l/u must have shape ({m},)')
    if np.any(l_new > u_new):
        raise ValueError('l must be <= u elementwise')

    # re-type + typed rho vector (same rules as setup; padding rows stay
    # loose because their bounds are +-INFTY)
    loose = (l_new < -OSQP_INFTY * _MIN_SCALING) & (u_new > OSQP_INFTY * _MIN_SCALING)
    eq = (~loose) & (u_new - l_new < _RHO_TOL)
    types = np.where(loose, -1, np.where(eq, 1, 0)).astype(np.int8)
    rho0 = float(data.rho0)
    if data.rho_is_vec:
        rho_vec = np.where(loose, _RHO_MIN, np.where(eq, _RHO_EQ_FACTOR * rho0, rho0))
    else:
        # scalar-rho setups keep the uniform vector (same rule as setup)
        rho_vec = np.full(m, rho0)
    rho_pad = padv(rho_vec, m, _RHO_MIN)

    # preconditioner diag: swap the gram(rho) term for the new rho
    gram_old = _host_dia_mv(data.a2t_bands, data.offsets_at,
                            np.asarray(data.rho_vec, np.float64).reshape(-1), N)
    gram_new = _host_dia_mv(data.a2t_bands, data.offsets_at,
                            rho_pad.reshape(-1), N)
    diag_M = np.asarray(data.diag_M, np.float64).reshape(-1) - gram_old + gram_new

    return data._replace(
        l=jnp.asarray(padv(l_new, m, -OSQP_INFTY), dtype),
        u=jnp.asarray(padv(u_new, m, OSQP_INFTY), dtype),
        rho_vec=jnp.asarray(rho_pad, dtype),
        types=jnp.asarray(padv(types, m, -1), jnp.int8),
        diag_M=jnp.asarray(diag_M.reshape(J, L), dtype),
    )


class BandedRollout(NamedTuple):
    """Per-step results of a warm MPC rollout plus the final scaled
    iterates (feed them back as x0/z0/y0 to chain rollouts)."""

    x: jax.Array        # (T, n) unscaled per-step solutions
    iters: jax.Array    # (T,)
    status: jax.Array   # (T,)
    obj_val: jax.Array  # (T,)
    x_carry: jax.Array  # (J, L) scaled
    z_carry: jax.Array
    y_carry: jax.Array


def banded_mpc_rollout(mesh: Mesh, data: BandedQPData, q_seq, *, x0=None,
                       z0=None, y0=None, axis='mp', **settings) -> BandedRollout:
    """Warm MPC rollout on the fully-sharded banded mode: one ``lax.scan``
    over a (T, n) sequence of UNSCALED cost vectors, carrying the scaled
    iterates (x, z, y) between steps — the distributed analogue of the
    single-chip ``batch.mpc_rollout`` / warm update(q)+solve loop.  All T
    solves run in ONE device program (no host roundtrips between steps).
    An infeasible step zeroes the carried iterates (cold restart next
    step) instead of propagating NaN."""
    n, m = data.n, data.m
    J, L = data.q.shape
    dtype = data.q.dtype
    run = _make_banded_run(mesh, data, axis=axis, **settings)

    qs = jnp.asarray(q_seq, dtype)
    if qs.ndim != 2 or qs.shape[1] != n:
        raise ValueError(f'q_seq must have shape (T, {n})')
    T = qs.shape[0]
    qpad = jnp.zeros((T, J * L), dtype).at[:, :n].set(qs).reshape(T, J, L)
    q_scaled = data.c * data.D[None] * qpad

    def step(carry, q_t):
        x, z, y = carry
        res = run(
            data.p_bands, data.a_bands, data.at_bands, data.a2t_bands,
            q_t, data.l, data.u, data.rho_vec, data.types, data.diag_M,
            data.D, data.Dinv, data.E, data.Einv, data.c, data.cinv,
            x, z, y,
        )
        # cold-restart carries after a failed step: infeasible statuses
        # (certificate found) restart cold, and any non-finite or blown-up
        # (>1e30) element is zeroed so diverged-but-finite garbage cannot
        # poison step t+1; MAX_ITER partial iterates stay — they are
        # legitimate warm continuation state
        cold = jnp.isnan(res.x).any() | jnp.isin(
            res.status, jnp.array([3, 4, 5, 6], res.status.dtype)
        )
        clean = lambda a: jnp.where(
            cold | ~jnp.isfinite(a) | (jnp.abs(a) > 1e30), 0.0, a
        )
        x_s = clean(res.x * data.Dinv)                # unscaled -> scaled
        y_s = clean(res.y * data.c * data.Einv)
        z_s = clean(res.z)
        return (x_s, z_s, y_s), (res.x, res.iters, res.status, res.obj_val)

    init = (_pad_init(data, x0, n), _pad_init(data, z0, m), _pad_init(data, y0, m))
    (xc, zc, yc), (xs, iters, statuses, objs) = jax.lax.scan(step, init, q_scaled)
    return BandedRollout(
        x=xs.reshape(T, -1)[:, :n], iters=iters, status=statuses,
        obj_val=objs, x_carry=xc, z_carry=zc, y_carry=yc,
    )
