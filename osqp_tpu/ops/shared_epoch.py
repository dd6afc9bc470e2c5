"""Fused shared-structure ADMM body kernel (Pallas/TPU).

One kernel launch executes one full while-loop body of the shared-structure
batched engine (osqp_tpu.batch_shared) for a tile of instances:

1. ``K = check_termination`` ADMM iterations entirely in VMEM.  The whole
   pre-projection update is folded into a SINGLE fully-packed MXU matmul:
   because the dual recovery ``nu = rho (A x_t - b2)`` makes
   ``z_tilde == A x_tilde`` algebraically, one iteration is the affine map ::

       [x_tilde; pre_proj_z] = F @ [x; z; y] + c0     (n+m, n+2m) @ (n+2m, TB)

   followed by the box projection and two VPU axpy updates
   (``F``/``c0`` are assembled once per factorization in
   osqp_tpu/batch_shared.py:_build_affine).  For the canonical MPC shapes
   (n=32, m=48) the operand is (80,128)@(128,TB) — near-perfect 128x128
   systolic-array packing, versus 5 underfilled (32,*) matmuls per iteration
   in the naive form.

2. active-column merge of the advanced iterates (terminated columns stay
   frozen),
3. the full OSQP termination check — residuals, objectives, tolerance
   tests, primal/dual infeasibility certificates, non-convexity guard
   (ref algorithm spec: /root/reference/src/osqppurepy/_osqp.py:705-878,
   998-1077) — as column-wise reductions in VMEM, with the residual
   matvecs packed as stacked matmuls (``[P; A] @ x``),
4. capture of newly-terminated columns' solution iterates (fS and the
   certificate deltas fdX/fdY).

The unfused path pays one HBM round trip per op per iteration plus ~10
full-array masked merges per epoch; this kernel pays exactly one read and
one write of the state per *epoch* and emits only (1, B) result rows
besides the state.

Layout: instance-last ``(feature, B)`` so the batch is the 128-lane axis;
the iterate state is carried stacked as ``S = [x; z; y]`` (n+2m, B).  Grid
is 1-D over batch tiles; the small shared matrices are re-fetched per tile
(they are KBs).  Feature dims are zero-padded to sublane multiples and the
batch to lane multiples by the caller (osqp_tpu/batch_shared.py pads once
per solve, not per epoch).

Equivalence with the unfused jnp path (statuses, iteration counts,
iterates) is pinned by tests/test_shared_batch.py::test_fused_epoch_equivalence.

Mosaic portability notes (learned the hard way, all pinned by the tests
running under jax_enable_x64):
* index maps must return int32 and must not capture tracers;
* no f64 anywhere: reductions over bool lower through f64, fori_loop
  induction variables are i64 — use dtype-pinned constants, boolean
  algebra instead of where(cond, False, x), and an int32-counter
  while_loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_OSQP_INFTY = 1e30
_MIN_SCALING = 1e-4

# SMEM scalar-vector slots
_SIGMA, _ALPHA, _K, _EPS_ABS, _EPS_REL, _EPS_PINF, _EPS_DINF, _C, _CINV, \
    _UNSCALED, _SOLVED, _PINF, _DINF, _UNSOLVED_C, _NONCVX, _DUALGAP = range(16)


def _round_up(x: int, k: int) -> int:
    return -(-x // k) * k


def _body_kernel(
    n: int, m: int,  # static, bound via functools.partial
    iter_mode: str,  # iteration-matmul precision: 'highest' (6-pass bf16,
    # exact f32), 'high' (3-pass via manual bf16 hi/lo split — Mosaic has no
    # native Precision.HIGH), 'default' (1 bf16 pass).  The termination
    # check always runs HIGHEST.
    scal_ref,  # SMEM (15,) f32, slots above
    F_ref,  # (n+m, n+2m) affine iteration map
    CH_ref,  # (n+m, n) stacked [P; A] for residual matvecs
    At_ref,  # (n, m)
    rho_ref,  # (m, 1)
    rhoinv_ref,  # (m, 1)
    D_ref,  # (n, 1)
    Dinv_ref,  # (n, 1)
    E_ref,  # (m, 1)
    Einv_ref,  # (m, 1)
    c0_ref,  # (n+m, TB) affine constant (encodes Q through the KKT solve)
    Q_ref,  # (n, TB)
    L_ref,  # (m, TB)
    U_ref,  # (m, TB)
    S_ref,  # (n+2m, TB) stacked [x; z; y] state in
    dX_ref, dY_ref,  # certificate deltas in
    fS_ref, fdX_ref, fdY_ref,  # captures in
    status_ref,  # (1, TB) int32 in
    So, dXo, dYo,  # state out
    fSo, fdXo, fdYo,  # captures out
    status_o,  # (1, TB) int32
    pri_o, dua_o, obj_o, dobj_o,  # (1, TB) f32
):
    dtype = S_ref.dtype
    alpha = scal_ref[_ALPHA].astype(dtype)
    K = scal_ref[_K].astype(jnp.int32)
    eps_abs = scal_ref[_EPS_ABS].astype(dtype)
    eps_rel = scal_ref[_EPS_REL].astype(dtype)
    eps_pinf = scal_ref[_EPS_PINF].astype(dtype)
    eps_dinf = scal_ref[_EPS_DINF].astype(dtype)
    c = scal_ref[_C].astype(dtype)
    cinv = scal_ref[_CINV].astype(dtype)
    unscaled = scal_ref[_UNSCALED] > 0
    solved_code = scal_ref[_SOLVED].astype(jnp.int32)
    pinf_code = scal_ref[_PINF].astype(jnp.int32)
    dinf_code = scal_ref[_DINF].astype(jnp.int32)
    unsolved = scal_ref[_UNSOLVED_C].astype(jnp.int32)
    noncvx_code = scal_ref[_NONCVX].astype(jnp.int32)
    check_dualgap = scal_ref[_DUALGAP] > 0

    F = F_ref[:]
    CH = CH_ref[:]
    At = At_ref[:]
    rho = rho_ref[:]  # (m, 1) broadcasts over lanes
    rhoinv = rhoinv_ref[:]
    D = D_ref[:]
    Dinv = Dinv_ref[:]
    E = E_ref[:]
    Einv = Einv_ref[:]
    c0 = c0_ref[:]
    Q = Q_ref[:]
    L = L_ref[:]
    U = U_ref[:]

    mm = functools.partial(jnp.dot, preferred_element_type=dtype)

    # dtype-pinned constants (x64 mode must not promote anything to f64:
    # Mosaic has no f64 reductions)
    one = jnp.asarray(1.0, dtype)
    infty = jnp.asarray(_OSQP_INFTY, dtype)
    two_infty = jnp.asarray(2 * _OSQP_INFTY, dtype)
    loose = jnp.asarray(_OSQP_INFTY * _MIN_SCALING, dtype)
    zero = jnp.asarray(0.0, dtype)

    # ---- 1. K ADMM iterations (ref _osqp.py:644-703, affine form) ----
    # (explicit int32-counter while_loop: fori_loop's induction variable is
    # i64 under x64 mode, which Mosaic cannot lower)
    if iter_mode == 'high':
        # 3-pass f32 emulation: F = F_hi + F_lo in bf16 halves (split once —
        # F is tiny), S split per iteration; drop the F_lo@S_lo term
        # (O(eps_bf16^2) ~ 1.5e-5 relative — far below solver tolerances).
        F_hi = F.astype(jnp.bfloat16)
        F_lo = (F - F_hi.astype(dtype)).astype(jnp.bfloat16)

        def iter_mm(S):
            S_hi = S.astype(jnp.bfloat16)
            S_lo = (S - S_hi.astype(dtype)).astype(jnp.bfloat16)
            d = functools.partial(jnp.dot, preferred_element_type=dtype,
                                  precision=jax.lax.Precision.DEFAULT)
            return d(F_hi, S_hi) + (d(F_hi, S_lo) + d(F_lo, S_hi))
    else:
        prec = (jax.lax.Precision.DEFAULT if iter_mode == 'default'
                else jax.lax.Precision.HIGHEST)

        def iter_mm(S):
            return jnp.dot(F, S, preferred_element_type=dtype, precision=prec)

    def body(carry):
        i, S, dX, dY = carry
        X = S[:n]
        Y = S[n + m:]
        V = iter_mm(S) + c0
        Xt = V[:n]
        Pz = V[n:]
        Zn = jnp.clip(Pz, L, U)
        Yn = Y + rho * (Pz - rhoinv * Y - Zn)
        Xn = alpha * Xt + (1 - alpha) * X
        Sn = jnp.concatenate([Xn, Zn, Yn], axis=0)
        return i + jnp.int32(1), Sn, Xn - X, Yn - Y

    TB = L.shape[1]
    _, Sn, dXn, dYn = jax.lax.while_loop(
        lambda cr: cr[0] < K, body,
        (jnp.int32(0), S_ref[:],
         jnp.zeros((n, TB), dtype), jnp.zeros((m, TB), dtype)),
    )

    # ---- 2. merge: terminated columns stay frozen ----
    status_in = status_ref[:]
    active = status_in == unsolved  # (1, TB)
    S = jnp.where(active, Sn, S_ref[:])
    dX = jnp.where(active, dXn, dX_ref[:])
    dY = jnp.where(active, dYn, dY_ref[:])
    X = S[:n]
    Z = S[n:n + m]
    Y = S[n + m:]

    # ---- 3. termination check (ref _osqp.py:705-878, 998-1077) ----
    def colmax(V):
        return jnp.max(jnp.abs(V), axis=0, keepdims=True)

    PAX = mm(CH, X)  # stacked [P @ x; A @ x]
    PX = PAX[:n]
    AX = PAX[n:]
    AtY = mm(At, Y)

    pri_vec = AX - Z
    pri = jnp.where(unscaled, colmax(Einv * pri_vec), colmax(pri_vec))

    dua_vec = PX + Q + AtY
    dua = jnp.where(unscaled, cinv * colmax(Dinv * dua_vec), colmax(dua_vec))

    quad = 0.5 * jnp.sum(X * PX, axis=0, keepdims=True)
    obj = (quad + jnp.sum(Q * X, axis=0, keepdims=True)) * cinv
    noncvx_neg = (quad * cinv) < (
        jnp.asarray(-1e-12, dtype)
        * jnp.maximum(one, jnp.sum(X * X, axis=0, keepdims=True))
    )
    pri = jnp.where(noncvx_neg, two_infty, pri)

    Yu = cinv * (E * Y)
    # zero computational-noise duals before the sup (see core.compute_info)
    y_tol = jnp.asarray(jnp.finfo(dtype).eps, dtype) * jnp.max(
        jnp.abs(Yu), axis=0, keepdims=True
    )
    Yu = jnp.where(jnp.abs(Yu) > y_tol, Yu, zero)
    Lu = Einv * L
    Uu = Einv * U
    sup_pos = jnp.where(Uu < loose, Uu * jnp.maximum(Yu, zero), zero)
    sup_neg = jnp.where(Lu > -loose, Lu * jnp.minimum(Yu, zero), zero)
    sup = jnp.sum(sup_pos, axis=0, keepdims=True) + jnp.sum(
        sup_neg, axis=0, keepdims=True
    )
    sup_mag = jnp.sum(jnp.abs(sup_pos), axis=0, keepdims=True) + jnp.sum(
        jnp.abs(sup_neg), axis=0, keepdims=True
    )
    dobj = -quad * cinv - sup
    # rounding-noise scale of the computed gap (matches core.compute_info)
    gap_noise = jnp.asarray(jnp.finfo(dtype).eps, dtype) * (
        sup_mag + jnp.abs(quad * cinv)
        + jnp.abs(jnp.sum(Q * X, axis=0, keepdims=True)) * cinv
    )

    Ax_t = jnp.where(unscaled, colmax(Einv * AX), colmax(AX))
    z_t = jnp.where(unscaled, colmax(Einv * Z), colmax(Z))
    eps_pri = eps_abs + eps_rel * jnp.maximum(Ax_t, z_t)

    def dscale(V):
        return jnp.where(unscaled, colmax(Dinv * V), colmax(V))

    scale_d = jnp.where(unscaled, cinv, one)
    eps_dua = eps_abs + eps_rel * scale_d * jnp.maximum(
        jnp.maximum(dscale(AtY), dscale(PX)), dscale(Q)
    )

    noncvx = (pri > infty) | (dua > infty)
    pri_check = pri < eps_pri
    dua_check = dua < eps_dua

    # primal infeasibility certificate (ref _osqp.py:796-820)
    norm_dY = jnp.where(unscaled, colmax(E * dY), colmax(dY))
    lhs = jnp.sum(U * jnp.maximum(dY, zero) + L * jnp.minimum(dY, zero),
                  axis=0, keepdims=True)
    AtdY_n = dscale(mm(At, dY))
    pinf = (norm_dY > eps_pinf) & (lhs < -eps_pinf * norm_dY) & (
        AtdY_n < eps_pinf * norm_dY
    )
    pinf = pinf & ~pri_check

    # dual infeasibility certificate (ref _osqp.py:822-878)
    PAdX = mm(CH, dX)  # stacked [P @ dx; A @ dx]
    PdX = PAdX[:n]
    AdX = PAdX[n:]
    norm_dX = jnp.where(unscaled, colmax(D * dX), colmax(dX))
    cost_scale = jnp.where(unscaled, c, one)
    dinf = norm_dX > eps_dinf
    dinf &= jnp.sum(Q * dX, axis=0, keepdims=True) < (
        -cost_scale * eps_dinf * norm_dX
    )
    dinf &= dscale(PdX) < cost_scale * eps_dinf * norm_dX
    AdX = jnp.where(unscaled, Einv * AdX, AdX)
    u_fin = U < loose
    l_fin = L > -loose
    bad = (u_fin & (AdX > eps_dinf * norm_dX)) | (l_fin & (AdX < -eps_dinf * norm_dX))
    # bool any-reduction lowers through f64 under x64 mode; reduce in dtype
    bad_any = jnp.max(jnp.where(bad, one, zero), axis=0, keepdims=True) > zero
    dinf &= ~bad_any
    dinf = dinf & ~dua_check

    # duality-gap criterion (OSQP v1 C core; gated by check_dualgap)
    gap = obj - dobj
    eps_gap = (
        eps_abs + eps_rel * jnp.maximum(jnp.abs(obj), jnp.abs(dobj))
        + jnp.asarray(10.0, dtype) * gap_noise
    )
    gap_ok = (~check_dualgap) | (jnp.isfinite(gap) & (jnp.abs(gap) < eps_gap))

    cand = jnp.where(
        noncvx, noncvx_code,
        jnp.where(pri_check & dua_check & gap_ok, solved_code,
                  jnp.where(pinf, pinf_code,
                            jnp.where(dinf, dinf_code, unsolved))),
    ).astype(jnp.int32)

    obj = jnp.where(
        cand == noncvx_code, jnp.asarray(jnp.nan, dtype),
        jnp.where(cand == pinf_code, infty,
                  jnp.where(cand == dinf_code, -infty, obj)),
    )

    # ---- 4. capture newly-terminated columns ----
    newly = active & (cand != unsolved)
    status_o[:] = jnp.where(newly, cand, status_in)
    fSo[:] = jnp.where(newly, S, fS_ref[:])
    fdXo[:] = jnp.where(newly, dX, fdX_ref[:])
    fdYo[:] = jnp.where(newly, dY, fdY_ref[:])

    So[:] = S
    dXo[:] = dX
    dYo[:] = dY
    pri_o[:] = pri
    dua_o[:] = dua
    obj_o[:] = obj
    dobj_o[:] = dobj


def _pick_tile(n8: int, m8: int, Bp: int) -> int:
    """Largest lane tile keeping estimated VMEM usage comfortable.

    Live (feature, TB) buffers per program: stacked state + captures in/out
    (~4x (n+2m)), c0/Q/L/U/deltas, plus loop/check temporaries — bound the
    total by ~10 MB.
    """
    stacked = n8 + 2 * m8
    per_lane = (6 * stacked + 14 * max(n8, m8, 8)) * 4
    for tb in (4096, 2048, 1024, 512, 256, 128):
        if tb <= Bp and per_lane * tb <= 10 * 1024 * 1024:
            return tb
    return 128


def shared_body_pallas(
    F, CH, At, rho_vec, rho_inv, D, Dinv, E, Einv,
    c0, Q, L, U, S, dX, dY, fS, fdX, fdY, status,
    settings, c, cinv, codes, K,
    *, interpret: bool = False, iter_mode: str = 'highest',
):
    """One fused while-loop body: K affine ADMM iterations + merge +
    termination check + capture.  All arrays pre-padded (features to
    multiples of 8, batch to a multiple of 128); ``S`` is the stacked
    (n+2m, B) iterate state; ``status`` is (B,) int32; ``codes`` is the dict
    of integer status codes.  Returns the updated state tuple.
    """
    n, B = Q.shape
    m = L.shape[0]
    dtype = Q.dtype
    TB = _pick_tile(n, m, B)
    grid = (B // TB,)

    f32 = jnp.float32
    scalars = jnp.stack([
        jnp.asarray(settings.sigma, f32),
        jnp.asarray(settings.alpha, f32),
        jnp.asarray(K, f32),
        jnp.asarray(settings.eps_abs, f32),
        jnp.asarray(settings.eps_rel, f32),
        jnp.asarray(settings.eps_prim_inf, f32),
        jnp.asarray(settings.eps_dual_inf, f32),
        jnp.asarray(c, f32),
        jnp.asarray(cinv, f32),
        jnp.where(jnp.asarray(settings.scaled_termination), 0.0, 1.0).astype(f32),
        jnp.asarray(codes['solved'], f32),
        jnp.asarray(codes['pinf'], f32),
        jnp.asarray(codes['dinf'], f32),
        jnp.asarray(codes['unsolved'], f32),
        jnp.asarray(codes['noncvx'], f32),
        jnp.where(jnp.asarray(settings.check_dualgap), 1.0, 0.0).astype(f32),
    ])

    # index maps must return int32 (under jax_enable_x64 a plain literal 0
    # becomes an i64 constant, which Mosaic cannot legalize) and must not
    # capture tracers, so the constant is built inside the lambda
    def fixed(shape):
        return pl.BlockSpec(shape, lambda i: (jnp.int32(0), jnp.int32(0)),
                            memory_space=pltpu.VMEM)

    def tiled(feat):
        return pl.BlockSpec((feat, TB), lambda i: (jnp.int32(0), i),
                            memory_space=pltpu.VMEM)

    row = tiled(1)
    stacked = n + 2 * m

    out_shapes = [
        jax.ShapeDtypeStruct((stacked, B), dtype),  # S
        jax.ShapeDtypeStruct((n, B), dtype),  # dX
        jax.ShapeDtypeStruct((m, B), dtype),  # dY
        jax.ShapeDtypeStruct((stacked, B), dtype),  # fS
        jax.ShapeDtypeStruct((n, B), dtype),  # fdX
        jax.ShapeDtypeStruct((m, B), dtype),  # fdY
        jax.ShapeDtypeStruct((1, B), jnp.int32),  # status
    ] + [jax.ShapeDtypeStruct((1, B), dtype)] * 4  # pri dua obj dobj
    out_specs = [
        tiled(stacked), tiled(n), tiled(m),
        tiled(stacked), tiled(n), tiled(m),
        row, row, row, row, row,
    ]

    outs = pl.pallas_call(
        functools.partial(_body_kernel, n, m, iter_mode),
        grid=grid,
        in_specs=[
            pl.BlockSpec((16,), lambda i: (jnp.int32(0),),
                         memory_space=pltpu.SMEM),  # scalars
            fixed((n + m, stacked)),  # F
            fixed((n + m, n)),  # CH
            fixed((n, m)),  # At
            fixed((m, 1)), fixed((m, 1)),  # rho rhoinv
            fixed((n, 1)), fixed((n, 1)),  # D Dinv
            fixed((m, 1)), fixed((m, 1)),  # E Einv
            tiled(n + m),  # c0
            tiled(n),  # Q
            tiled(m), tiled(m),  # L U
            tiled(stacked), tiled(n), tiled(m),  # S dX dY
            tiled(stacked), tiled(n), tiled(m),  # fS fdX fdY
            row,  # status
        ],
        out_shape=out_shapes,
        out_specs=out_specs,
        interpret=interpret,
    )(
        scalars, F, CH, At,
        rho_vec.reshape(m, 1), rho_inv.reshape(m, 1),
        D.reshape(n, 1), Dinv.reshape(n, 1),
        E.reshape(m, 1), Einv.reshape(m, 1),
        c0, Q, L, U, S, dX, dY, fS, fdX, fdY,
        status.reshape(1, B),
    )
    (So, dXo, dYo, fSo, fdXo, fdYo, status_o, pri, dua, obj, dobj) = outs
    return (So, dXo, dYo, fSo, fdXo, fdYo,
            status_o.reshape(B), pri.reshape(B), dua.reshape(B),
            obj.reshape(B), dobj.reshape(B))
