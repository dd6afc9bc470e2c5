"""Differentiable QP layer (idiomatic JAX).

The TPU-native replacement for the reference's torch autograd layer
(reference src/osqp/nn/torch.py): a pure function ``qp_layer`` with a
``jax.custom_vjp``, fully jit/vmap-compatible, whose forward pass is the
fused batched ADMM solver and whose backward pass applies the adjoint
KKT system of osqp_tpu/solver/derivatives.py as dense masked linear algebra
(shape-stable, so it also vmaps).

Forward returns the primal solution x* (matching the reference layer's
contract, nn/torch.py:197-230).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..solver import core
from ..batch import batch_qp_solve, default_core_settings


class QPLayerResult(NamedTuple):
    x: jax.Array
    y: jax.Array
    status: jax.Array
    iters: jax.Array


def _solve_batch_fwd(P, q, A, l, u, settings: core.Settings, rho):
    res = batch_qp_solve(P, q, A, l, u, settings, rho)
    return QPLayerResult(x=res.x, y=res.y, status=res.status, iters=res.iters)


def _adjoint_system(P, A, l, u, x, y, dx, dy, delta, refine_iters):
    """Masked adjoint KKT solve for ONE instance (vmapped by caller).

    Solves [[P, A_act'], [A_act, 0]] r = [dx; dy_act] via delta-regularized
    Schur form + iterative refinement (mirrors solver/derivatives.py)."""
    n = P.shape[0]
    m = A.shape[0]
    dtype = x.dtype

    # Active-set guess via slack-vs-multiplier comparison (same rule as
    # polish, ref _osqp.py:1719-1720): robust to |y| ~ solver-tolerance noise
    # on inactive rows, unlike a bare sign test.
    z = A @ x if m else jnp.zeros((0,), dtype)
    low = (z - l) < -y
    upp = (u - z) < y
    active = (low | upp).astype(dtype)
    A_act = active[:, None] * A
    dy_act = active * dy

    M = P + delta * jnp.eye(n, dtype=dtype)
    if m:
        M = M + A_act.T @ (A_act / delta)
    L = jnp.linalg.cholesky(M)

    def kkt_solve(r1, r2):
        rhs = r1 + (A_act.T @ (r2 / delta) if m else 0.0)
        xs = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
        xs = jax.scipy.linalg.solve_triangular(L.T, xs, lower=False)
        ys = ((A_act @ xs) - r2) / delta if m else jnp.zeros((0,), dtype)
        return xs, ys

    r_x, r_nu = kkt_solve(dx, dy_act)

    def refine(i, carry):
        r_x, r_nu = carry
        res1 = dx - (P @ r_x + (A_act.T @ r_nu if m else 0.0))
        res2 = dy_act - (A_act @ r_x if m else jnp.zeros((0,), dtype))
        d1, d2 = kkt_solve(res1, res2)
        return (r_x + d1, r_nu + d2)

    r_x, r_nu = jax.lax.fori_loop(0, refine_iters, refine, (r_x, r_nu))

    dq = -r_x
    dl = jnp.where(low, r_nu, 0.0)
    du = jnp.where(upp, r_nu, 0.0)
    dP = -0.5 * (jnp.outer(r_x, x) + jnp.outer(x, r_x))
    dA = -(jnp.outer(active * y, r_x) + jnp.outer(r_nu, x)) if m else jnp.zeros_like(A)
    return dP, dq, dA, dl, du


def make_qp_layer(settings: core.Settings | None = None, dtype=jnp.float32,
                  delta=None, refine_iters=4, **setting_overrides):
    """Build a differentiable batched QP layer.

    Returns ``layer(P, q, A, l, u) -> x`` where all arguments carry a leading
    batch axis; gradients flow to every argument.
    """
    if settings is None:
        settings = default_core_settings(dtype, **setting_overrides)
    if delta is None:
        # f32: the Schur matrix P + dI + A'A/d carries ~1/d^2 conditioning;
        # d=1e-6 NaNs the f32 Cholesky (chip ladder r5) while 1e-4 matches
        # finite differences to 4 decimals after refinement
        delta = 1e-4 if dtype == jnp.float32 else 1e-9

    @jax.custom_vjp
    def layer(P, q, A, l, u):
        return _solve_batch_fwd(P, q, A, l, u, settings, _rho(P)).x

    def _rho(P):
        return jnp.full((P.shape[0],), 0.1, P.dtype)

    def fwd(P, q, A, l, u):
        res = _solve_batch_fwd(P, q, A, l, u, settings, _rho(P))
        return res.x, (P, q, A, l, u, res.x, res.y)

    def bwd(saved, dx):
        P, q, A, l, u, x, y = saved
        d = jnp.asarray(delta, x.dtype)

        def one(P1, A1, l1, u1, x1, y1, dx1):
            return _adjoint_system(
                P1, A1, l1, u1, x1, y1, dx1, jnp.zeros_like(y1), d, refine_iters
            )

        dP, dq, dA, dl, du = jax.vmap(one)(P, A, l, u, x, y, dx)
        return dP, dq, dA, dl, du

    layer.defvjp(fwd, bwd)
    return layer
