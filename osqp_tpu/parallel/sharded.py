"""Multi-chip QP solving over a jax.sharding.Mesh.

The reference has **no** distributed runtime (SURVEY.md section 2: its entire
parallelism story is a CUDA backend + GIL-release threads).  This module is
the TPU-native scale-out design:

* **dp axis** - independent QP instances sharded across devices (the batched
  MPC/scenario workload).  Embarrassingly parallel; collectives only for the
  global convergence test.
* **mp axis** - one QP's constraint rows split across devices
  (row-consensus ADMM).  Each device owns a row block of A and the matching
  slices of l, u, z, y, rho; x is replicated.  The per-iteration KKT solve
  needs one ``psum`` (of A_loc' rho b2_loc) over ICI; the Schur operator
  M = P + sigma I + sum_shards A_s' rho_s A_s is assembled with a ``psum`` at
  factorization time.  Residual inf-norms reduce with ``pmax``.

Both axes compose: ``dp_mp_solve`` shard_maps a vmapped row-sharded solver
over a 2-D mesh.  This is the "full training step" analogue the multi-chip
dryrun exercises.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solver import core


class ShardedResult(NamedTuple):
    x: jax.Array  # (B, n) primal solutions (unscaled problem space)
    z: jax.Array  # (B, m_local) per-device constraint slices
    y: jax.Array
    iters: jax.Array  # (B,)
    pri_res: jax.Array  # (B,)
    dua_res: jax.Array  # (B,)
    converged: jax.Array  # (B,) bool


def _row_consensus_solve(P_mat, q, A_loc, l_loc, u_loc, sigma, rho_loc, alpha,
                         eps_abs, eps_rel, max_iter, check_every, mp_axis):
    """Row-sharded ADMM for one QP; called inside shard_map (and vmap).

    A_loc (m_loc, n) is this device's row block; x is replicated across the
    mp axis (every device computes the identical x update after the psum).
    """
    n = P_mat.shape[0]
    dtype = P_mat.dtype

    # distributed Schur operator assembly: one psum of the local Gram block
    M_local = A_loc.T @ (rho_loc[:, None] * A_loc)
    M = P_mat + sigma * jnp.eye(n, dtype=dtype) + lax.psum(M_local, mp_axis)
    L = jnp.linalg.cholesky(M)

    def cho_solve(b):
        t = jax.scipy.linalg.solve_triangular(L, b, lower=True)
        return jax.scipy.linalg.solve_triangular(L.T, t, lower=False)

    rho_inv = 1.0 / rho_loc

    def admm_step(x, z, y):
        b2 = z - rho_inv * y
        rhs = sigma * x - q + lax.psum(A_loc.T @ (rho_loc * b2), mp_axis)
        x_t = cho_solve(rhs)
        nu = rho_loc * (A_loc @ x_t - b2)
        z_t = z + rho_inv * (nu - y)
        x_new = alpha * x_t + (1 - alpha) * x
        z_relax = alpha * z_t + (1 - alpha) * z
        z_new = jnp.clip(z_relax + rho_inv * y, l_loc, u_loc)
        y_new = y + rho_loc * (z_relax - z_new)
        return x_new, z_new, y_new

    def residuals(x, z, y):
        Ax = A_loc @ x
        pri = lax.pmax(jnp.max(jnp.abs(Ax - z), initial=0.0), mp_axis)
        dua_vec = P_mat @ x + q + lax.psum(A_loc.T @ y, mp_axis)
        dua = jnp.max(jnp.abs(dua_vec))
        # relative scales
        pri_scale = lax.pmax(
            jnp.maximum(jnp.max(jnp.abs(Ax), initial=0.0), jnp.max(jnp.abs(z), initial=0.0)),
            mp_axis,
        )
        dua_scale = jnp.maximum(
            jnp.max(jnp.abs(P_mat @ x)),
            jnp.maximum(jnp.max(jnp.abs(lax.psum(A_loc.T @ y, mp_axis))), jnp.max(jnp.abs(q))),
        )
        return pri, dua, pri_scale, dua_scale

    def cond(carry):
        x, z, y, it, done, pri, dua = carry
        return (it < max_iter) & (~done)

    def body(carry):
        x, z, y, it, done, _, _ = carry

        def inner(_, c):
            return admm_step(*c)

        x, z, y = lax.fori_loop(0, check_every, inner, (x, z, y))
        it = it + check_every
        pri, dua, ps, ds = residuals(x, z, y)
        done = (pri <= eps_abs + eps_rel * ps) & (dua <= eps_abs + eps_rel * ds)
        return (x, z, y, it, done, pri, dua)

    m_loc = A_loc.shape[0]
    x0 = jnp.zeros((n,), dtype)
    z0 = jnp.zeros((m_loc,), dtype)
    y0 = jnp.zeros((m_loc,), dtype)
    x, z, y, it, done, pri, dua = lax.while_loop(
        cond, body, (x0, z0, y0, jnp.int32(0), jnp.zeros((), bool),
                     jnp.asarray(jnp.inf, dtype), jnp.asarray(jnp.inf, dtype))
    )
    return ShardedResult(x=x, z=z, y=y, iters=it, pri_res=pri, dua_res=dua, converged=done)


def dp_mp_solve(mesh: Mesh, P_mat, q, A, l, u, *, sigma=1e-6, rho=0.1, alpha=1.6,
                eps_abs=1e-3, eps_rel=1e-3, max_iter=1000, check_every=25,
                dp_axis='dp', mp_axis='mp'):
    """Solve a dp-sharded batch of QPs, each with mp-row-sharded constraints.

    Args: ``P_mat (B,n,n)``, ``q (B,n)``, ``A (B,m,n)``, ``l,u (B,m)``.
    B must divide by mesh.shape[dp_axis], m by mesh.shape[mp_axis].
    Returns a ShardedResult with batch-leading global arrays.
    """
    dtype = P_mat.dtype
    B, n = P_mat.shape[0], P_mat.shape[1]
    m = A.shape[1]
    ndp = mesh.shape[dp_axis]
    nmp = mesh.shape[mp_axis]
    assert B % ndp == 0 and m % nmp == 0

    f = lambda v: jnp.asarray(v, dtype)
    sigma, rho, alpha = f(sigma), f(rho), f(alpha)
    eps_abs, eps_rel = f(eps_abs), f(eps_rel)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(dp_axis, None, None),  # P
            P(dp_axis, None),        # q
            P(dp_axis, mp_axis, None),  # A rows sharded
            P(dp_axis, mp_axis),     # l
            P(dp_axis, mp_axis),     # u
        ),
        out_specs=ShardedResult(
            x=P(dp_axis, None),
            z=P(dp_axis, mp_axis),
            y=P(dp_axis, mp_axis),
            iters=P(dp_axis),
            pri_res=P(dp_axis),
            dua_res=P(dp_axis),
            converged=P(dp_axis),
        ),
        check_vma=False,
    )
    def run(P_loc, q_loc, A_loc, l_loc, u_loc):
        def one(P1, q1, A1, l1, u1):
            rho_vec = jnp.full((A1.shape[0],), rho, dtype)
            return _row_consensus_solve(
                P1, q1, A1, l1, u1, sigma, rho_vec, alpha,
                eps_abs, eps_rel, max_iter, check_every, mp_axis,
            )

        return jax.vmap(one)(P_loc, q_loc, A_loc, l_loc, u_loc)

    return run(f(P_mat), f(q), f(A), f(l), f(u))


def make_batch_shardings(mesh: Mesh, dp_axis='dp'):
    """NamedShardings for dp-sharding the fused batched solver
    (osqp_tpu.batch.batch_qp_solve) across a mesh: batch axis split, all else
    follows."""
    s3 = NamedSharding(mesh, P(dp_axis, None, None))
    s2 = NamedSharding(mesh, P(dp_axis, None))
    s1 = NamedSharding(mesh, P(dp_axis))
    return {'mat': s3, 'vec': s2, 'scalar': s1}
