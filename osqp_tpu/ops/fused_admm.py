"""Fused ADMM epoch kernel (Pallas/TPU).

The hot loop of the batched solver: run ``K = check_termination`` ADMM
iterations for a tile of QP instances entirely in VMEM, with zero HBM round
trips between iterations.

Layout: instance-LAST.  All arrays are stored ``(feature..., B)`` so the
batch dimension is the 128-lane axis - every elementwise op and every
matvec-reduction is fully vectorized across instances on the VPU, regardless
of the (small, unaligned) problem dimensions n and m.  A per-instance matvec
``A @ x`` becomes ``sum over n of A[m, n, B] * x[None, n, B]`` - a lane-aligned
multiply-reduce.

The KKT solve uses the explicit-inverse mode (osqp_tpu.solver.core Factor,
kkt_method='inv'): x_tilde = Minv rhs plus one refinement step through M,
so the whole iteration is multiply-reduce + clipping, no data-dependent
control flow.

Grid: one program per instance tile of size TB (last-dim blocks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, k):
    return -(-x // k) * k


def admm_epoch_kernel(
    scalars_ref,  # SMEM (4,): [sigma, alpha, K, unused]
    Minv_ref,  # (n, n, TB)
    M_ref,  # (n, n, TB)
    A_ref,  # (m, n, TB)
    q_ref,  # (n, TB)
    l_ref,  # (m, TB)
    u_ref,  # (m, TB)
    rho_ref,  # (m, TB)
    rhoinv_ref,  # (m, TB)
    x_ref,  # (n, TB)   in
    z_ref,  # (m, TB)   in
    y_ref,  # (m, TB)   in
    x_out,  # (n, TB)
    z_out,  # (m, TB)
    y_out,  # (m, TB)
    dx_out,  # (n, TB)
    dy_out,  # (m, TB)
):
    sigma = scalars_ref[0]
    alpha = scalars_ref[1]
    K = scalars_ref[2].astype(jnp.int32)

    Minv = Minv_ref[:]
    M = M_ref[:]
    A = A_ref[:]
    q = q_ref[:]
    l = l_ref[:]
    u = u_ref[:]
    rho = rho_ref[:]
    rho_inv = rhoinv_ref[:]

    def matvec_n(T, v):  # T: (r, n, B), v: (n, B) -> (r, B)
        return jnp.sum(T * v[None, :, :], axis=1)

    def matvec_m(T, v):  # T: (m, n, B), v: (m, B) -> (n, B)  (A' v)
        return jnp.sum(T * v[:, None, :], axis=0)

    def body(k, carry):
        x, z, y, dx, dy = carry
        b2 = z - rho_inv * y
        rhs = sigma * x - q + matvec_m(A, rho * b2)
        xt = matvec_n(Minv, rhs)
        resid = rhs - matvec_n(M, xt)
        xt = xt + matvec_n(Minv, resid)
        Axt = matvec_n(A, xt)
        nu = rho * (Axt - b2)
        zt = z + rho_inv * (nu - y)
        xn = alpha * xt + (1.0 - alpha) * x
        zr = alpha * zt + (1.0 - alpha) * z
        zn = jnp.clip(zr + rho_inv * y, l, u)
        dyn = rho * (zr - zn)
        yn = y + dyn
        return xn, zn, yn, xn - x, dyn

    x0 = x_ref[:]
    z0 = z_ref[:]
    y0 = y_ref[:]
    zeros_n = jnp.zeros_like(x0)
    zeros_m = jnp.zeros_like(z0)
    x, z, y, dx, dy = jax.lax.fori_loop(0, K, body, (x0, z0, y0, zeros_n, zeros_m))

    x_out[:] = x
    z_out[:] = z
    y_out[:] = y
    dx_out[:] = dx
    dy_out[:] = dy


@functools.partial(jax.jit, static_argnames=('tile', 'interpret'))
def admm_epoch(
    Minv_t, M_t, A_t, q_t, l_t, u_t, rho_t, rhoinv_t, x_t, z_t, y_t,
    sigma, alpha, K, tile: int = 256, interpret: bool = False,
):
    """Run K fused ADMM iterations.  All tensors in instance-last layout:
    ``Minv_t (n,n,B)``, ``A_t (m,n,B)``, ``q_t (n,B)``, ...  B must be a
    multiple of ``tile`` (pad upstream).  Returns (x, z, y, dx, dy)."""
    n = q_t.shape[0]
    m = l_t.shape[0]
    B = q_t.shape[-1]
    assert B % tile == 0, (B, tile)
    grid = (B // tile,)
    dtype = q_t.dtype

    scalars = jnp.stack(
        [jnp.asarray(sigma, dtype), jnp.asarray(alpha, dtype), jnp.asarray(K, dtype),
         jnp.zeros((), dtype)]
    )

    def spec(*leading):
        shape = tuple(leading) + (tile,)
        idx = lambda i: tuple([0] * len(leading)) + (i,)
        return pl.BlockSpec(shape, idx, memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((n, B), dtype),
        jax.ShapeDtypeStruct((m, B), dtype),
        jax.ShapeDtypeStruct((m, B), dtype),
        jax.ShapeDtypeStruct((n, B), dtype),
        jax.ShapeDtypeStruct((m, B), dtype),
    )
    out_specs = (spec(n), spec(m), spec(m), spec(n), spec(m))

    return pl.pallas_call(
        admm_epoch_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
            spec(n, n),  # Minv
            spec(n, n),  # M
            spec(m, n),  # A
            spec(n),  # q
            spec(m),  # l
            spec(m),  # u
            spec(m),  # rho
            spec(m),  # rho_inv
            spec(n),  # x
            spec(m),  # z
            spec(m),  # y
        ],
        out_shape=out_shapes,
        out_specs=out_specs,
        interpret=interpret,
    )(scalars, Minv_t, M_t, A_t, q_t, l_t, u_t, rho_t, rhoinv_t, x_t, z_t, y_t)
