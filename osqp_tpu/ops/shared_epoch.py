"""Fused shared-structure ADMM epoch kernel (Pallas/TPU).

Hot loop of the shared-structure batched engine (osqp_tpu.batch_shared):
run ``K`` ADMM iterations for a tile of instances entirely in VMEM.  Because
``P``/``A`` (hence ``Minv``/``M``) are shared across the batch, every
per-iteration contraction is a true 2-D matmul on the MXU::

    RHS = sigma X - Q + A' (rho * B2)        (n,m) @ (m,TB)
    Xt  = Minv @ RHS (+ one refinement)      (n,n) @ (n,TB)
    AXt = A @ Xt                             (m,n) @ (n,TB)

and the ~9 elementwise updates per iteration run on the VPU without ever
leaving VMEM.  The unfused path pays one HBM round trip per op per
iteration (~15 arrays x (feature,B) x 25 iterations per epoch); this kernel
pays exactly one read and one write of the state per *epoch*.

Layout: instance-last ``(feature, B)`` so the batch is the 128-lane axis.
Grid is 1-D over batch tiles; the small shared matrices are re-fetched per
tile (they are KBs).  Feature dims are zero-padded to sublane multiples and
the batch to lane multiples by the caller (osqp_tpu/batch_shared.py pads
once per solve, not per epoch).

Reference semantics: the iteration body is the same math as
``batch_shared.shared_solve``'s ``iteration`` (ref algorithm spec:
/root/reference/src/osqppurepy/_osqp.py:644-703), pinned by
tests/test_shared_batch.py::test_fused_epoch_equivalence.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, k: int) -> int:
    return -(-x // k) * k


def _epoch_kernel(
    scal_ref,  # SMEM (3,): [sigma, alpha, K]
    A_ref,  # (m, n)
    At_ref,  # (n, m)
    Minv_ref,  # (n, n)
    M_ref,  # (n, n)
    rho_ref,  # (m, 1)
    rhoinv_ref,  # (m, 1)
    Q_ref,  # (n, TB)
    L_ref,  # (m, TB)
    U_ref,  # (m, TB)
    X_ref,  # (n, TB)
    Z_ref,  # (m, TB)
    Y_ref,  # (m, TB)
    Xo_ref,  # (n, TB)
    Zo_ref,  # (m, TB)
    Yo_ref,  # (m, TB)
    dXo_ref,  # (n, TB)
    dYo_ref,  # (m, TB)
):
    dtype = X_ref.dtype
    sigma = scal_ref[0].astype(dtype)
    alpha = scal_ref[1].astype(dtype)
    K = scal_ref[2].astype(jnp.int32)

    A = A_ref[:]
    At = At_ref[:]
    Minv = Minv_ref[:]
    M = M_ref[:]
    rho = rho_ref[:]  # (m, 1) broadcasts over lanes
    rhoinv = rhoinv_ref[:]
    Q = Q_ref[:]
    L = L_ref[:]
    U = U_ref[:]

    mm = functools.partial(jnp.dot, preferred_element_type=dtype)

    def body(_, carry):
        X, Z, Y, dX, dY = carry
        B2 = Z - rhoinv * Y
        RHS = sigma * X - Q + mm(At, rho * B2)
        Xt = mm(Minv, RHS)
        Xt = Xt + mm(Minv, RHS - mm(M, Xt))  # one iterative-refinement step
        AXt = mm(A, Xt)
        NU = rho * (AXt - B2)
        Zt = Z + rhoinv * (NU - Y)
        Xn = alpha * Xt + (1 - alpha) * X
        Zr = alpha * Zt + (1 - alpha) * Z
        Zn = jnp.clip(Zr + rhoinv * Y, L, U)
        dYn = rho * (Zr - Zn)
        Yn = Y + dYn
        return Xn, Zn, Yn, Xn - X, dYn

    zX = jnp.zeros(X_ref.shape, dtype)
    zY = jnp.zeros(Y_ref.shape, dtype)
    X, Z, Y, dX, dY = jax.lax.fori_loop(
        0, K, body, (X_ref[:], Z_ref[:], Y_ref[:], zX, zY)
    )
    Xo_ref[:] = X
    Zo_ref[:] = Z
    Yo_ref[:] = Y
    dXo_ref[:] = dX
    dYo_ref[:] = dY


def _pick_tile(n8: int, m8: int, Bp: int) -> int:
    """Largest lane tile keeping estimated VMEM usage comfortable.

    Live buffers per program: ~6 input + 5 output + ~10 loop temporaries of
    (feature, TB); bound by 21 * max(n8, m8) * TB * itemsize <= ~10 MB.
    """
    feat = max(n8, m8, 8)
    for tb in (4096, 2048, 1024, 512, 256, 128):
        if tb <= Bp and 21 * feat * tb * 4 <= 10 * 1024 * 1024:
            return tb
    return 128


def shared_epoch_pallas(
    A, At, Minv, M, rho_vec, rho_inv, Q, L, U, X, Z, Y, sigma, alpha, K,
    *, interpret: bool = False,
):
    """Run K fused ADMM iterations.  All arrays pre-padded: feature dims to
    multiples of 8, batch to a multiple of 128.  Returns (X, Z, Y, dX, dY).
    """
    n, B = Q.shape
    m = L.shape[0]
    dtype = Q.dtype
    TB = _pick_tile(n, m, B)
    grid = (B // TB,)

    scalars = jnp.stack(
        [
            jnp.asarray(sigma, jnp.float32),
            jnp.asarray(alpha, jnp.float32),
            jnp.asarray(K, jnp.float32),
        ]
    )

    def fixed(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    def tiled(feat):
        return pl.BlockSpec((feat, TB), lambda i: (0, i), memory_space=pltpu.VMEM)

    out_shapes = [
        jax.ShapeDtypeStruct((n, B), dtype),  # X
        jax.ShapeDtypeStruct((m, B), dtype),  # Z
        jax.ShapeDtypeStruct((m, B), dtype),  # Y
        jax.ShapeDtypeStruct((n, B), dtype),  # dX
        jax.ShapeDtypeStruct((m, B), dtype),  # dY
    ]
    out_specs = [tiled(n), tiled(m), tiled(m), tiled(n), tiled(m)]

    return pl.pallas_call(
        _epoch_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
            fixed((m, n)),
            fixed((n, m)),
            fixed((n, n)),
            fixed((n, n)),
            fixed((m, 1)),
            fixed((m, 1)),
            tiled(n),  # Q
            tiled(m),  # L
            tiled(m),  # U
            tiled(n),  # X
            tiled(m),  # Z
            tiled(m),  # Y
        ],
        out_shape=out_shapes,
        out_specs=out_specs,
        interpret=interpret,
    )(
        scalars, A, At, Minv, M,
        rho_vec.reshape(m, 1), rho_inv.reshape(m, 1),
        Q, L, U, X, Z, Y,
    )
