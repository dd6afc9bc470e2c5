"""Differentiable torch layer with reference API parity.

Mirrors the reference ``osqp.nn.torch.OSQP`` module surface
(reference src/osqp/nn/torch.py:22-57: constructor
``OSQP(P_idx, P_shape, A_idx, A_shape, eps_rel, eps_abs, verbose, max_iter,
algebra, solver_type)``, ``forward(P_val, q_val, A_val, l_val, u_val)``
returning the batch of primal solutions).

Where the reference fans out per-instance C solvers over a joblib thread pool
(ref nn/torch.py:200-217), this implementation stacks the batch into dense
arrays and solves every instance simultaneously with the vmapped TPU ADMM
core; the backward pass runs the whole batch's masked adjoint KKT systems
as one vmapped device computation (shared with the JAX layer,
osqp_tpu/nn/layer.py::_adjoint_system).
"""

from __future__ import annotations

import numpy as np

import torch
from torch.nn import Module
from torch.autograd import Function


# Constructor surface shared with the reference layer (API contract).
_LAYER_OPTS = ('P_idx', 'P_shape', 'A_idx', 'A_shape', 'eps_rel', 'eps_abs',
               'verbose', 'max_iter', 'algebra', 'solver_type')

# jitted batched-adjoint executables, keyed by refine count (jax.jit
# re-specializes per shape/dtype internally).  Without the jit, the eager
# vmap dispatches the adjoint op-by-op — ~50 ms/op over a remote-device
# tunnel.
_ADJOINT_JIT = {}


def _batched_adjoint(refine_iters):
    if refine_iters not in _ADJOINT_JIT:
        import jax
        import jax.numpy as jnp

        from .layer import _adjoint_system

        @jax.jit
        def f(P, A, l, u, x, y, dx, delta):
            def one(P1, A1, l1, u1, x1, y1, dx1):
                return _adjoint_system(P1, A1, l1, u1, x1, y1, dx1,
                                       jnp.zeros_like(y1), delta, refine_iters)

            return jax.vmap(one)(P, A, l, u, x, y, dx)

        _ADJOINT_JIT[refine_iters] = f
    return _ADJOINT_JIT[refine_iters]


def to_numpy(t):
    """Detach a torch tensor to numpy; None passes through, empty -> empty."""
    if t is None:
        return None
    return np.empty(0) if t.nelement() == 0 else t.detach().cpu().numpy()


def _solver_dtype():
    """Solver precision policy: float64 only where it is NATIVE (CPU with
    x64 enabled); float32 on accelerators, where f64 is emulated and would
    crawl on the very hardware this layer targets.  Override with
    ``OSQP_TPU_NN_DTYPE=float32|float64``."""
    import os

    import jax
    import jax.numpy as jnp

    forced = os.environ.get('OSQP_TPU_NN_DTYPE')
    if forced == 'float32':
        return jnp.float32
    if forced == 'float64':
        return jnp.float64
    if jax.config.jax_enable_x64 and jax.default_backend() == 'cpu':
        return jnp.float64
    return jnp.float32


class OSQP(Module):
    def __init__(self, P_idx, P_shape, A_idx, A_shape, eps_rel=1e-5,
                 eps_abs=1e-5, verbose=False, max_iter=10000, algebra=None,
                 solver_type='direct'):
        super().__init__()
        cfg = locals()
        for name in _LAYER_OPTS:
            setattr(self, name, cfg[name])

    def forward(self, P_val, q_val, A_val, l_val, u_val):
        fn = _OSQP_Fn(**{name: getattr(self, name) for name in _LAYER_OPTS})
        return fn(P_val, q_val, A_val, l_val, u_val)


def _OSQP_Fn(P_idx, P_shape, A_idx, A_shape, eps_rel, eps_abs, verbose, max_iter,
             algebra, solver_type):
    m, n = A_shape

    class _OSQP_FnFn(Function):
        @staticmethod
        def forward(ctx, P_val, q_val, A_val, l_val, u_val):
            """Solve a batch of QPs (see class docstring)."""
            params = [P_val, q_val, A_val, l_val, u_val]
            for p in params:
                assert p.ndimension() <= 2, 'parameters must be vectors or batches of vectors'
            batch_mode = any(t.ndimension() > 1 for t in params)
            n_batch = max(t.size(0) if t.ndimension() == 2 else 1 for t in params) if batch_mode else 1

            dtype = P_val.dtype
            device = P_val.device

            params = [
                p.unsqueeze(0).expand(n_batch, p.size(0)) if p.ndimension() == 1 else p
                for p in params
            ]
            P_val_b, q_val_b, A_val_b, l_val_b, u_val_b = params
            assert A_val_b.size(1) == len(A_idx[0]), 'A_val length must match the A_idx pattern'
            assert P_val_b.size(1) == len(P_idx[0]), 'P_val length must match the P_idx pattern'

            # densify the batch (vectorized scatter: the pattern is shared,
            # so one fancy-index assignment replaces B csc_matrix builds)
            P_np = np.zeros((n_batch, n, n))
            A_np = np.zeros((n_batch, m, n))
            Pv = to_numpy(P_val_b)
            Av = to_numpy(A_val_b)
            np.add.at(P_np, (slice(None), P_idx[0], P_idx[1]), Pv)
            np.add.at(A_np, (slice(None), A_idx[0], A_idx[1]), Av)
            # symmetrize triu-style input the same way the solver does
            P_sym = np.triu(P_np) + np.transpose(np.triu(P_np, 1), (0, 2, 1))
            q_np = to_numpy(q_val_b)
            l_np = to_numpy(l_val_b)
            u_np = to_numpy(u_val_b)

            from ..batch import BatchedOSQP

            solver = BatchedOSQP(dtype=_solver_dtype())
            solver.setup(
                P_sym, q_np, A_np, l_np, u_np,
                verbose=verbose, eps_abs=eps_abs, eps_rel=eps_rel, max_iter=max_iter,
                solver_type=solver_type,
            )
            res = solver.solve()
            for i, status in enumerate(res.info.status_val):
                if status != 1:
                    raise RuntimeError(f'Unable to solve QP, status: {res.info.status[i]}')

            ctx.save_for_backward(P_val_b, q_val_b, A_val_b, l_val_b, u_val_b)
            ctx.sol_x = res.x
            ctx.sol_y = res.y
            ctx.P_np, ctx.A_np = P_sym, A_np
            ctx.l_np, ctx.u_np = l_np, u_np

            x_torch = torch.from_numpy(res.x).to(dtype=dtype, device=device)
            return x_torch if batch_mode else x_torch.squeeze(0)

        @staticmethod
        def backward(ctx, dl_dx_val):
            # The whole batch's adjoint KKT systems run as ONE vmapped
            # device computation (the same masked adjoint the JAX layer
            # uses) instead of B sequential scipy factorizations — the
            # reference loops per instance over joblib threads instead
            # (ref nn/torch.py:200-217).
            import jax.numpy as jnp

            dtype = dl_dx_val.dtype
            device = dl_dx_val.device
            batch_mode = dl_dx_val.ndimension() == 2
            if not batch_mode:
                dl_dx_val = dl_dx_val.unsqueeze(0)
            dl_dx = to_numpy(dl_dx_val)

            dt = _solver_dtype()
            # same f32 delta floor as make_qp_layer (1e-6 NaNs f32 Cholesky)
            delta = jnp.asarray(1e-4 if dt == jnp.float32 else 1e-9, dt)
            f = lambda v: jnp.asarray(v, dt)

            dPs, dqs, dAs, dls, dus = _batched_adjoint(8)(
                f(ctx.P_np), f(ctx.A_np), f(ctx.l_np), f(ctx.u_np),
                f(ctx.sol_x), f(ctx.sol_y), f(dl_dx), delta,
            )
            dPs = np.asarray(dPs, np.float64)
            # triu-gradient convention: an off-diagonal pattern entry
            # receives both symmetric halves of the full dP
            dP_full = dPs + dPs.transpose(0, 2, 1)
            ar = np.arange(n)
            dP_full[:, ar, ar] -= dPs[:, ar, ar]
            dP = dP_full[:, P_idx[0], P_idx[1]]
            dA = np.asarray(dAs, np.float64)[:, A_idx[0], A_idx[1]]
            dq = np.asarray(dqs, np.float64)
            dl = np.asarray(dls, np.float64)
            du = np.asarray(dus, np.float64)

            grads = [
                torch.from_numpy(g).to(dtype=dtype, device=device)
                for g in (dP, dq, dA, dl, du)
            ]
            if not batch_mode:
                grads = [g.squeeze(0) for g in grads]
            return tuple(grads)

    return _OSQP_FnFn.apply
