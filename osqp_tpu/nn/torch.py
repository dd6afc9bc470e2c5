"""Differentiable torch layer with reference API parity.

Mirrors the reference ``osqp.nn.torch.OSQP`` module surface
(reference src/osqp/nn/torch.py:22-57: constructor
``OSQP(P_idx, P_shape, A_idx, A_shape, eps_rel, eps_abs, verbose, max_iter,
algebra, solver_type)``, ``forward(P_val, q_val, A_val, l_val, u_val)``
returning the batch of primal solutions).

Where the reference fans out per-instance C solvers over a joblib thread pool
(ref nn/torch.py:200-217), this implementation stacks the batch into dense
arrays and solves every instance simultaneously with the vmapped TPU ADMM
core; the backward pass evaluates the adjoint KKT systems per instance
(osqp_tpu/solver/derivatives.py).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as spa

import torch
from torch.nn import Module
from torch.autograd import Function


# Constructor surface shared with the reference layer (API contract).
_LAYER_OPTS = ('P_idx', 'P_shape', 'A_idx', 'A_shape', 'eps_rel', 'eps_abs',
               'verbose', 'max_iter', 'algebra', 'solver_type')


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
                assert p.ndimension() <= 2, 'Unexpected number of dimensions'
            batch_mode = any(t.ndimension() > 1 for t in params)
            n_batch = max(t.size(0) if t.ndimension() == 2 else 1 for t in params) if batch_mode else 1

            dtype = P_val.dtype
            device = P_val.device

            params = [
                p.unsqueeze(0).expand(n_batch, p.size(0)) if p.ndimension() == 1 else p
                for p in params
            ]
            P_val_b, q_val_b, A_val_b, l_val_b, u_val_b = params
            assert A_val_b.size(1) == len(A_idx[0]), 'Unexpected size of A'
            assert P_val_b.size(1) == len(P_idx[0]), 'Unexpected size of P'

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
            ctx.n_batch, ctx.batch_mode = n_batch, batch_mode

            x_torch = torch.from_numpy(res.x).to(dtype=dtype, device=device)
            return x_torch if batch_mode else x_torch.squeeze(0)

        @staticmethod
        def backward(ctx, dl_dx_val):
            from ..solver.derivatives import adjoint_derivative

            dtype = dl_dx_val.dtype
            device = dl_dx_val.device
            batch_mode = dl_dx_val.ndimension() == 2
            if not batch_mode:
                dl_dx_val = dl_dx_val.unsqueeze(0)
            n_batch = dl_dx_val.size(0)
            dl_dx = to_numpy(dl_dx_val)

            nnz_P = len(P_idx[0])
            nnz_A = len(A_idx[0])
            dP = np.zeros((n_batch, nnz_P))
            dq = np.zeros((n_batch, n))
            dA = np.zeros((n_batch, nnz_A))
            dl = np.zeros((n_batch, m))
            du = np.zeros((n_batch, m))

            for i in range(n_batch):
                d = adjoint_derivative(
                    spa.csc_matrix(ctx.P_np[i]),
                    None,
                    spa.csc_matrix(ctx.A_np[i]),
                    ctx.l_np[i],
                    ctx.u_np[i],
                    ctx.sol_x[i],
                    ctx.sol_y[i],
                    dx=dl_dx[i],
                    dy=None,
                )
                dq[i] = d['dq']
                dl[i] = d['dl']
                du[i] = d['du']
                dP_full = d['dP'] + d['dP'].T - np.diag(np.diag(d['dP']))
                dP[i] = dP_full[P_idx[0], P_idx[1]]
                dA[i] = d['dA'][A_idx[0], A_idx[1]]

            grads = [
                torch.from_numpy(g).to(dtype=dtype, device=device)
                for g in (dP, dq, dA, dl, du)
            ]
            if not batch_mode:
                grads = [g.squeeze(0) for g in grads]
            return tuple(grads)

    return _OSQP_FnFn.apply
