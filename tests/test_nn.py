"""Differentiable layers (coverage model: reference src/osqp/tests/nn_test.py -
layer gradients vs finite differences), plus the idiomatic JAX layer."""

import numpy as np
import numpy.testing as npt
import pytest
import scipy.sparse as spa

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp

from osqp_tpu.nn.layer import make_qp_layer
from osqp_tpu.nn.torch import OSQP as TorchOSQP

from utils import f32_device, solve_eps

# On the f32 chip rows: reachable solver eps, larger FD step (the FD
# quotient differentiates THROUGH the f32 solver), looser match
_EPS = solve_eps(1e-10, f32=2e-6)
_FD_H = 1e-2 if f32_device() else 1e-6
_FD_TOL = dict(rtol=5e-2, atol=5e-2) if f32_device() else dict(rtol=5e-3, atol=5e-3)
_MAX_ITER = 20000 if f32_device() else 100000


def _problem(B, n, m, seed=1):
    npr = np.random.RandomState(seed)
    L = npr.randn(n, n)
    P = spa.coo_matrix(np.triu(L @ L.T + 0.5 * np.eye(n)))
    A = spa.coo_matrix(npr.randn(m, n))
    q = npr.randn(B, n)
    x0 = npr.randn(B, n)
    s0 = npr.rand(B, m)
    u = np.einsum('mn,bn->bm', A.toarray(), x0) + s0
    l = u - 2 * s0
    true_x = npr.randn(B, n)
    return P, A, q, l, u, true_x


def test_torch_layer_gradients():
    B, n, m = 3, 6, 4
    P, A, q, l, u, true_x = _problem(B, n, m)
    P_idx, A_idx = (P.row, P.col), (A.row, A.col)
    layer = TorchOSQP(P_idx, P.shape, A_idx, A.shape, eps_rel=_EPS, eps_abs=_EPS, max_iter=_MAX_ITER)

    P_val = torch.tensor(np.tile(P.data, (B, 1)), dtype=torch.float64, requires_grad=True)
    q_val = torch.tensor(q, dtype=torch.float64, requires_grad=True)
    A_val = torch.tensor(np.tile(A.data, (B, 1)), dtype=torch.float64, requires_grad=True)
    l_val = torch.tensor(l, dtype=torch.float64, requires_grad=True)
    u_val = torch.tensor(u, dtype=torch.float64, requires_grad=True)
    true = torch.tensor(true_x, dtype=torch.float64)

    x = layer(P_val, q_val, A_val, l_val, u_val)
    assert x.shape == (B, n)
    loss = 0.5 * ((x - true) ** 2).sum()
    loss.backward()

    def f(qv):
        with torch.no_grad():
            xx = layer(P_val.detach(), torch.tensor(qv), A_val.detach(), l_val.detach(), u_val.detach())
            return float(0.5 * ((xx - true) ** 2).sum())

    eps = _FD_H
    for (b, i) in [(0, 1), (1, 2), (2, 4)]:
        qp_ = q.copy()
        qp_[b, i] += eps
        qm = q.copy()
        qm[b, i] -= eps
        fd = (f(qp_) - f(qm)) / (2 * eps)
        npt.assert_allclose(q_val.grad.numpy()[b, i], fd, **_FD_TOL)


def test_torch_layer_unbatched():
    B, n, m = 1, 5, 3
    P, A, q, l, u, true_x = _problem(B, n, m, seed=2)
    P_idx, A_idx = (P.row, P.col), (A.row, A.col)
    layer = TorchOSQP(P_idx, P.shape, A_idx, A.shape,
                      eps_rel=solve_eps(1e-8), eps_abs=solve_eps(1e-8))
    x = layer(
        torch.tensor(P.data, dtype=torch.float64),
        torch.tensor(q[0], dtype=torch.float64),
        torch.tensor(A.data, dtype=torch.float64),
        torch.tensor(l[0], dtype=torch.float64),
        torch.tensor(u[0], dtype=torch.float64),
    )
    assert x.shape == (n,)


def test_jax_layer_gradients():
    B, n, m = 2, 6, 4
    npr = np.random.RandomState(0)
    L = npr.randn(B, n, n)
    P = 0.1 * np.einsum('bij,bkj->bik', L, L) + 0.2 * np.eye(n)
    q = npr.randn(B, n)
    A = npr.randn(B, m, n)
    x0 = npr.randn(B, n)
    s0 = npr.rand(B, m)
    u = np.einsum('bmn,bn->bm', A, x0) + s0
    l = u - 2 * s0
    true_x = npr.randn(B, n)

    dt = jnp.float32 if f32_device() else jnp.float64
    layer = make_qp_layer(dtype=dt, eps_abs=_EPS, eps_rel=_EPS, max_iter=_MAX_ITER)
    f = lambda v: jnp.asarray(v, dt)

    def loss(P_, q_, A_, l_, u_):
        x = layer(P_, q_, A_, l_, u_)
        return 0.5 * jnp.sum((x - f(true_x)) ** 2)

    g = jax.grad(loss, argnums=(1, 3))(f(P), f(q), f(A), f(l), f(u))
    gq, gl = np.asarray(g[0]), np.asarray(g[1])

    eps = _FD_H
    b, i = 1, 2
    qp_ = q.copy()
    qp_[b, i] += eps
    qm = q.copy()
    qm[b, i] -= eps
    fd = (float(loss(f(P), f(qp_), f(A), f(l), f(u))) - float(loss(f(P), f(qm), f(A), f(l), f(u)))) / (2 * eps)
    npt.assert_allclose(gq[b, i], fd, **_FD_TOL)


def test_jax_layer_vmap_jit():
    """The layer composes with jit and grad (vmap is internal)."""
    B, n, m = 2, 4, 3
    npr = np.random.RandomState(3)
    L = npr.randn(B, n, n)
    P = 0.1 * np.einsum('bij,bkj->bik', L, L) + 0.5 * np.eye(n)
    q = npr.randn(B, n)
    A = npr.randn(B, m, n)
    u = np.abs(npr.randn(B, m)) + 1
    l = -u
    dt = jnp.float32 if f32_device() else jnp.float64
    layer = make_qp_layer(dtype=dt, eps_abs=solve_eps(1e-8), eps_rel=solve_eps(1e-8))
    f = lambda v: jnp.asarray(v, dt)
    g = jax.jit(jax.grad(lambda q_: jnp.sum(layer(f(P), q_, f(A), f(l), f(u)) ** 2)))(f(q))
    assert np.all(np.isfinite(np.asarray(g)))
