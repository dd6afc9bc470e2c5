"""TPU-native: differentiable QP layer inside a JAX training loop."""

import jax
import jax.numpy as jnp
import numpy as np

from osqp_tpu.nn.layer import make_qp_layer

B, n, m = 8, 6, 4
rng = np.random.default_rng(0)
L = rng.standard_normal((B, n, n))
P = 0.1 * np.einsum('bij,bkj->bik', L, L) + 0.2 * np.eye(n)
A = rng.standard_normal((B, m, n))
x0 = rng.standard_normal((B, n))
s0 = rng.random((B, m))
u = np.einsum('bmn,bn->bm', A, x0) + s0
l = u - 2 * s0
target = rng.standard_normal((B, n))

dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
layer = make_qp_layer(dtype=dtype, eps_abs=1e-8, eps_rel=1e-8)
f = lambda v: jnp.asarray(v, dtype)

q = jnp.zeros((B, n), dtype)


@jax.jit
def loss_fn(q):
    x = layer(f(P), q, f(A), f(l), f(u))
    return 0.5 * jnp.mean((x - f(target)) ** 2)


grad_fn = jax.jit(jax.grad(loss_fn))
for step in range(5):
    g = grad_fn(q)
    q = q - 0.5 * g
    print(f'step {step}: loss = {float(loss_fn(q)):.6f}')
