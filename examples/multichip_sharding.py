"""TPU-native: multi-chip QP solving over a device mesh.

Run with real chips, or simulate on CPU:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    OSQP_TPU_DEVICE=cpu python examples/multichip_sharding.py
"""

import numpy as np

import jax
from jax.sharding import Mesh

from osqp_tpu.parallel.sharded import dp_mp_solve

devices = jax.devices()
if len(devices) < 2:
    devices = jax.devices('cpu')
n_dev = len(devices)
dp = max(n_dev // 2, 1)
mp = n_dev // dp
mesh = Mesh(np.array(devices[: dp * mp]).reshape(dp, mp), ('dp', 'mp'))
print('mesh:', dict(zip(mesh.axis_names, mesh.devices.shape)))

B = 2 * dp  # QP instances, sharded over dp
n = 16
m = 8 * mp  # constraint rows, sharded over mp
rng = np.random.default_rng(0)
L = rng.standard_normal((B, n, n))
P = 0.1 * np.einsum('bij,bkj->bik', L, L) + 0.1 * np.eye(n)
q = rng.standard_normal((B, n))
A = rng.standard_normal((B, m, n))
x0 = rng.standard_normal((B, n))
s0 = rng.random((B, m))
u = np.einsum('bmn,bn->bm', A, x0) + s0
l = u - 2 * s0

res = dp_mp_solve(mesh, P, q, A, l, u, eps_abs=1e-6, eps_rel=1e-6, max_iter=10000)
print('statuses:', np.asarray(res.status), 'iters:', np.asarray(res.iters))
print('objectives:', np.asarray(res.obj_val))
