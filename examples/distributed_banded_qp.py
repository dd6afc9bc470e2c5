"""One banded QP sharded across a device mesh with halo-exchange matvecs.

`parallel.banded` shards EVERYTHING — x included — into contiguous row
blocks with local DIA bands; each matvec exchanges only a bandwidth-wide
halo with mesh neighbors (`lax.ppermute`), so per-CG-iteration interconnect
traffic is O(bandwidth) (~64 bytes here) instead of O(n), and memory scales
linearly with the mesh.  Iteration counts are identical at every mesh size:
the mesh only changes where rows live.

Run anywhere with a virtual mesh:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/distributed_banded_qp.py
"""

import numpy as np
import scipy.sparse as sparse

import os

if '--xla_force_host_platform_device_count' not in os.environ.get('XLA_FLAGS', ''):
    os.environ['XLA_FLAGS'] = (
        os.environ.get('XLA_FLAGS', '') + ' --xla_force_host_platform_device_count=8'
    )

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from osqp_tpu.parallel import banded_qp_setup, banded_qp_solve

# The demo targets a multi-device mesh; default to the (forced-count) CPU
# platform so it runs anywhere.  On a real TPU slice, set
# OSQP_TPU_EXAMPLE_PLATFORM=tpu.  NOTE: some jax builds ignore the
# JAX_PLATFORMS env var — the config API always works.
jax.config.update('jax_platforms', os.environ.get('OSQP_TPU_EXAMPLE_PLATFORM', 'cpu'))
jax.config.update('jax_enable_x64', True)

devices = jax.devices()
J = min(8, len(devices))
mesh = Mesh(np.array(devices[:J]).reshape(J), ('mp',))
print(f'mesh: mp={J}')

n = 1024 * J
rng = np.random.default_rng(0)
P = sparse.diags([np.full(n, 2.0), np.full(n - 1, -0.8), np.full(n - 1, -0.8)],
                 [0, 1, -1]).tocsc()
q = rng.standard_normal(n)
A = (sparse.eye(n) + sparse.diags([np.full(n - 2, 0.4)], [2], shape=(n, n))).tocsc()
x0 = rng.standard_normal(n)
s0 = rng.random(n) + 0.1
u = A @ x0 + s0
l = u - 2 * s0

data = banded_qp_setup(P, q, A, l, u, J, dtype=jnp.float64)
# polish accepts only when it strictly improves BOTH residuals; with a
# loose ADMM tolerance there is room for it to do so
res = banded_qp_solve(mesh, data, eps_abs=1e-3, eps_rel=1e-3, check_every=5,
                      polish=True)
print(f'status={int(res.status)} iters={int(res.iters)} '
      f'polish={int(res.status_polish)} obj={float(res.obj_val):.6f}')
print(f'pri_res={float(res.pri_res):.2e} dua_res={float(res.dua_res):.2e}')
