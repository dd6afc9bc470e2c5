"""Warm MPC rollout on a DISTRIBUTED banded QP.

The single-chip MPC hot loop is `update(q=...)` + warm `solve()`
(examples/update_vectors.py; reference src/osqp/interface.py:330-368).
This example runs the same workload on the fully-sharded banded huge-QP
mode: a `lax.scan` carries the scaled iterates between steps, so ALL the
rollout's solves execute as ONE device program — no host roundtrips
between control steps — while every vector (x included) stays sharded
across the mesh and matvecs exchange only bandwidth-wide halos.

Runs on a virtual 8-device CPU mesh; on real hardware drop the platform
forcing and the same code spans the chips of a slice.
"""

import os

if 'XLA_FLAGS' not in os.environ:
    os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'

import numpy as np
import scipy.sparse as sparse

import jax

# Default: virtual CPU mesh (set OSQP_TPU_EXAMPLE_DEVICE=tpu on a real
# multi-chip slice).  Checking jax.devices() here would INITIALIZE the
# backend before the platform could be forced.
if os.environ.get('OSQP_TPU_EXAMPLE_DEVICE', 'cpu') != 'tpu':
    jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
from jax.sharding import Mesh

from osqp_tpu.parallel import (
    banded_mpc_rollout,
    banded_qp_setup,
    banded_qp_update_vec,
)

J = 8
n = 4096  # variables; scale freely — memory and comms are fully sharded
T = 12    # MPC horizon steps

rng = np.random.default_rng(0)
# tridiagonal P (double-integrator chain), banded A (dynamics + bounds)
P = sparse.diags(
    [np.full(n, 2.0), np.full(n - 1, -0.8), np.full(n - 1, -0.8)], [0, 1, -1]
).tocsc()
A = (sparse.eye(n) + sparse.diags([np.full(n - 2, 0.4)], [2], shape=(n, n))).tocsc()
q0 = rng.standard_normal(n)
x_ref = rng.standard_normal(n)
s0 = rng.random(n) + 0.1
u = A @ x_ref + s0
l = u - 2 * s0

mesh = Mesh(np.array(jax.devices()[:J]).reshape(J), ('mp',))
data = banded_qp_setup(P, q0, A, l, u, J, dtype=jnp.float32)

# a drifting cost sequence (tracking a moving reference)
q_seq = q0[None] + 0.02 * np.cumsum(rng.standard_normal((T, n)), axis=0)

roll = banded_mpc_rollout(mesh, data, q_seq, eps_abs=1e-3, eps_rel=1e-3)
print('statuses:', np.asarray(roll.status))
print('iters per step:', np.asarray(roll.iters))
print('objective trajectory:', np.round(np.asarray(roll.obj_val), 3))

# bounds changed mid-mission? update in O(n) host work (cached scaling,
# re-typed rho, refreshed preconditioner) and chain the warm carries:
data2 = banded_qp_update_vec(data, l=l - 0.05, u=u + 0.05)
roll2 = banded_mpc_rollout(
    mesh, data2, q_seq[-1:] ,
    x0=roll.x_carry, z0=roll.z_carry, y0=roll.y_carry,
    eps_abs=1e-3, eps_rel=1e-3,
)
print('after bound update, warm re-solve iters:', int(roll2.iters[0]))
