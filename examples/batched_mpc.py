"""TPU-native: solve thousands of same-structure QPs per chip (the batched
MPC/scenario workload).

Passing UNBATCHED P and A (the condensed-MPC scenario: one plant, many
initial states) auto-selects the shared-structure engine, where every
ADMM iteration is a handful of dense MXU matmuls over the whole batch
(~240k solves/s on one TPU v5e chip).  Batched P/A select the general
vmapped engine instead."""

import numpy as np

from osqp_tpu.batch import BatchedOSQP

B, n, m = 512, 32, 48
rng = np.random.default_rng(0)
L = rng.standard_normal((n, n)) / np.sqrt(n)
P = L @ L.T + 0.1 * np.eye(n)          # shared plant
A = rng.standard_normal((m, n)) / np.sqrt(n)
q = rng.standard_normal((B, n))        # per-instance costs
x0 = rng.standard_normal((B, n))
s0 = rng.random((B, m)) + 0.1
u = x0 @ A.T + s0                      # per-instance bounds
l = u - 2 * s0

solver = BatchedOSQP()
solver.setup(P, q, A, l, u, eps_abs=1e-4, eps_rel=1e-4)
print('engine:', solver._engine)
res = solver.solve()
print(f'solved {int((res.info.status_val == 1).sum())}/{B} instances, '
      f'mean iters {res.info.iter.mean():.0f}, '
      f'solve_time {res.info.solve_time * 1e3:.1f} ms')

# MPC loop: perturb costs, warm re-solve (fused update+solve, one dispatch)
for step in range(3):
    solver.update(q=q + 0.01 * rng.standard_normal((B, n)))
    res = solver.solve()
    print(f'step {step}: mean warm iters {res.info.iter.mean():.1f}')
