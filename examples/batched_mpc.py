"""TPU-native: solve thousands of same-structure QPs per chip (the batched
MPC/scenario workload) with the vmapped ADMM solver."""

import numpy as np

from osqp_tpu.batch import BatchedOSQP

B, n, m = 512, 32, 48
rng = np.random.default_rng(0)
L = rng.standard_normal((B, n, n)) / np.sqrt(n)
P = np.einsum('bij,bkj->bik', L, L) + 0.1 * np.eye(n)
q = rng.standard_normal((B, n))
A = rng.standard_normal((B, m, n)) / np.sqrt(n)
x0 = rng.standard_normal((B, n))
s0 = rng.random((B, m)) + 0.1
u = np.einsum('bmn,bn->bm', A, x0) + s0
l = u - 2 * s0

solver = BatchedOSQP()
solver.setup(P, q, A, l, u, eps_abs=1e-4, eps_rel=1e-4)
res = solver.solve()
print(f'solved {int((res.info.status_val == 1).sum())}/{B} instances, '
      f'mean iters {res.info.iter.mean():.0f}, '
      f'solve_time {res.info.solve_time * 1e3:.1f} ms')

# MPC loop: perturb costs, warm re-solve (fused update+solve, one dispatch)
for step in range(3):
    solver.update(q=q + 0.01 * rng.standard_normal((B, n)))
    res = solver.solve()
    print(f'step {step}: mean warm iters {res.info.iter.mean():.1f}')
