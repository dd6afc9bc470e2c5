"""Vector updates without re-setup (parity with reference
examples/update_vectors.py): the MPC pattern."""

import numpy as np
from scipy import sparse

import osqp_tpu as osqp

P = sparse.csc_matrix([[4, 1], [1, 2]])
q = np.array([1, 1])
A = sparse.csc_matrix([[1, 1], [1, 0], [0, 1]])
l = np.array([1, 0, 0])
u = np.array([1, 0.7, 0.7])

prob = osqp.OSQP()
prob.setup(P, q, A, l, u, verbose=False)
res = prob.solve()
print('first solve:', res.x, res.info.iter, 'iters')

# Update the cost and bounds in place; the cached scaling and factorization
# are reused and the solve warm-starts from the previous solution.
prob.update(q=np.array([2, 3]), l=np.array([2, -1, -1]), u=np.array([2, 2.5, 2.5]))
res = prob.solve()
print('after update:', res.x, res.info.iter, 'iters')
