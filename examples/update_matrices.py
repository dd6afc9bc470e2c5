"""Matrix value updates at fixed sparsity (parity with reference
examples/update_matrices.py)."""

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
print('first solve:', res.x)

# New values on the SAME sparsity patterns (triu for P)
P_new = sparse.triu(sparse.csc_matrix([[5, 1.5], [1.5, 1]]), format='csc')
A_new = sparse.csc_matrix([[1.2, 1.1], [1.5, 0], [0, 0.8]])
prob.update(Px=P_new.data, Ax=A_new.data)
res = prob.solve()
print('after matrix update:', res.x)
