"""Basic usage (parity with reference examples/basic_usage.py)."""

import numpy as np
from scipy import sparse

import osqp_tpu as osqp

# Define problem data
P = sparse.csc_matrix([[4, 1], [1, 2]])
q = np.array([1, 1])
A = sparse.csc_matrix([[1, 1], [1, 0], [0, 1]])
l = np.array([1, 0, 0])
u = np.array([1, 0.7, 0.7])

# Create an OSQP object, setup workspace, solve
prob = osqp.OSQP()
prob.setup(P, q, A, l, u, verbose=True)
res = prob.solve(raise_error=True)

print('status:', res.info.status)
print('x =', res.x)
print('objective =', res.info.obj_val)
