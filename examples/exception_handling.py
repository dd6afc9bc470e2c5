"""Error handling (parity with reference examples/exception_handling.py)."""

import numpy as np
from scipy import sparse

import osqp_tpu as osqp
from osqp_tpu import OSQPException, SolverError, SolverStatus

P = sparse.csc_matrix(np.eye(1))
q = np.zeros(1)
A = sparse.csc_matrix([[1.0], [1.0]])

# Invalid data: l > u elementwise -> data validation error at setup
prob = osqp.OSQP()
try:
    prob.setup(P, q, A, np.array([1.0, 1.0]), np.array([2.0, -1.0]), verbose=False)
except OSQPException as e:
    assert e == SolverError.OSQP_DATA_VALIDATION_ERROR
    print('validation error:', SolverError(e.args[0]).name)

# Infeasible problem (x in [1,2] and x in [-2,-1]) -> exception at solve
prob = osqp.OSQP()
prob.setup(P, q, A, np.array([1.0, -2.0]), np.array([2.0, -1.0]), verbose=False)
try:
    prob.solve(raise_error=True)
except OSQPException as e:
    print('solve raised:', SolverStatus(e.args[0]).name)
