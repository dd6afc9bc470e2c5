"""Embedded code generation (parity with reference examples/code_generation.py):
emit a standalone C solver with baked data, compile it as a Python extension,
and call it."""

import sys

import numpy as np
from scipy import sparse

import osqp_tpu as osqp

P = sparse.csc_matrix([[4, 1], [1, 2]])
q = np.array([1.0, 1.0])
A = sparse.csc_matrix([[1, 1], [1, 0], [0, 1]])
l = np.array([1.0, 0.0, 0.0])
u = np.array([1.0, 0.7, 0.7])

prob = osqp.OSQP()
prob.setup(P, q, A, l, u, verbose=False, eps_abs=1e-8, eps_rel=1e-8)

out = prob.codegen(
    'out_codegen', extension_name='emosqp', force_rewrite=True, compile=True
)
sys.path.insert(0, out)

import emosqp  # noqa: E402

x, y, status, iters, run_time = emosqp.solve()
print('embedded solve: x =', x, 'status =', status, f'({run_time * 1e6:.0f}us)')

emosqp.update_data_vec(q=np.array([2.0, 3.0]))
x, *_ = emosqp.solve()
print('after q update: x =', x)
