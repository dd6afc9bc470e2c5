// Pyodide smoke test: install the pure wheel and solve the canonical
// 2-variable QP with the numpy backend (native LDL disabled - scipy splu
// path, the wasm-compatible configuration).
import { loadPyodide } from 'pyodide';

const wheel = process.argv[2];
const pyodide = await loadPyodide();
await pyodide.loadPackage(['numpy', 'scipy', 'micropip']);
const micropip = pyodide.pyimport('micropip');
await micropip.install(`emfs:${wheel}`);

const out = await pyodide.runPythonAsync(`
import os
os.environ['OSQP_TPU_NO_NATIVE'] = '1'
os.environ['OSQP_TPU_ALGEBRA_BACKEND'] = 'numpy'
import numpy as np, scipy.sparse as sparse
import osqp_tpu as osqp
P = sparse.diags([11.0, 0.0], format='csc'); q = np.array([3, 4.0])
A = sparse.csc_matrix([[-1, 0], [0, -1], [-1, -3], [2, 5], [3, 4.0]])
u = np.array([0.0, 0.0, -15, 100, 80]); l = -1e6 * np.ones(5)
m = osqp.OSQP(algebra='numpy')
m.setup(P=P, q=q, A=A, l=l, u=u, verbose=False)
res = m.solve(raise_error=True)
assert abs(res.x[0]) < 1e-3 and abs(res.x[1] - 5) < 1e-3, res.x
f'status={res.info.status} obj={res.info.obj_val:.4f}'
`);
console.log('wasm smoke:', out);
