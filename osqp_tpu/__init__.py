"""osqp_tpu: a TPU-native operator-splitting QP solver.

Solves convex quadratic programs

    minimize    1/2 x' P x + q' x
    subject to  l <= A x <= u

with a from-scratch JAX/XLA/Pallas ADMM core designed for TPU hardware
(dense-Schur Cholesky direct mode, PCG indirect mode, vmap-batched solves,
shard_map consensus splitting for huge QPs) plus an always-available float64
scipy reference backend.

API parity target: the reference ``osqp`` package
(reference: /root/reference/src/osqp/__init__.py:1-13).
"""

import os as _os

# On TPU, float32 matmuls default to bfloat16 MXU passes - a ~1e-3 relative
# error that stalls ADMM far above solver tolerances.  A QP solver needs true
# f32 linear algebra; opt out with OSQP_TPU_MATMUL_PRECISION=default if you
# know what you are doing.  jax is optional: without it (e.g. wasm/pyodide)
# the numpy backend still provides the full float64 algorithm.
try:
    import jax as _jax
except ImportError:  # pragma: no cover - numpy-only environments
    _jax = None
if _jax is not None:
    _prec = _os.environ.get('OSQP_TPU_MATMUL_PRECISION', 'highest')
    if _prec != 'default':
        _jax.config.update('jax_default_matmul_precision', _prec)

from .algebra import (  # noqa: F401
    algebra_available,
    algebras_available,
    constant,
    default_algebra,
)
from .constants import SolverError, SolverStatus  # noqa: F401
from .exceptions import OSQPException  # noqa: F401
from .interface import OSQP, OSQPSettings  # noqa: F401

__version__ = '1.0.0.dev0'
