"""Algebra backend registry and dispatch.

TPU-native analogue of the reference's backend registry
(reference: src/osqp/interface.py:14-103).  The reference dispatches over
compiled extension modules ``{cuda > mkl > builtin}``; here the backends are

* ``jax``   - the TPU/XLA solver core (direct dense-Schur Cholesky and
              indirect PCG modes), highest priority.  Works on TPU, GPU and
              CPU devices through the same code.
* ``numpy`` - the always-available float64 scipy reference core
              (:mod:`osqp_tpu._oracle`), the analogue of ``builtin``.

``OSQP_TPU_ALGEBRA_BACKEND`` (or the reference-compatible
``OSQP_ALGEBRA_BACKEND``) environment variable overrides the priority order.
"""

from __future__ import annotations

import importlib
import os

from .constants import CapabilitiesType, SolverStatus, SolverError, OSQP_INFTY, OSQP_NAN

_ALGEBRAS = ('jax', 'numpy')  # highest -> lowest priority

_ALGEBRA_MODULES = {
    'jax': 'osqp_tpu.backends.jax_backend',
    'numpy': 'osqp_tpu.backends.numpy_backend',
}


def _env_override():
    return os.environ.get('OSQP_TPU_ALGEBRA_BACKEND') or os.environ.get('OSQP_ALGEBRA_BACKEND')


def algebra_available(algebra: str) -> bool:
    assert algebra in _ALGEBRAS, f'Unknown algebra {algebra}'
    try:
        importlib.import_module(_ALGEBRA_MODULES[algebra])
    except ImportError:
        return False
    return True


def algebras_available():
    return [a for a in _ALGEBRAS if algebra_available(a)]


def default_algebra() -> str:
    override = _env_override()
    if override is not None:
        return override
    for algebra in _ALGEBRAS:
        if algebra_available(algebra):
            return algebra
    raise RuntimeError('No algebra backend available!')


def algebra_module(algebra: str):
    return importlib.import_module(_ALGEBRA_MODULES[algebra])


# Constants exposed by name, mirroring the extension-module attribute lookup
# (reference interface.py:62-89).
_NAMED_CONSTANTS = {
    'OSQP_INFTY': OSQP_INFTY,
    'OSQP_NAN': OSQP_NAN,
    'OSQP_MIN_SCALING': 1e-04,
    'OSQP_MAX_SCALING': 1e04,
}


def constant(which: str, algebra: str | None = None):
    if which in _NAMED_CONSTANTS:
        return _NAMED_CONSTANTS[which]
    if which in SolverStatus.__members__:
        return int(SolverStatus[which])
    if which in SolverError.__members__:
        return int(SolverError[which])
    if which in CapabilitiesType.__members__:
        return int(CapabilitiesType[which])
    raise RuntimeError(f'Unknown constant {which}')
