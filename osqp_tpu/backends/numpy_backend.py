"""``numpy`` algebra backend: float64 scipy reference core.

The analogue of the reference's always-available ``builtin`` QDLDL backend
(reference CMakeLists.txt:45-46); direct solver only.
"""

from __future__ import annotations

from ..constants import CapabilitiesType
from .._oracle.solver import ReferenceSolver as Solver  # noqa: F401

NAME = 'numpy'

OSQP_USE_FLOAT = 0  # float64


def capabilities() -> int:
    return (
        CapabilitiesType.OSQP_CAPABILITY_DIRECT_SOLVER
        | CapabilitiesType.OSQP_CAPABILITY_UPDATE_MATRICES
        | CapabilitiesType.OSQP_CAPABILITY_DERIVATIVES
        | CapabilitiesType.OSQP_CAPABILITY_CODEGEN
    )


def solver_types():
    return ('direct',)
