"""Solver constants, status codes and capability flags.

TPU-native re-implementation of the constant surface exported by the reference
pybind11 extension (reference: /root/reference/src/bindings.cpp.in:325-400 and
/root/reference/src/osqppurepy/_osqp.py:13-45).  Numeric status values follow
the OSQP v1.0 C enum (sequential, starting at OSQP_SOLVED=1) that the binding
re-exports; the pure-python mirror in the reference still used the legacy 0.6
values, but the test-suite only ever compares through ``constant(...)`` so the
self-consistent v1.0 values are the contract.
"""

from __future__ import annotations

import math
from enum import IntEnum

# ---------------------------------------------------------------------------
# Algorithm parameter bounds (reference: src/osqppurepy/_osqp.py:24-45)
# ---------------------------------------------------------------------------
RHO_MIN = 1e-06
RHO_MAX = 1e06
RHO_EQ_OVER_RHO_INEQ = 1e03
RHO_TOL = 1e-04

MIN_SCALING = 1e-04
MAX_SCALING = 1e04

OSQP_INFTY = 1e30
OSQP_NAN = math.nan

PRINT_INTERVAL = 200

# Fallback adaptive-rho interval used when ``adaptive_rho_interval == 0``
# (the C core uses a time-fraction heuristic when profiling is enabled and a
# fixed interval otherwise; a fixed interval keeps solves deterministic and
# jit-compatible).
ADAPTIVE_RHO_FIXED = 100

# Divergence guard used by the non-convexity residual check.
OSQP_DIVERGENCE = OSQP_INFTY


class SolverStatus(IntEnum):
    """Status values (reference: src/bindings.cpp.in:349-361)."""

    OSQP_SOLVED = 1
    OSQP_SOLVED_INACCURATE = 2
    OSQP_PRIMAL_INFEASIBLE = 3
    OSQP_PRIMAL_INFEASIBLE_INACCURATE = 4
    OSQP_DUAL_INFEASIBLE = 5
    OSQP_DUAL_INFEASIBLE_INACCURATE = 6
    OSQP_MAX_ITER_REACHED = 7
    OSQP_TIME_LIMIT_REACHED = 8
    OSQP_NON_CVX = 9
    OSQP_SIGINT = 10
    OSQP_UNSOLVED = 11


class SolverError(IntEnum):
    """Error values (reference: src/bindings.cpp.in:364-375)."""

    OSQP_NO_ERROR = 0
    OSQP_DATA_VALIDATION_ERROR = 1
    OSQP_SETTINGS_VALIDATION_ERROR = 2
    OSQP_LINSYS_SOLVER_INIT_ERROR = 3
    OSQP_NONCVX_ERROR = 4
    OSQP_MEM_ALLOC_ERROR = 5
    OSQP_WORKSPACE_NOT_INIT_ERROR = 6
    OSQP_ALGEBRA_LOAD_ERROR = 7
    OSQP_CODEGEN_DEFINES_ERROR = 8
    OSQP_DATA_NOT_INITIALIZED = 9
    OSQP_FUNC_NOT_IMPLEMENTED = 10


class LinsysSolverType(IntEnum):
    """Linear-system solver types (reference: src/bindings.cpp.in:343-346)."""

    OSQP_DIRECT_SOLVER = 0
    OSQP_INDIRECT_SOLVER = 1


class PrecondType(IntEnum):
    """CG preconditioner types (reference: src/bindings.cpp.in:378-381)."""

    OSQP_NO_PRECONDITIONER = 0
    OSQP_DIAGONAL_PRECONDITIONER = 1


class CapabilitiesType(IntEnum):
    """Capability bitmask (reference: src/bindings.cpp.in:395-400)."""

    OSQP_CAPABILITY_DIRECT_SOLVER = 0x01
    OSQP_CAPABILITY_INDIRECT_SOLVER = 0x02
    OSQP_CAPABILITY_CODEGEN = 0x04
    OSQP_CAPABILITY_UPDATE_MATRICES = 0x08
    OSQP_CAPABILITY_DERIVATIVES = 0x10


_STATUS_STRINGS = {
    SolverStatus.OSQP_SOLVED: 'solved',
    SolverStatus.OSQP_SOLVED_INACCURATE: 'solved inaccurate',
    SolverStatus.OSQP_PRIMAL_INFEASIBLE: 'primal infeasible',
    SolverStatus.OSQP_PRIMAL_INFEASIBLE_INACCURATE: 'primal infeasible inaccurate',
    SolverStatus.OSQP_DUAL_INFEASIBLE: 'dual infeasible',
    SolverStatus.OSQP_DUAL_INFEASIBLE_INACCURATE: 'dual infeasible inaccurate',
    SolverStatus.OSQP_MAX_ITER_REACHED: 'maximum iterations reached',
    SolverStatus.OSQP_TIME_LIMIT_REACHED: 'run time limit reached',
    SolverStatus.OSQP_NON_CVX: 'problem non convex',
    SolverStatus.OSQP_SIGINT: 'interrupted',
    SolverStatus.OSQP_UNSOLVED: 'unsolved',
}


def status_string(status_val: int) -> str:
    return _STATUS_STRINGS.get(SolverStatus(int(status_val)), 'unknown')
