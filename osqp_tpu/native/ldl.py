"""ctypes wrapper for the native sparse LDL' factorization (ldl.cpp).

Builds the shared library on first use with the system C++ compiler (cached
next to the source); falls back gracefully if no compiler is available -
callers must check :func:`available`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np
import scipy.sparse as sp

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, 'ldl.cpp')
_LIB_PATH = os.path.join(_HERE, '_ldl_native.so')

_lock = threading.Lock()
_lib = None
_build_failed = False


def _build():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return
        try:
            if (not os.path.exists(_LIB_PATH)) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
            ):
                subprocess.check_call(
                    ['g++', '-O3', '-shared', '-fPIC', '-o', _LIB_PATH, _SRC],
                    stdout=subprocess.DEVNULL,
                    stderr=subprocess.DEVNULL,
                )
            lib = ctypes.CDLL(_LIB_PATH)
        except (OSError, subprocess.CalledProcessError, FileNotFoundError):
            _build_failed = True
            return

        i32p = ctypes.POINTER(ctypes.c_int32)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.ldl_symbolic.restype = ctypes.c_int32
        lib.ldl_symbolic.argtypes = [ctypes.c_int32] + [i32p] * 4
        lib.ldl_numeric.restype = ctypes.c_int32
        lib.ldl_numeric.argtypes = [
            ctypes.c_int32, i32p, i32p, f64p, i32p, i32p, i32p, f64p, f64p,
            f64p, f64p, i32p, i32p, i32p, i32p,
        ]
        lib.ldl_solve.restype = None
        lib.ldl_solve.argtypes = [ctypes.c_int32, i32p, i32p, f64p, f64p, f64p]
        _lib = lib


def available() -> bool:
    if os.environ.get('OSQP_TPU_NO_NATIVE') == '1':
        return False
    _build()
    return _lib is not None


def _i32(a):
    return np.ascontiguousarray(a, dtype=np.int32)


def _ptr_i(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _ptr_d(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _fill_reducing_perm(K_triu: sp.csc_matrix):
    """Symmetric fill-reducing ordering (reverse Cuthill-McKee on the
    symmetrized pattern).  LDL' fill is permutation-sensitive; the natural
    ordering of the ADMM KKT matrix [[P+sigma I, A'], [A, -diag(1/rho)]] is
    often poor because the A block couples late columns to early ones.  RCM
    is a bandwidth heuristic and can LOSE to the natural ordering on some
    patterns (e.g. arrow matrices with a few dense rows; the QDLDL-class C
    cores use AMD, generally stronger) — the caller therefore runs the cheap
    symbolic pass for both orderings and keeps whichever yields fewer fill-in
    entries.  Returns None when the ordering is the identity (skip the
    gather/scatter overhead)."""
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    S = (K_triu + K_triu.T).tocsr()
    perm = np.asarray(reverse_cuthill_mckee(S, symmetric_mode=True), np.int64)
    if np.array_equal(perm, np.arange(K_triu.shape[0])):
        return None
    return perm


class LDLFactor:
    """LDL' factorization of a quasi-definite symmetric matrix.

    Accepts the UPPER-triangular part as scipy CSC.  ``n_positive`` exposes
    the inertia (the QDLDL-style non-convexity detector: the ADMM KKT matrix
    must have exactly n_x positive eigenvalues).  A fill-reducing ordering is
    applied internally (disable with ``OSQP_TPU_LDL_ORDERING=natural``);
    ``update_values``/``solve`` still speak the caller's original ordering.
    """

    def __init__(self, K_triu_csc: sp.csc_matrix):
        assert available(), 'native LDL library not available'
        K = sp.csc_matrix(K_triu_csc).copy()
        self.n = K.shape[0]
        n = self.n
        nnz0 = int(K.nnz)

        # Canonical sorted-indices form, remembering the permutation from the
        # caller's data order (update_values speaks caller order regardless
        # of whether the input CSC had sorted indices).
        if K.has_sorted_indices:
            sort_map = None
        else:
            tag = sp.csc_matrix(
                (
                    np.arange(1, nnz0 + 1, dtype=np.float64),
                    K.indices.copy(),
                    K.indptr.copy(),
                ),
                shape=K.shape,
            )
            tag.sort_indices()
            sort_map = (tag.data - 1.0).astype(np.int64)
            K.sort_indices()

        def _symbolic(Ap, Ai):
            parent = np.zeros(n, np.int32)
            Lnz = np.zeros(n, np.int32)
            flag = np.zeros(n, np.int32)
            total = _lib.ldl_symbolic(
                n, _ptr_i(Ap), _ptr_i(Ai), _ptr_i(parent), _ptr_i(Lnz), _ptr_i(flag)
            )
            return total, parent, Lnz

        # Natural-ordering symbolic pass first: it also validates the input
        # (returns < 0 on non-upper-triangular / missing-diagonal patterns),
        # keeping the loud-failure contract before any permutation rebuild.
        Ap_nat, Ai_nat = _i32(K.indptr), _i32(K.indices)
        total_nat, parent_nat, Lnz_nat = _symbolic(Ap_nat, Ai_nat)
        if total_nat < 0:
            raise ValueError(
                'ldl_symbolic failed (matrix must be upper-triangular CSC with diagonal)'
            )

        self._perm = None
        self._data_map = sort_map
        self._Ap, self._Ai = Ap_nat, Ai_nat
        self._Ax = np.ascontiguousarray(K.data, dtype=np.float64)
        self._parent, self._Lnz, total = parent_nat, Lnz_nat, total_nat

        if os.environ.get('OSQP_TPU_LDL_ORDERING', 'rcm') != 'natural' and n > 1:
            perm = _fill_reducing_perm(K)
            if perm is not None:
                # Permute the triu pattern: old entry (i, j) lands at
                # (min, max) of its new coordinates.  Carrying 1-based entry
                # ids as data through the CSC build yields the map from
                # permuted-CSC data position -> sorted-CSC data position, so
                # update_values can keep accepting data in caller order.
                Kc = K.tocoo()
                pinv = np.empty(n, np.int64)
                pinv[perm] = np.arange(n)
                r_new, c_new = pinv[Kc.row], pinv[Kc.col]
                rows = np.minimum(r_new, c_new)
                cols = np.maximum(r_new, c_new)
                ids = np.arange(1, Kc.nnz + 1, dtype=np.float64)
                Kp = sp.csc_matrix((ids, (rows, cols)), shape=(n, n))
                Kp.sort_indices()
                if int(Kp.nnz) != nnz0:
                    # duplicate (i, j)/(j, i) entries collapsed onto one triu
                    # position: the input stored both triangles.  The natural
                    # path fails loudly above; keep that contract here too.
                    raise ValueError(
                        'input stores both triangles (duplicate entries collapse '
                        'under symmetric permutation); pass the upper triangle only'
                    )
                Ap_rcm, Ai_rcm = _i32(Kp.indptr), _i32(Kp.indices)
                total_rcm, parent_rcm, Lnz_rcm = _symbolic(Ap_rcm, Ai_rcm)
                # Keep RCM only when it strictly reduces fill (symbolic is
                # O(nnz) — cheap relative to the numeric factorization).
                if 0 <= total_rcm < total_nat:
                    rcm_map = (Kp.data - 1.0).astype(np.int64)
                    self._perm = perm
                    self._data_map = (
                        sort_map[rcm_map] if sort_map is not None else rcm_map
                    )
                    self._Ap, self._Ai = Ap_rcm, Ai_rcm
                    self._Ax = np.ascontiguousarray(K.data)[rcm_map].astype(np.float64)
                    self._parent, self._Lnz, total = parent_rcm, Lnz_rcm, total_rcm

        self._Lp = np.zeros(n + 1, np.int32)
        np.cumsum(self._Lnz, out=self._Lp[1:])
        self._Li = np.zeros(max(total, 1), np.int32)
        self._Lx = np.zeros(max(total, 1), np.float64)
        self._D = np.zeros(n, np.float64)
        self._Dinv = np.zeros(n, np.float64)
        self.n_positive = None
        self._refactor()

    def _refactor(self):
        n = self.n
        Y = np.zeros(n, np.float64)
        pattern = np.zeros(n, np.int32)
        stack = np.zeros(n, np.int32)
        flag = np.zeros(n, np.int32)
        lnz_cur = np.zeros(n, np.int32)
        rc = _lib.ldl_numeric(
            n, _ptr_i(self._Ap), _ptr_i(self._Ai), _ptr_d(self._Ax),
            _ptr_i(self._parent), _ptr_i(self._Lp), _ptr_i(self._Li),
            _ptr_d(self._Lx), _ptr_d(self._D), _ptr_d(self._Dinv),
            _ptr_d(Y), _ptr_i(pattern), _ptr_i(stack), _ptr_i(flag),
            _ptr_i(lnz_cur),
        )
        if rc < 0:
            raise ZeroDivisionError(f'zero pivot at column {-rc - 1}')
        self.n_positive = int(rc)

    def update_values(self, new_data: np.ndarray):
        """Numeric-only refactorization with new matrix values (same
        pattern), given in the caller's original triu-CSC data order."""
        new_data = np.asarray(new_data, np.float64)
        if self._data_map is not None:
            self._Ax[:] = new_data[self._data_map]
        else:
            self._Ax[:] = new_data
        self._refactor()

    def solve(self, b: np.ndarray) -> np.ndarray:
        b = np.ascontiguousarray(b, dtype=np.float64)
        x = b[self._perm].copy() if self._perm is not None else b.copy()
        _lib.ldl_solve(
            self.n, _ptr_i(self._Lp), _ptr_i(self._Li), _ptr_d(self._Lx),
            _ptr_d(self._Dinv), _ptr_d(x),
        )
        if self._perm is not None:
            out = np.empty_like(x)
            out[self._perm] = x
            return out
        return x
