"""TPU-friendly sparse matrix-vector operators for the indirect (PCG) path.

Reference context: the reference's CUDA backend runs its indirect solver on
cuSPARSE SpMV (reference CMakeLists.txt:53-57, solver_type='indirect',
reference src/osqp/interface.py:254-260); its CPU backends factorize instead.
On TPU, generic gather/scatter SpMV (jax BCOO) is far from HBM speed-of-light
because XLA lowers element gathers and scatter-adds serially.  This module
provides two gather-light formats, chosen at setup time from the host-side
CSC pattern:

- ``DiaMatrix``: diagonal (DIA) storage.  ``A @ v`` = sum_d band_d * shift(v)
  over the distinct non-zero diagonals — static slices and FMAs only, ZERO
  gathers.  Optimal for banded KKTs (MPC cascades, finite differences,
  chained consensus structure), where it runs at HBM streaming speed.
- ``EllMatrix``: padded-row (ELLPACK) storage.  ``A @ v`` gathers
  ``v[cols]`` once and reduces — gather-only, no scatter.  Both orientations
  are stored so ``A.T @ y`` is also gather-only.
- jax BCOO remains the fallback for genuinely unstructured patterns.

Both classes are registered pytrees (safe to close over or pass through
``jax.jit``), expose ``shape``/``dtype``/``T``/``@``/``astype`` like the
subset of the BCOO surface the solver core uses, plus ``diag()`` and
``gram_diag(rho)`` (diag(A' diag(rho) A)) needed by the CG preconditioner.

Selection heuristics and storage-waste bounds live in ``choose_format`` /
``from_scipy``; ``OSQP_TPU_SPARSE_FORMAT`` ∈ {auto, bcoo, ell, dia} forces a
format globally.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    'DiaMatrix',
    'EllMatrix',
    'dia_from_scipy',
    'ell_from_scipy',
    'from_scipy',
    'choose_format',
    'is_structured',
]


# ---------------------------------------------------------------------------
# DIA
# ---------------------------------------------------------------------------


def _dia_matvec(bands, offsets, v, out_rows):
    """sum_d bands[d] * v[i + offsets[d]] with zero padding outside [0, len(v)).

    ``offsets`` is a static tuple, so every slice below is static — XLA fuses
    the whole thing into one streaming FMA kernel (no gather).
    """
    m = out_rows
    pad = jnp.zeros((m,), v.dtype)
    vp = jnp.concatenate([pad, v, pad])
    if not offsets:
        return jnp.zeros((m,), v.dtype)
    # Unrolled multiply-accumulate (rather than stack+sum, which would
    # materialize a (D, m) intermediate and double the HBM traffic) — XLA
    # fuses the D slices+FMAs into one streaming pass.
    acc = bands[0] * jax.lax.slice(vp, (m + offsets[0],), (2 * m + offsets[0],))
    for d, o in enumerate(offsets[1:], start=1):
        acc = acc + bands[d] * jax.lax.slice(vp, (m + o,), (2 * m + o,))
    return acc


class DiaMatrix:
    """Diagonal-storage sparse matrix (shape (m, n)).

    ``bands[d, i] = S[i, i + offsets[d]]`` (zero where out of range).  The
    transpose bands (for ``S.T``) are precomputed host-side so both ``S @ v``
    and ``S.T @ y`` are gather-free.
    """

    def __init__(self, bands, offsets, bands_t, offsets_t, shape):
        self.bands = bands              # (D, m)
        self.offsets = tuple(int(o) for o in offsets)
        self.bands_t = bands_t          # (Dt, n)
        self.offsets_t = tuple(int(o) for o in offsets_t)
        self.shape = tuple(shape)

    # -- BCOO-like surface ---------------------------------------------------
    @property
    def dtype(self):
        return self.bands.dtype

    @property
    def T(self):
        return DiaMatrix(
            self.bands_t, self.offsets_t, self.bands, self.offsets,
            (self.shape[1], self.shape[0]),
        )

    def astype(self, dtype):
        return DiaMatrix(
            self.bands.astype(dtype), self.offsets,
            self.bands_t.astype(dtype), self.offsets_t, self.shape,
        )

    def __matmul__(self, v):
        if getattr(v, 'ndim', 1) != 1:
            raise TypeError('DiaMatrix only supports matrix-vector products')
        return _dia_matvec(self.bands, self.offsets, v, self.shape[0])

    # -- solver-core helpers -------------------------------------------------
    def diag(self):
        """Main diagonal (square matrices)."""
        m = self.shape[0]
        if 0 in self.offsets:
            return self.bands[self.offsets.index(0)]
        return jnp.zeros((m,), self.dtype)

    def gram_diag(self, rho):
        """diag(S' diag(rho) S): same shifted-FMA pattern on squared bands."""
        return _dia_matvec(self.bands_t * self.bands_t, self.offsets_t, rho, self.shape[1])

    def todense(self):
        m, n = self.shape
        out = jnp.zeros((m, n), self.dtype)
        rows = jnp.arange(m)
        for d, o in enumerate(self.offsets):
            cols = rows + o
            ok = (cols >= 0) & (cols < n)
            out = out.at[rows, jnp.clip(cols, 0, n - 1)].add(
                jnp.where(ok, self.bands[d], 0.0)
            )
        return out


def _dia_arrays(S, dtype):
    C = S.tocoo()
    m, n = C.shape
    off = C.col.astype(np.int64) - C.row.astype(np.int64)
    offs = np.unique(off) if C.nnz else np.zeros((0,), np.int64)
    bands = np.zeros((len(offs), m), dtype=dtype)
    if C.nnz:
        np.add.at(bands, (np.searchsorted(offs, off), C.row), C.data)
    return bands, tuple(int(o) for o in offs)


def dia_from_scipy(S, dtype=np.float32):
    """Build a DiaMatrix (plus its transpose bands) from any scipy sparse."""
    bands, offs = _dia_arrays(S, dtype)
    bands_t, offs_t = _dia_arrays(S.T, dtype)
    return DiaMatrix(jnp.asarray(bands), offs, jnp.asarray(bands_t), offs_t, S.shape)


jax.tree_util.register_pytree_node(
    DiaMatrix,
    lambda s: ((s.bands, s.bands_t), (s.offsets, s.offsets_t, s.shape)),
    lambda aux, ch: DiaMatrix(ch[0], aux[0], ch[1], aux[1], aux[2]),
)


# ---------------------------------------------------------------------------
# ELL
# ---------------------------------------------------------------------------


class EllMatrix:
    """Padded-row (ELLPACK) sparse matrix (shape (m, n)).

    ``data[i, k]``/``cols[i, k]`` hold up to K entries of row i (padded with
    zero data at column 0 — a no-op in the reduce).  The transposed arrays
    are stored too, so both orientations are gather-only (no scatter-add,
    which is the slow half of BCOO SpMV on TPU).
    """

    def __init__(self, data, cols, data_t, cols_t, shape):
        self.data = data        # (m, K)
        self.cols = cols        # (m, K) int32
        self.data_t = data_t    # (n, Kt)
        self.cols_t = cols_t    # (n, Kt) int32
        self.shape = tuple(shape)

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def T(self):
        return EllMatrix(
            self.data_t, self.cols_t, self.data, self.cols,
            (self.shape[1], self.shape[0]),
        )

    def astype(self, dtype):
        return EllMatrix(
            self.data.astype(dtype), self.cols,
            self.data_t.astype(dtype), self.cols_t, self.shape,
        )

    def __matmul__(self, v):
        if getattr(v, 'ndim', 1) != 1:
            raise TypeError('EllMatrix only supports matrix-vector products')
        return jnp.sum(self.data * v[self.cols], axis=1)

    def diag(self):
        m = self.shape[0]
        rows = jnp.arange(m, dtype=self.cols.dtype)[:, None]
        return jnp.sum(jnp.where(self.cols == rows, self.data, 0.0), axis=1)

    def gram_diag(self, rho):
        return jnp.sum(self.data_t * self.data_t * rho[self.cols_t], axis=1)

    def todense(self):
        m, n = self.shape
        out = jnp.zeros((m, n), self.dtype)
        rows = jnp.broadcast_to(jnp.arange(m)[:, None], self.cols.shape)
        return out.at[rows, self.cols].add(self.data)


def _ell_arrays(S, dtype):
    R = S.tocsr()
    R.sum_duplicates()
    m = R.shape[0]
    counts = np.diff(R.indptr)
    K = max(int(counts.max()) if m and counts.size else 0, 1)
    data = np.zeros((m, K), dtype=dtype)
    cols = np.zeros((m, K), dtype=np.int32)
    if R.nnz:
        rows = np.repeat(np.arange(m), counts)
        pos = np.arange(R.nnz) - np.repeat(R.indptr[:-1], counts)
        data[rows, pos] = R.data
        cols[rows, pos] = R.indices
    return data, cols


def ell_from_scipy(S, dtype=np.float32):
    data, cols = _ell_arrays(S, dtype)
    data_t, cols_t = _ell_arrays(S.T, dtype)
    return EllMatrix(
        jnp.asarray(data), jnp.asarray(cols),
        jnp.asarray(data_t), jnp.asarray(cols_t), S.shape,
    )


jax.tree_util.register_pytree_node(
    EllMatrix,
    lambda s: ((s.data, s.cols, s.data_t, s.cols_t), (s.shape,)),
    lambda aux, ch: EllMatrix(*ch, aux[0]),
)


# ---------------------------------------------------------------------------
# Format selection
# ---------------------------------------------------------------------------

# Padded storage may be at most this multiple of nnz before a format is
# rejected (both DIA bands and ELL pads burn HBM bandwidth on stored zeros).
_WASTE_LIMIT = 5.0
_DIA_MAX_BANDS = 1024


def _dia_cost(S):
    C = S.tocoo()
    if C.nnz == 0:
        return np.inf
    n_diags = np.unique(C.col - C.row).size
    return n_diags * S.shape[0] / C.nnz, n_diags


def _ell_cost(S):
    R = S.tocsr()
    if R.nnz == 0:
        return np.inf
    counts = np.diff(R.indptr)
    kmax = int(counts.max()) if counts.size else 0
    return max(kmax, 1) * S.shape[0] / R.nnz


def choose_format(S) -> str:
    """Pick 'dia' | 'ell' | 'bcoo' for a scipy sparse matrix.

    DIA wins when the pattern is few-diagonal (banded) — its matvec has no
    gathers at all.  ELL wins when row occupancy is even enough that padding
    is cheap.  Anything else stays BCOO.
    """
    forced = os.environ.get('OSQP_TPU_SPARSE_FORMAT', 'auto').lower()
    if forced in ('bcoo', 'ell', 'dia'):
        return forced
    if S.nnz == 0:
        return 'dia'  # zero bands — trivially exact and free
    dia_waste, n_diags = _dia_cost(S)
    if dia_waste <= _WASTE_LIMIT and n_diags <= _DIA_MAX_BANDS:
        return 'dia'
    if _ell_cost(S) <= _WASTE_LIMIT:
        return 'ell'
    return 'bcoo'


def is_structured(M) -> bool:
    return isinstance(M, (DiaMatrix, EllMatrix))


def from_scipy(S, dtype=np.float32, fmt: str | None = None):
    """Convert scipy sparse → the best TPU operator (or a forced format)."""
    fmt = fmt or choose_format(S)
    if fmt == 'dia':
        return dia_from_scipy(S, dtype)
    if fmt == 'ell':
        return ell_from_scipy(S, dtype)
    from jax.experimental import sparse as jsparse

    C = S.tocoo()
    return jsparse.BCOO(
        (jnp.asarray(C.data, dtype), jnp.asarray(np.stack([C.row, C.col], 1))),
        shape=C.shape,
    )
