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
- ``BsrMatrix``: block-ELL storage with dense TPU-tile-shaped blocks
  (default 8x128).  ``A @ v`` row-gathers one 512-byte segment of ``v`` per
  BLOCK (one memory transaction amortized over up to 1024 stored entries,
  vs one per entry for BCOO/ELL) and streams the dense blocks through a
  fused multiply-reduce.  Optimal for CLUSTERED patterns (coupled
  sub-systems, multi-stage couplings, arrowheads) where block occupancy is
  dense enough that padding stays bounded.
- ``'dense'``: for moderately-sized genuinely-unstructured patterns the
  fastest TPU "sparse" matvec is no sparse format at all: materialize the
  scaled matrix densely and stream it at HBM speed-of-light.  Random
  element gathers are transaction-bound at ~1/100th of peak bandwidth on
  TPU (measured: BCOO 0.83 GB/s vs 819 GB/s peak, benchmarks/RESULTS.md),
  so up to the HBM budget (``OSQP_TPU_DENSE_SPMV_BYTES``, default 2 GB per
  matrix) dense streaming wins by ~2 orders of magnitude.
- jax BCOO remains the fallback for huge genuinely-unstructured patterns.

Both classes are registered pytrees (safe to close over or pass through
``jax.jit``), expose ``shape``/``dtype``/``T``/``@``/``astype`` like the
subset of the BCOO surface the solver core uses, plus ``diag()`` and
``gram_diag(rho)`` (diag(A' diag(rho) A)) needed by the CG preconditioner.

Selection heuristics and storage-waste bounds live in ``choose_format`` /
``from_scipy``; ``OSQP_TPU_SPARSE_FORMAT`` ∈ {auto, dia, bsr, dense, ell,
bcoo} forces a format globally.  The auto ladder (cheapest matvec first):
DIA (banded) → BSR (clustered, if it saves ≥4× the bytes of dense) → ELL
(if it saves ≥320× — ELL gathers run ~3 orders slower per byte than dense
streams) → dense (within ``OSQP_TPU_DENSE_SPMV_BYTES``) → ELL → BCOO.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    'DiaMatrix',
    'EllMatrix',
    'BsrMatrix',
    'dia_from_scipy',
    'ell_from_scipy',
    'bsr_from_scipy',
    'from_scipy',
    'choose_format',
    'is_structured',
]


# ---------------------------------------------------------------------------
# DIA
# ---------------------------------------------------------------------------


# Above this many diagonals the unrolled slice+FMA graph is rolled into a
# lax.scan (one compiled body) to keep XLA compile time O(1) in the band
# count; below it, full unrolling lets XLA fuse everything into one pass.
_DIA_UNROLL_MAX = 64


def _dia_matvec(bands, offsets, v, out_rows):
    """sum_d bands[d] * v[i + offsets[d]] with zero padding outside [0, len(v)).

    ``offsets`` is a static tuple, so every slice below is static — XLA fuses
    the whole thing into one streaming FMA kernel (no gather).  For very
    many diagonals the loop is rolled into a ``lax.scan`` over the band
    stack (dynamic_slice with a traced offset) so the emitted graph — and
    the compile time — stays constant-size.
    """
    m = out_rows
    pad = jnp.zeros((m,), v.dtype)
    vp = jnp.concatenate([pad, v, pad])
    if not offsets:
        return jnp.zeros((m,), v.dtype)
    if len(offsets) > _DIA_UNROLL_MAX:
        starts = jnp.asarray(offsets, jnp.int32) + m

        def body(acc, band_start):
            band, start = band_start
            return acc + band * jax.lax.dynamic_slice(vp, (start,), (m,)), None

        acc, _ = jax.lax.scan(body, jnp.zeros((m,), v.dtype), (bands, starts))
        return acc
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
# BSR (block-ELL)
# ---------------------------------------------------------------------------

# TPU-native block shape: one float32 VMEM tile is (8 sublanes, 128 lanes).
_BSR_R, _BSR_C = 8, 128


def _bsr_matvec(blocks, bcols, v, out_rows, n_cols):
    """Block-ELL matvec: one 128-wide ROW-GATHER of v per block, then a
    fused streaming multiply-reduce over the dense blocks.

    blocks: (nbr, Kb, R, C), bcols: (nbr, Kb) int32 (block-column ids,
    padding blocks are all-zero and point at block-column 0 — a no-op).
    Returns the unpadded (out_rows,) result.

    ``OSQP_TPU_BSR_MV`` selects the lowering (chip A/B in
    tools/bsr_mv_ab.py): 'einsum' (batched dot), 'reduce' (broadcast
    multiply + sum — pure VPU streaming), or 'onehot' (segment gather
    expressed as a one-hot MXU matmul — no gather op at all; used
    automatically when the one-hot table stays small).
    """
    nbr, Kb, R, C = blocks.shape
    nbc = -(-n_cols // C)
    vp = jnp.zeros((nbc * C,), v.dtype).at[:n_cols].set(v)
    vb = vp.reshape(nbc, C)
    variant = os.environ.get('OSQP_TPU_BSR_MV', 'auto')
    if variant == 'auto':
        # one-hot table (nbr*Kb, nbc) costs nbr*Kb*nbc*C FLOPs on the MXU —
        # cheap next to the block stream while nbc is moderate
        variant = 'onehot' if nbc <= 1024 else 'einsum'
    if variant == 'onehot':
        onehot = jax.nn.one_hot(bcols.reshape(-1), nbc, dtype=v.dtype)
        vg = (onehot @ vb).reshape(nbr, Kb, C)
    else:
        vg = jnp.take(vb, bcols.reshape(-1), axis=0).reshape(nbr, Kb, C)
    if variant == 'reduce':
        out = jnp.sum(blocks * vg[:, :, None, :], axis=(1, 3))
    else:
        out = jnp.einsum('bkrc,bkc->br', blocks, vg)
    return out.reshape(-1)[:out_rows]


class BsrMatrix:
    """Block-ELL sparse matrix (shape (m, n)) with dense (R, C) blocks.

    ``blocks[i, k]`` is the k-th non-zero (R, C) block of block-row i and
    ``bcols[i, k]`` its block-column; block-rows with fewer blocks are
    padded with zero blocks at block-column 0.  Transpose blocks are stored
    so ``S.T @ y`` follows the same gather-one-segment-per-block pattern.
    The main diagonal is precomputed host-side (``dvec``) because extracting
    it from block storage on device would itself be a gather.
    """

    def __init__(self, blocks, bcols, blocks_t, bcols_t, dvec, shape):
        self.blocks = blocks      # (nbr, Kb, R, C)
        self.bcols = bcols        # (nbr, Kb) int32
        self.blocks_t = blocks_t  # (nbc', Kt, R, C) for S.T
        self.bcols_t = bcols_t
        self.dvec = dvec          # (min(m, n),) main diagonal
        self.shape = tuple(shape)

    @property
    def dtype(self):
        return self.blocks.dtype

    @property
    def T(self):
        return BsrMatrix(
            self.blocks_t, self.bcols_t, self.blocks, self.bcols,
            self.dvec, (self.shape[1], self.shape[0]),
        )

    def astype(self, dtype):
        return BsrMatrix(
            self.blocks.astype(dtype), self.bcols,
            self.blocks_t.astype(dtype), self.bcols_t,
            self.dvec.astype(dtype), self.shape,
        )

    def __matmul__(self, v):
        if getattr(v, 'ndim', 1) != 1:
            raise TypeError('BsrMatrix only supports matrix-vector products')
        return _bsr_matvec(self.blocks, self.bcols, v, self.shape[0], self.shape[1])

    def diag(self):
        m = self.shape[0]
        d = self.dvec
        if d.shape[0] < m:
            d = jnp.zeros((m,), self.dtype).at[: d.shape[0]].set(d)
        return d

    def gram_diag(self, rho):
        """diag(S' diag(rho) S) = (S.^2)' @ rho via the squared transpose
        blocks (same streaming pattern; runs only on rho updates)."""
        return _bsr_matvec(
            self.blocks_t * self.blocks_t, self.bcols_t, rho,
            self.shape[1], self.shape[0],
        )

    def todense(self):
        nbr, Kb, R, C = self.blocks.shape
        m, n = self.shape
        nbc = -(-n // C)
        out = jnp.zeros((nbr, nbc, R, C), self.dtype)
        rows = jnp.broadcast_to(jnp.arange(nbr)[:, None], self.bcols.shape)
        out = out.at[rows, self.bcols].add(self.blocks)
        return out.transpose(0, 2, 1, 3).reshape(nbr * R, nbc * C)[:m, :n]


def _bsr_arrays(S, dtype, R=_BSR_R, C=_BSR_C):
    """Host-side block-ELL packing of a scipy sparse matrix."""
    Coo = S.tocoo()
    Coo.sum_duplicates()
    m, n = Coo.shape
    nbr, nbc = -(-m // R), -(-n // C)
    if Coo.nnz == 0:
        return (np.zeros((nbr, 1, R, C), dtype), np.zeros((nbr, 1), np.int32))
    br = Coo.row // R
    bc = Coo.col // C
    bid = br.astype(np.int64) * nbc + bc
    uniq, inv = np.unique(bid, return_inverse=True)
    ubr, ubc = uniq // nbc, uniq % nbc
    counts = np.bincount(ubr, minlength=nbr)
    Kb = max(int(counts.max()), 1)
    # slot index of each unique block within its block-row
    starts = np.zeros(nbr + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    slot = np.arange(uniq.size) - starts[ubr]
    blocks = np.zeros((nbr, Kb, R, C), dtype)
    bcols = np.zeros((nbr, Kb), np.int32)
    bcols[ubr, slot] = ubc
    blocks[ubr[inv], slot[inv], Coo.row % R, Coo.col % C] = Coo.data
    return blocks, bcols


def bsr_from_scipy(S, dtype=np.float32, R=_BSR_R, C=_BSR_C):
    """Build a BsrMatrix (plus transpose blocks) from any scipy sparse."""
    blocks, bcols = _bsr_arrays(S, dtype, R, C)
    blocks_t, bcols_t = _bsr_arrays(S.T, dtype, R, C)
    k = min(S.shape)
    dvec = np.asarray(S.tocsr().diagonal()[:k], dtype)
    return BsrMatrix(
        jnp.asarray(blocks), jnp.asarray(bcols),
        jnp.asarray(blocks_t), jnp.asarray(bcols_t),
        jnp.asarray(dvec), S.shape,
    )


jax.tree_util.register_pytree_node(
    BsrMatrix,
    lambda s: ((s.blocks, s.bcols, s.blocks_t, s.bcols_t, s.dvec), (s.shape,)),
    lambda aux, ch: BsrMatrix(*ch, aux[0]),
)


# ---------------------------------------------------------------------------
# Format selection
# ---------------------------------------------------------------------------

# Padded storage may be at most this multiple of nnz before a format is
# rejected (both DIA bands and ELL pads burn HBM bandwidth on stored zeros).
_WASTE_LIMIT = 5.0
_DIA_MAX_BANDS = 1024
# BSR blocks STREAM (one 512-byte transaction per block vs one per element
# for BCOO/ELL — a ~100x per-byte speed gap measured on chip), so a much
# larger padding multiple still wins; beyond it dense streaming or BCOO is
# cheaper.
_BSR_WASTE_LIMIT = 24.0
# Measured on chip (BENCH r05 kkt_probe): plain dense streaming moves
# ~9x more bytes/s than the BSR gather+reduce path (699 vs 73 GB/s), so
# when both fit, BSR only wins wall-clock if it saves at least this factor
# in stored bytes.
_BSR_VS_DENSE = 4.0
# ELL's per-element gathers run ~640x slower per stored byte than dense
# streaming (1.1 vs 699 GB/s measured), so ELL beats dense only when it
# saves at least this factor (conservative half of the measured ratio) —
# i.e. for VERY sparse even-occupancy patterns.
_ELL_VS_DENSE = 320.0


def _dense_budget_bytes():
    """HBM budget per matrix for the dense-streaming fallback (the honest
    fast path for genuinely-unstructured patterns on TPU)."""
    return int(os.environ.get('OSQP_TPU_DENSE_SPMV_BYTES', 2_000_000_000))


def _dia_cost(S):
    C = S.tocoo()
    if C.nnz == 0:
        return np.inf, 0
    n_diags = np.unique(C.col - C.row).size
    return n_diags * S.shape[0] / C.nnz, n_diags


def _ell_cost(S):
    """(padding multiple, stored bytes) of the padded-row packing (data +
    int32 columns, both orientations ~2x — counted once per use here)."""
    R = S.tocsr()
    if R.nnz == 0:
        return np.inf, 0
    counts = np.diff(R.indptr)
    kmax = int(counts.max()) if counts.size else 0
    stored = max(kmax, 1) * S.shape[0]
    return stored / R.nnz, stored * 8


def _bsr_cost(S, R=_BSR_R, C=_BSR_C):
    """(padding multiple, stored bytes) of the block-ELL packing."""
    Coo = S.tocoo()
    if Coo.nnz == 0:
        return np.inf, 0
    nbc = -(-S.shape[1] // C)
    bid = (Coo.row // R).astype(np.int64) * nbc + Coo.col // C
    uniq = np.unique(bid)
    counts = np.bincount(uniq // nbc, minlength=-(-S.shape[0] // R))
    Kb = max(int(counts.max()), 1)
    stored = counts.size * Kb * R * C  # ELL-padded block storage
    return stored / Coo.nnz, stored * 4


def choose_format(S) -> str:
    """Pick 'dia' | 'bsr' | 'dense' | 'ell' | 'bcoo' for a scipy matrix.

    Ladder (cheapest matvec first, host-side pattern analysis only):
    1. DIA when the pattern is few-diagonal (banded) — zero gathers.
    2. BSR when 8x128 block occupancy is dense enough — one 512-byte
       segment gather per block, dense blocks streamed.
    3. dense when the matrix fits the HBM budget — for unstructured
       patterns streaming the zeros at 819 GB/s beats gathering the
       non-zeros at ~1 GB/s up to ~100x padding (measured, RESULTS.md).
    4. ELL (gather-only) / BCOO (gather+scatter) for huge unstructured
       patterns beyond the dense budget.
    """
    forced = os.environ.get('OSQP_TPU_SPARSE_FORMAT', 'auto').lower()
    if forced in ('bcoo', 'ell', 'dia', 'bsr', 'dense'):
        return forced
    if S.nnz == 0:
        return 'dia'  # zero bands — trivially exact and free
    dia_waste, n_diags = _dia_cost(S)
    if dia_waste <= _WASTE_LIMIT and n_diags <= _DIA_MAX_BANDS:
        return 'dia'
    dense_bytes = 4 * S.shape[0] * S.shape[1]
    dense_ok = dense_bytes <= _dense_budget_bytes()
    bsr_waste, bsr_bytes = _bsr_cost(S)
    if bsr_waste <= _BSR_WASTE_LIMIT and (
        bsr_bytes * _BSR_VS_DENSE < dense_bytes or not dense_ok
    ):
        return 'bsr'
    ell_waste, ell_bytes = _ell_cost(S)
    ell_ok = ell_waste <= _WASTE_LIMIT
    # ultra-sparse even-occupancy patterns: the gather's byte savings beat
    # dense streaming's per-byte speed advantage
    if ell_ok and ell_bytes * _ELL_VS_DENSE < dense_bytes:
        return 'ell'
    if dense_ok:
        return 'dense'
    if ell_ok:
        return 'ell'
    return 'bcoo'


def is_structured(M) -> bool:
    return isinstance(M, (DiaMatrix, EllMatrix, BsrMatrix))


def from_scipy(S, dtype=np.float32, fmt: str | None = None):
    """Convert scipy sparse → the best TPU operator (or a forced format)."""
    fmt = fmt or choose_format(S)
    if fmt == 'dia':
        return dia_from_scipy(S, dtype)
    if fmt == 'ell':
        return ell_from_scipy(S, dtype)
    if fmt == 'bsr':
        return bsr_from_scipy(S, dtype)
    if fmt == 'dense':
        return jnp.asarray(S.toarray(), dtype)
    from jax.experimental import sparse as jsparse

    C = S.tocoo()
    return jsparse.BCOO(
        (jnp.asarray(C.data, dtype), jnp.asarray(np.stack([C.row, C.col], 1))),
        shape=C.shape,
    )
