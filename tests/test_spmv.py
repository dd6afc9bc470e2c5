"""DIA/ELL/BSR/dense TPU SpMV operators: exactness and end-to-end solves.

The reference's indirect path does SpMV through cuSPARSE (reference
CMakeLists.txt:53-57); ours picks a gather-light format per matrix
(osqp_tpu/ops/spmv.py).  These tests pin (a) matvec/transpose/diag/gram_diag
exactness for each format against dense numpy, (b) the format chooser's
decisions (DIA for banded, BSR for clustered, dense-streaming for
moderate unstructured, ELL/BCOO beyond the HBM budget), and (c) that a
sparse-mode solve agrees with the dense-mode solution under every forced
format.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import osqp_tpu
from osqp_tpu.ops import spmv

from utils import solve_eps


def _random_banded(m, n, offsets, seed=0):
    rng = np.random.default_rng(seed)
    S = sp.lil_matrix((m, n))
    for o in offsets:
        i = np.arange(max(0, -o), min(m, n - o))
        S[i, i + o] = rng.standard_normal(len(i))
    return S.tocsc()


def _random_sparse(m, n, density=0.05, seed=0):
    rng = np.random.default_rng(seed)
    return sp.random(m, n, density=density, random_state=rng, format='csc')


@pytest.mark.parametrize('builder,fmt', [
    (lambda: _random_banded(40, 56, (-3, 0, 2, 7)), 'dia'),
    (lambda: _random_sparse(40, 56, 0.08, seed=1), 'ell'),
    (lambda: _random_sparse(56, 40, 0.12, seed=2), 'ell'),
    (lambda: _random_banded(33, 33, (-5, -1, 0, 1, 5)), 'dia'),
])
def test_matvec_exactness(builder, fmt):
    S = builder()
    m, n = S.shape
    M = spmv.from_scipy(S, np.float64, fmt)
    rng = np.random.default_rng(3)
    v = rng.standard_normal(n)
    w = rng.standard_normal(m)
    Sd = S.toarray()
    np.testing.assert_allclose(np.asarray(M @ v), Sd @ v, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(M.T @ w), Sd.T @ w, rtol=1e-12, atol=1e-12)
    # gram_diag: diag(S' diag(rho) S)
    rho = rng.uniform(0.5, 2.0, m)
    np.testing.assert_allclose(
        np.asarray(M.gram_diag(rho)),
        np.diag(Sd.T @ np.diag(rho) @ Sd),
        rtol=1e-11, atol=1e-12,
    )
    np.testing.assert_allclose(np.asarray(M.todense()), Sd, rtol=1e-12, atol=1e-12)


def test_diag_square():
    S = _random_banded(30, 30, (-2, 0, 4), seed=5)
    for fmt in ('dia', 'ell'):
        M = spmv.from_scipy(S, np.float64, fmt)
        np.testing.assert_allclose(np.asarray(M.diag()), S.toarray().diagonal(), rtol=1e-12)
    # no main diagonal stored
    S2 = _random_banded(30, 30, (-2, 4), seed=6)
    M2 = spmv.from_scipy(S2, np.float64, 'dia')
    np.testing.assert_allclose(np.asarray(M2.diag()), np.zeros(30))


def _clustered_sparse(mb, nb, frac=0.1, R=8, C=128, seed=0):
    """Block-clustered pattern: a random ``frac`` of the (R, C) blocks of an
    (mb*R, nb*C) matrix are DENSE — coupled sub-system structure."""
    rng = np.random.default_rng(seed)
    picks = rng.random((mb, nb)) < frac
    br, bc = np.nonzero(picks)
    if br.size == 0:
        br, bc = np.array([0]), np.array([0])
    rows = (br[:, None] * R + np.arange(R)[None, :]).repeat(C, axis=1).ravel()
    cols = np.tile((bc[:, None] * C + np.arange(C)[None, :]), (1, R)).ravel()
    data = rng.standard_normal(rows.size)
    return sp.coo_matrix((data, (rows, cols)), shape=(mb * R, nb * C)).tocsc()


def test_choose_format(monkeypatch):
    monkeypatch.delenv('OSQP_TPU_SPARSE_FORMAT', raising=False)
    banded = _random_banded(200, 200, (-1, 0, 1))
    assert spmv.choose_format(banded) == 'dia'
    # block-clustered pattern -> BSR when the blocks save >=4x the bytes of
    # dense streaming (chip-measured per-byte speed gap, spmv._BSR_VS_DENSE)
    clustered = _clustered_sparse(64, 8, frac=0.01, seed=9)
    assert spmv.choose_format(clustered) == 'bsr'
    # a denser cluster pattern does NOT save enough bytes -> dense streaming
    packed = _clustered_sparse(16, 8, frac=0.3, seed=7)
    assert spmv.choose_format(packed) == 'dense'
    # moderate unstructured pattern -> dense streaming beats gathers on TPU
    even_rows = _random_sparse(200, 200, 0.05, seed=7)
    assert spmv.choose_format(even_rows) == 'dense'
    ragged = _random_sparse(400, 400, 0.004, seed=8).tolil()
    ragged[0, :] = 1.0
    assert spmv.choose_format(ragged.tocsc()) == 'dense'
    # beyond the HBM budget, unstructured falls back to gather formats
    monkeypatch.setenv('OSQP_TPU_DENSE_SPMV_BYTES', '100000')
    assert spmv.choose_format(even_rows) in ('ell', 'bcoo')
    assert spmv.choose_format(ragged.tocsc()) == 'bcoo'
    # ...but clustered stays BSR even with no dense budget
    assert spmv.choose_format(clustered) == 'bsr'
    monkeypatch.delenv('OSQP_TPU_DENSE_SPMV_BYTES', raising=False)
    monkeypatch.setenv('OSQP_TPU_SPARSE_FORMAT', 'ell')
    assert spmv.choose_format(banded) == 'ell'


def test_jit_through_operator():
    import jax

    S = _random_banded(24, 24, (-1, 0, 1), seed=9)
    for fmt in ('dia', 'ell', 'bsr'):
        M = spmv.from_scipy(S, np.float64, fmt)
        f = jax.jit(lambda op, v: op @ v)
        v = np.random.default_rng(0).standard_normal(24)
        np.testing.assert_allclose(np.asarray(f(M, v)), S @ v, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize('builder', [
    lambda: _clustered_sparse(5, 3, frac=0.3, seed=11),
    # non-block-aligned shapes (317 x 290): partial edge blocks
    lambda: _random_sparse(317, 290, 0.03, seed=12),
    lambda: _random_banded(130, 130, (-9, -1, 0, 1, 9), seed=13),
    # a matrix with an empty block-row
    lambda: sp.csc_matrix(
        (np.ones(3), (np.array([0, 1, 60]), np.array([5, 200, 17]))),
        shape=(64, 260),
    ),
])
def test_bsr_exactness(builder):
    S = builder().tocsc()
    S.sum_duplicates()
    m, n = S.shape
    M = spmv.from_scipy(S, np.float64, 'bsr')
    rng = np.random.default_rng(4)
    v = rng.standard_normal(n)
    w = rng.standard_normal(m)
    Sd = S.toarray()
    np.testing.assert_allclose(np.asarray(M @ v), Sd @ v, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(M.T @ w), Sd.T @ w, rtol=1e-12, atol=1e-12)
    rho = rng.uniform(0.5, 2.0, m)
    np.testing.assert_allclose(
        np.asarray(M.gram_diag(rho)),
        np.diag(Sd.T @ np.diag(rho) @ Sd),
        rtol=1e-11, atol=1e-12,
    )
    np.testing.assert_allclose(np.asarray(M.todense()), Sd, rtol=1e-12, atol=1e-12)
    if m == n:
        np.testing.assert_allclose(np.asarray(M.diag()), Sd.diagonal(), rtol=1e-12)


def test_dia_many_bands_scan_path():
    """Above _DIA_UNROLL_MAX diagonals the matvec rolls into a lax.scan
    (constant-size graph, VERDICT weak #8); exactness must be identical."""
    offsets = tuple(sorted(set(
        np.random.default_rng(21).integers(-90, 90, 120).tolist()
    )))
    assert len(offsets) > spmv._DIA_UNROLL_MAX
    S = _random_banded(128, 128, offsets, seed=22)
    M = spmv.from_scipy(S, np.float64, 'dia')
    rng = np.random.default_rng(23)
    v = rng.standard_normal(128)
    w = rng.standard_normal(128)
    Sd = S.toarray()
    np.testing.assert_allclose(np.asarray(M @ v), Sd @ v, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(M.T @ w), Sd.T @ w, rtol=1e-12, atol=1e-12)
    rho = rng.uniform(0.5, 2.0, 128)
    np.testing.assert_allclose(
        np.asarray(M.gram_diag(rho)),
        np.diag(Sd.T @ np.diag(rho) @ Sd), rtol=1e-11, atol=1e-12,
    )


def _mpc_like_qp(T=14, seed=0):
    """Banded MPC-cascade QP (tridiagonal-ish A) — the DIA showcase."""
    rng = np.random.default_rng(seed)
    n = 2 * T
    P = sp.diags([np.full(n, 2.0), np.full(n - 1, -0.6), np.full(n - 1, -0.6)],
                 [0, 1, -1]).tocsc()
    q = rng.standard_normal(n)
    A = sp.eye(n, format='csc') + sp.diags([np.full(n - 2, 0.3)], [-2], shape=(n, n))
    l = -np.ones(n) * 2
    u = np.ones(n) * 2
    return P, q, A.tocsc(), l, u


@pytest.mark.parametrize('fmt', ['dia', 'ell', 'bcoo', 'bsr', 'dense'])
def test_sparse_mode_solve_matches_dense(fmt, monkeypatch):
    monkeypatch.setenv('OSQP_TPU_SPARSE_FORMAT', fmt)
    P, q, A, l, u = _mpc_like_qp()
    eps = solve_eps(1e-7)  # f32 chip rows cannot reach 1e-7
    common = dict(eps_abs=eps, eps_rel=eps, polishing=False, verbose=False)

    ref = osqp_tpu.OSQP()
    ref.setup(P=P, q=q, A=A, l=l, u=u, **common)
    r_dense = ref.solve()

    s = osqp_tpu.OSQP(algebra='jax', sparse=True)
    s.setup(P=P, q=q, A=A, l=l, u=u, **common)
    r_sparse = s.solve()

    assert r_sparse.info.status == r_dense.info.status == 'solved'
    rt, at = (1e-3, 1e-3) if eps > 1e-6 else (1e-4, 1e-5)
    np.testing.assert_allclose(r_sparse.x, r_dense.x, rtol=rt, atol=at)
    np.testing.assert_allclose(r_sparse.y, r_dense.y, rtol=rt, atol=max(at, 1e-4))


def test_sparse_mode_auto_picks_dia_for_banded(monkeypatch):
    """The format chooser must route banded public-API problems to DIA
    without any env forcing, and an LP's empty P must be handled (zero
    bands)."""
    monkeypatch.delenv('OSQP_TPU_SPARSE_FORMAT', raising=False)
    P, q, A, l, u = _mpc_like_qp(seed=8)
    s = osqp_tpu.OSQP(algebra='jax', sparse=True)
    s.setup(P=P, q=q, A=A, l=l, u=u, verbose=False)
    assert s._solver._sparse_fmt_P == 'dia'
    assert s._solver._sparse_fmt_A == 'dia'
    assert s.solve().info.status == 'solved'
    # LP: P has zero nnz -> trivially-empty DIA operator
    n = A.shape[1]
    s2 = osqp_tpu.OSQP(algebra='jax', sparse=True)
    s2.setup(P=sp.csc_matrix((n, n)), q=np.abs(q), A=A, l=l, u=u, verbose=False)
    r2 = s2.solve()
    assert r2.info.status in ('solved', 'solved inaccurate')


def _super_clustered(nsb, pairs, seed, scale):
    """Symmetric block-clustered (nsb*128)^2 matrix: dense 128x128
    super-blocks at the diagonal and at the given (i, j)+(j, i) pairs —
    coupled-sub-system structure, block-aligned so BSR padding is tiny."""
    rng = np.random.default_rng(seed)
    n = nsb * 128
    S = sp.lil_matrix((n, n))
    for (i, j) in [(i, i) for i in range(nsb)] + sorted(pairs):
        B = rng.standard_normal((128, 128)) * scale
        if i == j:
            B = (B + B.T) / 2
        S[i * 128:(i + 1) * 128, j * 128:(j + 1) * 128] = B
        if i != j:  # symmetric placement: the (j, i) block is B'
            S[j * 128:(j + 1) * 128, i * 128:(i + 1) * 128] = B.T
    return S.tocsc()


def _clustered_qp(seed=0, nsb=32, n_pairs=15):
    """QP whose P/A patterns are scattered dense 128x128 super-blocks — the
    BSR showcase (sparse enough that block storage saves >=4x the bytes of
    dense streaming).  P is PSD by diagonal dominance (small off-diagonal
    values, unit diagonal ridge)."""
    rng = np.random.default_rng(seed)
    n = nsb * 128
    pairs = set()
    while len(pairs) < n_pairs:
        i, j = sorted(rng.integers(nsb, size=2))
        if i != j:
            pairs.add((int(i), int(j)))
    scale = 1.0 / (128 * 8)  # row sums << 1 -> diagonally dominant P
    P = (_super_clustered(nsb, pairs, seed, scale) + sp.eye(n)).tocsc()
    A = _super_clustered(nsb, pairs, seed + 1, 1.0 / 64).tocsc()
    A = (A + sp.eye(n)).tocsc()
    q = rng.standard_normal(n)
    x0 = rng.standard_normal(n)
    s0 = rng.random(n) + 0.1
    u = A @ x0 + s0
    l = u - 2 * s0
    return P, q, A, l, u


def test_sparse_mode_auto_picks_bsr_for_clustered(monkeypatch):
    """Block-clustered public-API problems must auto-route to the BSR
    operator (the TPU replacement for cuSPARSE SpMV on clustered patterns,
    reference CMakeLists.txt:53-57) and reach a KKT-verified optimum
    (n=4096: a dense comparator would be too slow on CI, so optimality is
    certified directly from the returned solution)."""
    monkeypatch.delenv('OSQP_TPU_SPARSE_FORMAT', raising=False)
    P, q, A, l, u = _clustered_qp(seed=5)
    eps = solve_eps(1e-5, f32=1e-4)
    # classic residual termination (no duality-gap early exit) so the
    # direct stationarity certificate below is the criterion actually met
    common = dict(eps_abs=eps, eps_rel=eps, polishing=False, verbose=False,
                  check_dualgap=False)
    s = osqp_tpu.OSQP(algebra='jax', sparse=True)
    s.setup(P=P, q=q, A=A, l=l, u=u, **common)
    assert s._solver._sparse_fmt_P == 'bsr', s._solver._sparse_fmt_P
    assert s._solver._sparse_fmt_A == 'bsr', s._solver._sparse_fmt_A
    r = s.solve()
    assert r.info.status == 'solved'

    # direct KKT certificate on the ORIGINAL data
    tol = 50 * eps
    assert (A @ r.x <= u + tol).all() and (A @ r.x >= l - tol).all()
    station = np.abs(P @ r.x + q + A.T @ r.y).max()
    scale = max(np.abs(q).max(), np.abs(P @ r.x).max(), np.abs(A.T @ r.y).max(), 1.0)
    assert station <= 100 * eps * scale, (station, scale)


@pytest.mark.parametrize('fmt', ['dia', 'ell', 'bsr', 'dense'])
def test_sparse_mode_update_vectors_and_mats(fmt, monkeypatch):
    monkeypatch.setenv('OSQP_TPU_SPARSE_FORMAT', fmt)
    P, q, A, l, u = _mpc_like_qp(seed=4)
    eps = solve_eps(1e-7)
    rt, at = (1e-3, 1e-3) if eps > 1e-6 else (1e-4, 1e-5)
    common = dict(eps_abs=eps, eps_rel=eps, polishing=False, verbose=False)
    s = osqp_tpu.OSQP(algebra='jax', sparse=True)
    s.setup(P=P, q=q, A=A, l=l, u=u, **common)
    s.solve()
    # vector update
    q2 = q + 0.25
    s.update(q=q2)
    r = s.solve()
    ref = osqp_tpu.OSQP()
    ref.setup(P=P, q=q2, A=A, l=l, u=u, **common)
    r_ref = ref.solve()
    np.testing.assert_allclose(r.x, r_ref.x, rtol=rt, atol=at)
    # matrix value update (same pattern)
    Ax_new = A.copy().data * 1.1
    s.update(Ax=Ax_new)
    r2 = s.solve()
    A2 = A.copy()
    A2.data = Ax_new
    ref2 = osqp_tpu.OSQP()
    ref2.setup(P=P, q=q2, A=A2, l=l, u=u, **common)
    rr2 = ref2.solve()
    np.testing.assert_allclose(r2.x, rr2.x, rtol=rt, atol=at)
