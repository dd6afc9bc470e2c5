"""Embedded code generation (coverage model: reference
src/osqp/tests/codegen_vectors_test.py and codegen_matrices_test.py):
generate + compile the embedded C module, import it, and check solve/update
answers to 4-5 decimals against the live solver."""

import shutil
import sys

import numpy as np
import numpy.testing as nptest
import pytest
from scipy import sparse

import osqp_tpu as osqp


@pytest.fixture(scope='module', params=['numpy', 'jax'])
def vec_module(request, tmp_path_factory):
    algebra = request.param
    P = sparse.diags([11.0, 0.0], format='csc')
    q = np.array([3.0, 4.0])
    A = sparse.csc_matrix([[-1, 0], [0, -1], [-1, -3], [2, 5], [3, 4]], dtype=float)
    u = np.array([0.0, 0.0, -15.0, 100.0, 80.0])
    l = -np.inf * np.ones(len(u))
    opts = {
        'verbose': False,
        'eps_abs': 1e-08,
        'eps_rel': 1e-08,
        'rho': 0.01,
        'alpha': 1.6,
        'max_iter': 10000,
        'warm_starting': True,
    }
    model = osqp.OSQP(algebra=algebra)
    model.setup(P=P, q=q, A=A, l=l, u=u, **opts)

    folder = str(tmp_path_factory.mktemp(f'cg_vec_{algebra}'))
    ext = f'vec_emosqp_{algebra}'
    model_dir = model.codegen(
        folder, extension_name=ext, force_rewrite=True, prefix='foo', compile=True
    )
    sys.path.insert(0, model_dir)
    mod = __import__(ext)
    yield mod, model, (P, q, A, l, u, opts)
    sys.path.remove(model_dir)


def test_codegen_vectors_solve(vec_module):
    mod, model, _ = vec_module
    x, y, status, niter, run_time = mod.solve()
    nptest.assert_array_almost_equal(x, np.array([0.0, 5.0]), decimal=5)
    nptest.assert_array_almost_equal(
        y, np.array([1.66666667, 0.0, 1.33333333, 0.0, 0.0]), decimal=5
    )
    assert status == 1
    assert niter > 0


def test_codegen_vectors_update_q(vec_module):
    mod, model, (P, q, A, l, u, opts) = vec_module
    q_new = np.array([10.0, 20.0])
    mod.update_data_vec(q=q_new)
    x, y, *_ = mod.solve()
    ref = osqp.OSQP(algebra=model.algebra)
    ref.setup(P=P, q=q_new, A=A, l=l, u=u, **opts)
    r = ref.solve()
    nptest.assert_array_almost_equal(x, r.x, decimal=4)
    mod.update_data_vec(q=q)  # restore


def test_codegen_vectors_update_bounds(vec_module):
    mod, model, (P, q, A, l, u, opts) = vec_module
    l_new = -100.0 * np.ones(5)
    u_new = 1000.0 * np.ones(5)
    mod.update_data_vec(l=l_new, u=u_new)
    x, y, *_ = mod.solve()
    ref = osqp.OSQP(algebra=model.algebra)
    ref.setup(P=P, q=q, A=A, l=l_new, u=u_new, **opts)
    r = ref.solve()
    nptest.assert_array_almost_equal(x, r.x, decimal=4)
    mod.update_data_vec(l=l, u=u)  # restore


def test_codegen_vectors_bad_bounds(vec_module):
    mod, *_ = vec_module
    with pytest.raises(ValueError):
        mod.update_data_vec(l=np.ones(5), u=-np.ones(5))


@pytest.fixture(scope='module')
def mat_module(tmp_path_factory):
    P = sparse.diags([11.0, 0.1], format='csc')
    q = np.array([3.0, 4.0])
    A = sparse.csc_matrix([[-1, 0], [0, -1], [-1, -3], [2, 5], [3, 4]], dtype=float)
    u = np.array([0.0, 0.0, -15.0, 100.0, 80.0])
    l = -np.inf * np.ones(len(u))
    opts = {
        'verbose': False,
        'eps_abs': 1e-08,
        'eps_rel': 1e-08,
        'alpha': 1.6,
        'max_iter': 3000,
        'warm_starting': True,
    }
    model = osqp.OSQP(algebra='numpy')
    model.setup(P=P, q=q, A=A, l=l, u=u, **opts)
    folder = str(tmp_path_factory.mktemp('cg_mat'))
    model_dir = model.codegen(
        folder,
        parameters='matrices',
        extension_name='mat_emosqp_t',
        force_rewrite=True,
        prefix='bar',
        compile=True,
    )
    sys.path.insert(0, model_dir)
    mod = __import__('mat_emosqp_t')
    yield mod, model, (P, q, A, l, u, opts)
    sys.path.remove(model_dir)


def test_codegen_matrices_solve(mat_module):
    mod, model, _ = mat_module
    x, y, status, niter, run_time = mod.solve()
    r = model.solve()
    nptest.assert_array_almost_equal(x, r.x, decimal=4)
    nptest.assert_array_almost_equal(y, r.y, decimal=4)


def test_codegen_matrices_update_P(mat_module):
    mod, model, (P, q, A, l, u, opts) = mat_module
    P_new = sparse.eye(2, format='csc')
    Px = sparse.triu(P_new).tocsc().data
    mod.update_data_mat(P_x=Px, P_i=np.arange(len(Px), dtype=np.int32))
    x, *_ = mod.solve()
    ref = osqp.OSQP(algebra='numpy')
    ref.setup(P=P_new, q=q, A=A, l=l, u=u, **opts)
    r = ref.solve()
    nptest.assert_array_almost_equal(x, r.x, decimal=4)
    # restore
    P0x = sparse.triu(P).tocsc().data
    mod.update_data_mat(P_x=P0x)


def test_codegen_matrices_update_A(mat_module):
    mod, model, (P, q, A, l, u, opts) = mat_module
    A_new = sparse.csc_matrix(
        [[-1, 0], [0, -1], [-2, -2], [2, 5], [3, 4]], dtype=float
    )
    mod.update_data_mat(A_x=A_new.data)
    x, *_ = mod.solve()
    ref = osqp.OSQP(algebra='numpy')
    ref.setup(P=P, q=q, A=A_new, l=l, u=u, **opts)
    r = ref.solve()
    nptest.assert_array_almost_equal(x, r.x, decimal=4)
    mod.update_data_mat(A_x=A.tocsc().data)


def _tiny_model():
    P = sparse.diags([11.0, 0.0], format='csc')
    q = np.array([3.0, 4.0])
    A = sparse.csc_matrix([[-1, 0], [0, -1], [-1, -3], [2, 5], [3, 4]], dtype=float)
    u = np.array([0.0, 0.0, -15.0, 100.0, 80.0])
    l = -np.inf * np.ones(len(u))
    model = osqp.OSQP(algebra='numpy')
    model.setup(P=P, q=q, A=A, l=l, u=u, verbose=False, eps_abs=1e-6, eps_rel=1e-6)
    return model


def test_codegen_defines_change_emitted_c(tmp_path):
    """printing/profiling/interrupt/derivatives flags must alter the emitted C
    (reference wires them via OSQPCodegenDefines, interface.py:469-477)."""
    model = _tiny_model()

    off = str(tmp_path / 'off')
    model.codegen(off, extension_name=None, force_rewrite=True)
    src_off = (tmp_path / 'off' / 'emosqp_solver.c').read_text()
    assert '#define EMB_PRINTING 0' in src_off
    assert '#define EMB_PROFILING 0' in src_off
    assert '#define EMB_INTERRUPT 0' in src_off
    assert '#define EMB_DERIVATIVES 0' in src_off

    on = str(tmp_path / 'on')
    model.codegen(on, extension_name=None, force_rewrite=True,
                  printing_enable=True, profiling_enable=True,
                  interrupt_enable=True, derivatives_enable=True)
    src_on = (tmp_path / 'on' / 'emosqp_solver.c').read_text()
    hdr_on = (tmp_path / 'on' / 'workspace.h').read_text()
    assert '#define EMB_PRINTING 1' in src_on
    assert '#define EMB_PROFILING 1' in src_on
    assert '#define EMB_INTERRUPT 1' in src_on
    assert '#define EMB_DERIVATIVES 1' in src_on
    assert 'osqp_request_interrupt' in src_on
    assert 'osqp_request_interrupt' in hdr_on
    assert src_on != src_off


@pytest.mark.parametrize('use_float', [False, True])
def test_codegen_defines_compile_both_widths(tmp_path, use_float, capfd):
    """All flags on must still compile (both float widths) and solve; printing
    emits progress rows on stdout."""
    model = _tiny_model()
    folder = str(tmp_path / f'flags_{int(use_float)}')
    ext = f'em_flags_{int(use_float)}'
    model_dir = model.codegen(
        folder, extension_name=ext, force_rewrite=True, compile=True,
        use_float=use_float, printing_enable=True, profiling_enable=True,
        interrupt_enable=True,
    )
    sys.path.insert(0, model_dir)
    try:
        mod = __import__(ext)
        x, y, status, niter, run_time = mod.solve()
    finally:
        sys.path.remove(model_dir)
    decimal = 3 if use_float else 5
    nptest.assert_array_almost_equal(x, np.array([0.0, 5.0]), decimal=decimal)
    assert status == 1
    assert run_time > 0  # profiling compiled in
    out = capfd.readouterr().out
    assert 'iter' in out and 'status' in out  # printing compiled in


def test_codegen_aot_export():
    """TPU-native AOT 'codegen': compiled fixed-shape executable."""
    import jax.numpy as jnp

    from osqp_tpu.codegen.driver import export_aot

    P = sparse.diags([11.0, 0.0], format='csc')
    q = np.array([3.0, 4.0])
    A = sparse.csc_matrix([[-1, 0], [0, -1], [-1, -3], [2, 5], [3, 4]], dtype=float)
    u = np.array([0.0, 0.0, -15.0, 100.0, 80.0])
    l = -1e6 * np.ones(len(u))
    from utils import f32_device

    eps = 1e-5 if f32_device() else 1e-8
    model = osqp.OSQP(algebra='jax')
    model.setup(P=P, q=q, A=A, l=l, u=u, verbose=False, eps_abs=eps, eps_rel=eps)
    compiled = export_aot(model)
    dt = model._solver._dtype  # AOT executable is fixed to the solver dtype
    x, y, status, iters = compiled(
        jnp.asarray(q, dt), jnp.asarray(l, dt), jnp.asarray(u, dt)
    )
    nptest.assert_array_almost_equal(np.asarray(x), [0.0, 5.0],
                                     decimal=3 if f32_device() else 5)
    assert int(status) == 1


@pytest.fixture(scope='module')
def sparse_cg_module(tmp_path_factory):
    """n=2000 banded QP through the SPARSE embedded emitter: CSR + PCG,
    O(nnz) statics — the analogue of the reference shipping its sparse
    codegen_src into the emitted project (ref interface.py:480-488)."""
    n = 2000
    rng = np.random.default_rng(0)
    P = sparse.diags(
        [np.full(n, 2.0), np.full(n - 1, -0.7), np.full(n - 1, -0.7)], [0, 1, -1]
    ).tocsc()
    A = (sparse.eye(n) + sparse.diags([np.full(n - 2, 0.4)], [2], shape=(n, n))).tocsc()
    q = rng.standard_normal(n)
    x0 = rng.standard_normal(n)
    s0 = rng.random(n) + 0.1
    u = A @ x0 + s0
    l = u - 2 * s0
    from utils import solve_eps

    eps = solve_eps(1e-5, f32=1e-4)  # live comparator runs f32 on the chip rows
    opts = dict(verbose=False, eps_abs=eps, eps_rel=eps)
    model = osqp.OSQP(algebra='jax', sparse=True)
    model.setup(P=P, q=q, A=A, l=l, u=u, **opts)

    folder = str(tmp_path_factory.mktemp('cg_sparse'))
    ext = 'sparse_emosqp'
    model_dir = model.codegen(
        folder, parameters='matrices', extension_name=ext,
        force_rewrite=True, compile=True,  # embedded_algebra='auto' -> sparse
    )
    sys.path.insert(0, model_dir)
    mod = __import__(ext)
    yield mod, model, (P, q, A, l, u)
    sys.path.remove(model_dir)


def test_codegen_sparse_workspace_is_O_nnz(sparse_cg_module, tmp_path):
    mod, model, _ = sparse_cg_module
    import os

    folder = os.path.dirname(mod.__file__)
    src = open(os.path.join(folder, 'workspace.c')).read()
    # CSR data baked, NO dense matrices / Cholesky factor
    assert 'P_data' in src and 'At_data' in src and 'diag_M' in src
    assert 'double L[' not in src and ' P[' not in src
    # a dense n=2000 workspace would be >70 MB of literals; sparse is ~1 MB
    assert os.path.getsize(os.path.join(folder, 'workspace.c')) < 5_000_000


def test_codegen_sparse_solve_and_updates(sparse_cg_module):
    mod, model, (P, q, A, l, u) = sparse_cg_module
    x, y, status, niter, _ = mod.solve()
    assert status == 1
    ref = model.solve()
    nptest.assert_allclose(x, ref.x, atol=1e-2)

    # vector update
    mod.update_data_vec(q=q + 0.1)
    x2, _, s2, _, _ = mod.solve()
    assert s2 == 1
    model.update(q=q + 0.1)
    nptest.assert_allclose(x2, model.solve().x, atol=5e-3)

    # matrix value update through the baked CSR index maps
    Px_new = sparse.triu(P, format='csc').data * 1.2
    mod.update_data_mat(P_x=Px_new)
    x3, _, s3, _, _ = mod.solve()
    assert s3 == 1
    model.update(Px=Px_new)
    nptest.assert_allclose(x3, model.solve().x, atol=5e-3)
    # restore for other tests
    mod.update_data_vec(q=q)
    mod.update_data_mat(P_x=sparse.triu(P, format='csc').data)


@pytest.mark.parametrize('algebra,embedded_algebra', [
    ('jax', 'dense'), ('jax', 'sparse'), ('numpy', 'dense'),
])
def test_codegen_explicit_zero_pattern_slots(tmp_path, algebra, embedded_algebra):
    """Explicit stored zeros (slots reserved for later update_data_mat)
    must survive into the baked pattern/index maps: scipy binary ops prune
    them, which desynchronized the maps from the user's data order
    (round-5 review finding; both emitters affected)."""
    import sys as _sys

    n = 6
    rows = [0, 1, 2, 3, 4, 5, 0, 1, 2, 3, 4, 1, 2, 3, 4, 5, 0, 3]
    cols = [0, 1, 2, 3, 4, 5, 1, 2, 3, 4, 5, 0, 1, 2, 3, 4, 3, 0]
    vals = [2.0] * 6 + [-0.5] * 5 + [-0.5] * 5 + [0.0, 0.0]
    P = sparse.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsc()
    A = sparse.eye(n, format='csc')
    q = np.arange(1.0, n + 1)
    l, u = -np.ones(n), np.ones(n)
    model = osqp.OSQP(algebra=algebra)
    model.setup(P=P, q=q, A=A, l=l, u=u, verbose=False,
                eps_abs=1e-8, eps_rel=1e-8)
    ext = f'zero_slot_{algebra}_{embedded_algebra}'
    folder = model.codegen(str(tmp_path), parameters='matrices',
                           extension_name=ext, force_rewrite=True,
                           compile=True, embedded_algebra=embedded_algebra)
    _sys.path.insert(0, folder)
    try:
        mod = __import__(ext)
        Ptriu = sparse.triu(P, format='csc')
        Px = Ptriu.data.copy()
        ct = np.repeat(np.arange(n), np.diff(Ptriu.indptr))
        slot = np.where((Ptriu.indices == 0) & (ct == 3))[0][0]
        Px[slot] = 0.3  # fill the reserved slot
        mod.update_data_mat(P_x=Px)
        x, _, status, _, _ = mod.solve()
        model.update(Px=Px)
        ref = model.solve()
        assert status == 1
        nptest.assert_allclose(x, ref.x, atol=1e-5)
    finally:
        _sys.path.remove(folder)


def test_codegen_sparse_use_float_compiles_and_solves(tmp_path):
    """float32 sparse emitter: CG tolerance above the f32 floor + the
    stagnation patience window must still converge the embedded solve."""
    import sys as _sys

    n = 300
    rng = np.random.default_rng(2)
    P = sparse.diags([np.full(n, 2.0), np.full(n - 1, -0.6),
                      np.full(n - 1, -0.6)], [0, 1, -1]).tocsc()
    A = sparse.eye(n, format='csc')
    q = rng.standard_normal(n)
    l, u = -np.ones(n), np.ones(n)
    model = osqp.OSQP(algebra='jax')
    model.setup(P=P, q=q, A=A, l=l, u=u, verbose=False,
                eps_abs=1e-4, eps_rel=1e-4)
    folder = model.codegen(str(tmp_path), extension_name='emf32s',
                           force_rewrite=True, compile=True, use_float=True,
                           embedded_algebra='sparse')
    _sys.path.insert(0, folder)
    try:
        mod = __import__('emf32s')
        x, _, status, niter, _ = mod.solve()
        assert status in (1, 2), status
        ref = model.solve()
        nptest.assert_allclose(x, ref.x, atol=1e-2)
        assert niter < 4000  # not stuck at the CG/ADMM caps
    finally:
        _sys.path.remove(folder)
