"""``jax`` algebra backend: the TPU/XLA solver.

Host-side orchestration around :mod:`osqp_tpu.solver.core`.  Exposes the same
low-level surface as the reference binding (reference
src/bindings.cpp.in:107-323): ``setup / solve / warm_start / update_data_vec /
update_data_mat / update_settings / update_rho``.

Direct mode = dense-Schur Cholesky (MXU); indirect mode = diagonally
preconditioned CG (matvec-only) - mirroring the reference's
``solver_type`` setting (reference interface.py:254-260,301-309).

dtype policy: float64 when ``jax_enable_x64`` is on (reference-precision,
works natively on TPU), float32 otherwise.
"""

from __future__ import annotations

import os
import time

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from ..constants import (
    ADAPTIVE_RHO_FIXED,
    CapabilitiesType,
    LinsysSolverType,
    OSQP_INFTY,
    RHO_MAX,
    RHO_MIN,
    SolverError,
    SolverStatus,
    status_string,
)
from ..exceptions import OSQPException
from .._oracle.solver import Info, OracleSettings, Solution
from ..solver import core

NAME = 'jax'

OSQP_USE_FLOAT = 0  # dtype resolved per-solver from the x64 flag


def capabilities() -> int:
    return (
        CapabilitiesType.OSQP_CAPABILITY_DIRECT_SOLVER
        | CapabilitiesType.OSQP_CAPABILITY_INDIRECT_SOLVER
        | CapabilitiesType.OSQP_CAPABILITY_UPDATE_MATRICES
        | CapabilitiesType.OSQP_CAPABILITY_DERIVATIVES
        | CapabilitiesType.OSQP_CAPABILITY_CODEGEN
    )


def solver_types():
    return ('direct', 'indirect')


def _default_dtype(device=None):
    """float64 under x64 mode EXCEPT on devices that cannot compute in f64
    (TPU): there the solver runs float32 regardless of the host x64 flag
    (polish still refines in host float64; see Solver.solve)."""
    platform = (
        getattr(device, 'platform', '') if device is not None else jax.default_backend()
    )
    if platform in ('tpu', 'axon'):
        return jnp.float32
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def _poll_interrupt():
    """Between-chunk interrupt point of the chunked (time_limit) solve loop.

    A real SIGINT raises KeyboardInterrupt in the host loop asynchronously;
    this hook exists so tests can inject one deterministically
    (monkeypatching it to raise).  No-op in production."""


def _resolve_device():
    """Device selection: OSQP_TPU_DEVICE env var ('cpu'/'tpu'/...) overrides
    the JAX default backend.  The TPU-native analogue of the reference's
    ``device`` setting (reference bindings.cpp.in:409)."""
    import os

    name = os.environ.get('OSQP_TPU_DEVICE')
    if name:
        return jax.devices(name)[0]
    return None


class _DeviceScope:
    """Context placing all computation of a method on the solver's device."""

    def __init__(self, device):
        self._device = device
        self._cm = None

    def __enter__(self):
        if self._device is not None:
            self._cm = jax.default_device(self._device)
            self._cm.__enter__()

    def __exit__(self, *exc):
        if self._cm is not None:
            self._cm.__exit__(*exc)


def _qp_data_astype(data: 'core.QPData', dtype) -> 'core.QPData':
    """Cast QPData values to dtype, preserving sparse structure (BCOO
    indices / ELL columns / DIA offsets untouched)."""
    from jax.experimental import sparse as jsparse

    def c(M):
        if isinstance(M, jsparse.BCOO):
            return jsparse.BCOO((M.data.astype(dtype), M.indices), shape=M.shape)
        return M.astype(dtype)  # dense, or DIA/ELL (their astype keeps indices)

    return core.QPData(
        P=c(data.P), q=data.q.astype(dtype), A=c(data.A),
        l=data.l.astype(dtype), u=data.u.astype(dtype),
    )


def _on_device(fn):
    import functools

    @functools.wraps(fn)
    def wrapper(self, *args, **kwargs):
        scope = _DeviceScope(self._device)
        scope.__enter__()
        try:
            return fn(self, *args, **kwargs)
        finally:
            scope.__exit__(None, None, None)

    return wrapper


class Solver:
    """Single-QP solver handle (host state + jitted device computations)."""

    def __init__(self, dtype=None, device=None, sparse='auto'):
        self._dtype = dtype
        self._device = device if device is not None else _resolve_device()
        self._sparse_opt = sparse
        self._is_sparse = False
        self._ws = None

    # -- helpers -----------------------------------------------------------

    @property
    def _indirect(self) -> bool:
        return self._stg.linsys_solver == int(LinsysSolverType.OSQP_INDIRECT_SOLVER)

    def _core_settings(self) -> core.Settings:
        stg = self._stg
        dt = self._dtype
        ct = int(stg.check_termination)
        interval = int(stg.adaptive_rho_interval) or ADAPTIVE_RHO_FIXED
        if ct:
            interval = max(interval, ct)
        cg_eps_min = 1e-12 if dt == jnp.float64 else 1e-7
        f = lambda v: jnp.asarray(v, dt)
        return core.Settings(
            sigma=f(stg.sigma),
            alpha=f(stg.alpha),
            eps_abs=f(stg.eps_abs),
            eps_rel=f(stg.eps_rel),
            eps_prim_inf=f(stg.eps_prim_inf),
            eps_dual_inf=f(stg.eps_dual_inf),
            max_iter=jnp.int32(stg.max_iter),
            check_termination=jnp.int32(ct),
            scaled_termination=jnp.asarray(bool(stg.scaled_termination)),
            check_dualgap=jnp.asarray(bool(stg.check_dualgap)),
            adaptive_rho=jnp.asarray(bool(stg.adaptive_rho)),
            adaptive_rho_interval=jnp.int32(interval),
            adaptive_rho_tolerance=f(stg.adaptive_rho_tolerance),
            rho_is_vec=jnp.asarray(bool(stg.rho_is_vec)),
            cg_max_iter=jnp.int32(stg.cg_max_iter),
            cg_tol_fraction=f(stg.cg_tol_fraction),
            cg_tol_reduction=f(stg.cg_tol_reduction),
            cg_eps_min=f(cg_eps_min),
            iter_cap=jnp.int32(stg.max_iter),
        )

    def _check_convexity(self):
        """Direct mode: the scaled KKT matrix has QDLDL-valid inertia iff
        P_scaled + sigma*I is PD (see _oracle/solver.py setup notes)."""
        if self._indirect:
            return
        P = self._data.P
        n = P.shape[0]
        L = jnp.linalg.cholesky(P + jnp.asarray(self._stg.sigma, P.dtype) * jnp.eye(n, dtype=P.dtype))
        if bool(jnp.any(jnp.isnan(L))):
            raise OSQPException(int(SolverError.OSQP_NONCVX_ERROR))

    def _refactorize(self):
        if self._indirect:
            diag = core.build_M_diag(self._data.P, self._data.A, self._stg.sigma, self._rho.rho_vec)
            L = jnp.zeros((0, 0), self._dtype)
            self._factor = core.Factor(L=L, diag=diag, Minv=jnp.zeros((0, 0), self._dtype))
        else:
            self._factor = core.factorize(
                self._data.P, self._data.A, jnp.asarray(self._stg.sigma, self._dtype), self._rho.rho_vec
            )

    # -- low-level API -----------------------------------------------------

    @_on_device
    def setup(self, P, q, A, l, u, **settings):
        t0 = time.perf_counter()
        self._stg = OracleSettings(**settings)
        if self._dtype is None:
            self._dtype = _default_dtype(self._device)
        dt = self._dtype

        P = sp.csc_matrix(P).astype(np.float64)
        A = sp.csc_matrix(A).astype(np.float64)
        n, m = P.shape[0], A.shape[0]
        q = np.asarray(q, np.float64).ravel()
        l = np.full(m, -OSQP_INFTY) if l is None else np.asarray(l, np.float64).ravel()
        u = np.full(m, OSQP_INFTY) if u is None else np.asarray(u, np.float64).ravel()
        l = np.maximum(l, -OSQP_INFTY)
        u = np.minimum(u, OSQP_INFTY)
        if np.any(l > u):
            raise OSQPException(int(SolverError.OSQP_DATA_VALIDATION_ERROR))

        P_triu = sp.triu(P, format='csc')
        P_full = (P_triu + P_triu.T - sp.diags(P_triu.diagonal())).tocsc()
        self.n, self.m = n, m
        self._P_triu_pattern = P_triu  # CSC pattern for update_data_mat
        self._A_pattern = A.copy()
        self._P_orig = P_full
        self._A_orig = A.copy()
        self._q_orig = q.copy()
        self._l_orig = l.copy()
        self._u_orig = u.copy()

        # Sparse mode: for large problems keep P/A as BCOO operators and run
        # the indirect (PCG) solver - the dense Schur factorization would not
        # fit.  Heuristic mirrors the reference's guidance that large single
        # QPs use solver_type='indirect' (reference interface.py:254-260).
        import os as _os

        dense_entries = n * n + m * n
        self._is_sparse = (
            self._sparse_opt is True
            or _os.environ.get('OSQP_TPU_SPARSE') == '1'
            or (self._sparse_opt == 'auto' and dense_entries > 25_000_000)
        )
        if self._is_sparse:
            if not self._indirect:
                # dense factorization of a huge QP is not available; the
                # sparse path is CG-only
                self._stg.linsys_solver = int(LinsysSolverType.OSQP_INDIRECT_SOLVER)
            from ..ops import spmv
            from ..utils.scaling_host import ruiz_scale_scipy

            if int(self._stg.scaling) > 0:
                P_s, A_s, q_s, l_s, u_s, D, E, c = ruiz_scale_scipy(
                    P_full, A, q, l, u, int(self._stg.scaling)
                )
            else:
                P_s, A_s, q_s, l_s, u_s = P_full, A, q, l, u
                D, E, c = np.ones(n), np.ones(m), 1.0

            # Pick the TPU SpMV format per matrix from the host-side pattern
            # (DIA for banded, ELL for even row occupancy, BCOO fallback) and
            # pin it so value updates rebuild the SAME pytree structure.
            self._sparse_fmt_P = spmv.choose_format(P_s)
            self._sparse_fmt_A = spmv.choose_format(A_s)
            self._data = core.QPData(
                P=spmv.from_scipy(P_s, dt, self._sparse_fmt_P),
                q=jnp.asarray(q_s, dt),
                A=spmv.from_scipy(A_s, dt, self._sparse_fmt_A),
                l=jnp.asarray(l_s, dt),
                u=jnp.asarray(u_s, dt),
            )
            self._scal = core.Scaling(
                D=jnp.asarray(D, dt),
                Dinv=jnp.asarray(1.0 / D, dt),
                E=jnp.asarray(E, dt),
                Einv=jnp.asarray(1.0 / E if m else E, dt),
                c=jnp.asarray(c, dt),
                cinv=jnp.asarray(1.0 / c, dt),
            )
        else:
            Pj = jnp.asarray(P_full.toarray(), dt)
            Aj = jnp.asarray(A.toarray() if m else np.zeros((m, n)), dt)
            qj = jnp.asarray(q, dt)
            lj = jnp.asarray(l, dt)
            uj = jnp.asarray(u, dt)

            if int(self._stg.scaling) > 0:
                self._data, self._scal = core.jit_ruiz(Pj, qj, Aj, lj, uj, int(self._stg.scaling))
            else:
                self._data = core.QPData(P=Pj, q=qj, A=Aj, l=lj, u=uj)
                self._scal = core.identity_scaling(n, m, dt)

            self._check_convexity()

        # scaled bounds on host for constraint typing
        l_s, u_s = np.asarray(self._data.l), np.asarray(self._data.u)
        self._rho = core.make_rho_state(self._data.l, self._data.u, self._stg.rho, bool(self._stg.rho_is_vec))
        self._refactorize()

        self._iterates = core.Iterates(
            x=jnp.zeros((n,), dt), z=jnp.zeros((m,), dt), y=jnp.zeros((m,), dt)
        )
        self._info = Info()
        self._solution = Solution()
        self._first_run = True
        self._clear_update_time = False
        self._info.setup_time = time.perf_counter() - t0
        self._info.rho_estimate = self._stg.rho

    @_on_device
    def solve(self):
        stg = self._stg
        info = self._info
        t0 = time.perf_counter()
        if self._clear_update_time:
            info.update_time = 0.0

        if not stg.warm_starting:
            dt = self._dtype
            self._iterates = core.Iterates(
                x=jnp.zeros((self.n,), dt),
                z=jnp.zeros((self.m,), dt),
                y=jnp.zeros((self.m,), dt),
            )

        if stg.verbose:
            from ..utils.printing import print_iter_header, print_setup_header

            nnz = self._P_orig.nnz + self._A_orig.nnz
            print_setup_header(self.n, self.m, nnz, stg, 'jax', 
                               'indirect' if self._indirect else 'direct', '1.0.0.dev0')
            print_iter_header()

        time_limit = float(stg.time_limit or 0.0)
        # Chunked execution is forced by a time limit and opt-in for plain
        # solves (OSQP_TPU_CHUNKED_SOLVE=1), whose single jitted call could
        # otherwise not be interrupted: the C core polls the SIGINT flag
        # every iteration (reference bindings.cpp.in:349-361), while a
        # device while_loop cannot - chunk boundaries are our poll points.
        chunked = time_limit > 0.0 or os.environ.get('OSQP_TPU_CHUNKED_SOLVE') == '1'
        if not chunked:
            res = core.solve_scaled(
                self._data,
                self._scal,
                self._core_settings(),
                self._rho,
                self._factor,
                self._iterates,
                indirect=self._indirect,
                verbose=bool(stg.verbose),
            )
        else:
            # Chunked continuation: run epochs of iterations, checking the
            # wall clock between chunks (TIME_LIMIT_REACHED semantics of the
            # reference's time_limit setting, bindings.cpp.in:440).  The
            # chunk boundary is also the interrupt point: a KeyboardInterrupt
            # (SIGINT) between chunks yields status OSQP_SIGINT with the
            # last chunk's valid partial iterates - the host-loop analogue of
            # the C core's in-loop interrupt polling (reference
            # bindings.cpp.in:349-361 exports OSQP_SIGINT; the jitted device
            # loop itself cannot poll signals).
            ct = max(int(stg.check_termination), 1)
            chunk = max(10 * ct, 100)
            chunk -= chunk % ct
            it0 = 0
            max_iter = int(stg.max_iter)
            iterates = self._iterates
            rho, factor = self._rho, self._factor
            pd_acc = 0.0  # primdual integral accumulates across chunks
            rupd_acc = 0  # rho_updates accumulate across chunks too
            res = None
            try:
                while True:
                    _poll_interrupt()
                    cs = self._core_settings()._replace(
                        iter_cap=jnp.int32(min(it0 + chunk, max_iter))
                    )
                    res = core.solve_scaled(
                        self._data, self._scal, cs, rho, factor, iterates,
                        indirect=self._indirect, verbose=bool(stg.verbose),
                        it0=jnp.int32(it0),
                    )
                    it0 = int(res.iters)
                    pd_acc += float(res.primdual_acc)
                    rupd_acc += int(res.rho_updates)
                    iterates, rho, factor = res.iterates, res.rho, res.factor
                    if int(res.status) != int(SolverStatus.OSQP_UNSOLVED) or it0 >= max_iter:
                        break
                    if time_limit > 0.0 and time.perf_counter() - t0 > time_limit:
                        res = res._replace(
                            status=jnp.int32(int(SolverStatus.OSQP_TIME_LIMIT_REACHED))
                        )
                        break
            except KeyboardInterrupt:
                if res is None:
                    raise  # interrupted before any chunk completed
                res = res._replace(status=jnp.int32(int(SolverStatus.OSQP_SIGINT)))
            res = res._replace(
                primdual_acc=jnp.asarray(pd_acc), rho_updates=jnp.int32(rupd_acc)
            )

        status = int(res.status)
        self._iterates = res.iterates
        self._rho = res.rho
        self._factor = res.factor

        info.iter = int(res.iters)
        info.obj_val = float(res.obj_val)
        info.dual_obj_val = float(res.dual_obj_val)
        info.duality_gap = float(res.duality_gap)
        info.prim_res = float(res.pri_res)
        info.dual_res = float(res.dua_res)
        info.rho_estimate = float(res.rho_estimate)
        info.rho_updates = int(res.rho_updates)
        info.status_val = status
        info.status = status_string(status)
        self._stg.rho = float(res.rho.rho)
        info.solve_time = time.perf_counter() - t0
        info.rel_kkt_error = float(res.rel_kkt_error)
        # primdual_int (reference bindings.cpp.in:491): the core accumulates
        # the ITERATION integral of min(1, rel_kkt) (a jit'd loop cannot read
        # clocks); convert to the C core's time integral with the measured
        # mean per-iteration time.
        info.primdual_int = (
            float(res.primdual_acc) * info.solve_time / max(int(res.iters), 1)
        )

        x_out = np.asarray(res.x, np.float64)
        y_out = np.asarray(res.y, np.float64)

        # polish (host-gated on the polishing setting + SOLVED status).
        # Always computed in float64: polish is a one-shot high-accuracy
        # refinement (the reference C core always polishes in double) and the
        # Schur operator's 1/delta conditioning defeats float32.
        info.status_polish = 0
        info.polish_time = 0.0
        sol_ls = None
        if stg.polishing and status == int(SolverStatus.OSQP_SOLVED):
            tp = time.perf_counter()
            import contextlib

            f64 = jnp.float64
            ctx = (
                contextlib.nullcontext()
                if jax.config.jax_enable_x64
                else jax.enable_x64(True)
            )
            with ctx:
                pol = core.polish(
                    _qp_data_astype(self._data, f64),
                    core.Scaling(*(v.astype(f64) for v in self._scal)),
                    self._core_settings(),
                    jnp.asarray(stg.delta, f64),
                    jnp.int32(stg.polish_refine_iter),
                    res.iterates.x.astype(f64),
                    res.iterates.z.astype(f64),
                    res.iterates.y.astype(f64),
                    res.pri_res.astype(f64),
                    res.dua_res.astype(f64),
                )
                pol = jax.tree.map(lambda v: np.asarray(v), pol)
                pol = core.PolishResult(*pol)
            if bool(pol.success):
                info.status_polish = 1
                info.obj_val = float(pol.obj_val)
                info.prim_res = float(pol.pri_res)
                info.dual_res = float(pol.dua_res)
                self._iterates = core.Iterates(
                    x=jnp.asarray(pol.x, self._dtype),
                    z=jnp.asarray(pol.z, self._dtype),
                    y=jnp.asarray(pol.y, self._dtype),
                )
                D_h = np.asarray(self._scal.D, np.float64)
                E_h = np.asarray(self._scal.E, np.float64)
                cinv_h = float(self._scal.cinv)
                x_out = D_h * pol.x
                y_out = cinv_h * (E_h * pol.y)
            else:
                info.status_polish = -1
                # line-search fallback family (ref _osqp.py:1817-1826):
                # unscaled samples of the ADMM->polished segment, exposed as
                # results.linesearch
                with ctx:
                    ls = core.line_search_family(
                        _qp_data_astype(self._data, f64),
                        core.Scaling(*(v.astype(f64) for v in self._scal)),
                        res.iterates.x.astype(f64),
                        res.iterates.z.astype(f64),
                        res.iterates.y.astype(f64),
                        jnp.asarray(pol.x, f64),
                        jnp.asarray(pol.z, f64),
                        jnp.asarray(pol.y, f64),
                    )
                from types import SimpleNamespace

                sol_ls = SimpleNamespace(
                    t=np.asarray(ls.t), X=np.asarray(ls.X),
                    Z=np.asarray(ls.Z), Y=np.asarray(ls.Y),
                )
            info.polish_time = time.perf_counter() - tp

        if self._first_run:
            info.run_time = info.setup_time + info.solve_time + info.polish_time
        else:
            info.run_time = info.update_time + info.solve_time + info.polish_time
        self._first_run = False
        self._clear_update_time = True

        if stg.verbose:
            from ..utils.printing import print_footer

            print_footer(info, stg.polishing)

        sol = self._solution
        sol.x = x_out
        sol.y = y_out
        sol.prim_inf_cert = np.asarray(res.prim_inf_cert, np.float64)
        sol.dual_inf_cert = np.asarray(res.dual_inf_cert, np.float64)
        sol.linesearch = sol_ls
        return sol, info

    # -- warm start / updates ----------------------------------------------

    @_on_device
    def warm_start(self, x=None, y=None):
        dt = self._dtype
        self._stg.warm_starting = True
        it = self._iterates
        if x is not None:
            x = np.asarray(x, np.float64).ravel()
            if x.shape != (self.n,):
                raise OSQPException(int(SolverError.OSQP_DATA_VALIDATION_ERROR))
            xs = self._scal.Dinv * jnp.asarray(x, dt)
            zs = self._data.A @ xs if self.m else jnp.zeros((0,), dt)
            it = it._replace(x=xs, z=zs)
        if y is not None:
            y = np.asarray(y, np.float64).ravel()
            if y.shape != (self.m,):
                raise OSQPException(int(SolverError.OSQP_DATA_VALIDATION_ERROR))
            ys = self._scal.c * (self._scal.Einv * jnp.asarray(y, dt))
            it = it._replace(y=ys)
        self._iterates = it

    def _begin_update(self):
        if self._clear_update_time:
            self._clear_update_time = False
            self._info.update_time = 0.0
        return time.perf_counter()

    @_on_device
    def update_data_vec(self, q=None, l=None, u=None):
        t0 = self._begin_update()
        dt = self._dtype
        data = self._data
        if q is not None:
            q = np.asarray(q, np.float64).ravel()
            if q.shape != (self.n,):
                raise OSQPException(int(SolverError.OSQP_DATA_VALIDATION_ERROR))
            self._q_orig = q.copy()
            data = data._replace(q=self._scal.c * (self._scal.D * jnp.asarray(q, dt)))
        bounds_changed = False
        if l is not None:
            l = np.maximum(np.asarray(l, np.float64).ravel(), -OSQP_INFTY)
            if l.shape != (self.m,):
                raise OSQPException(int(SolverError.OSQP_DATA_VALIDATION_ERROR))
            self._l_orig = l.copy()
            data = data._replace(l=self._scal.E * jnp.asarray(l, dt))
            bounds_changed = True
        if u is not None:
            u = np.minimum(np.asarray(u, np.float64).ravel(), OSQP_INFTY)
            if u.shape != (self.m,):
                raise OSQPException(int(SolverError.OSQP_DATA_VALIDATION_ERROR))
            self._u_orig = u.copy()
            data = data._replace(u=self._scal.E * jnp.asarray(u, dt))
            bounds_changed = True
        self._data = data
        if bounds_changed:
            if np.any(self._l_orig > self._u_orig):
                raise OSQPException(int(SolverError.OSQP_DATA_VALIDATION_ERROR))
            # Re-type constraints; refactor only on type change
            # (ref _osqp.py:526-562).
            new_types = core.constraint_types(self._data.l, self._data.u)
            changed = bool(jnp.any(new_types != self._rho.constr_type))
            vec = core.rho_vec_from_types(
                new_types, jnp.asarray(self._stg.rho, dt), bool(self._stg.rho_is_vec)
            )
            self._rho = core.RhoState(
                rho=jnp.clip(jnp.asarray(self._stg.rho, dt), RHO_MIN, RHO_MAX),
                rho_vec=vec,
                rho_inv_vec=jnp.where(vec > 0, 1.0 / vec, 0.0),
                constr_type=new_types,
            )
            if changed:
                self._refactorize()
        info = self._info
        info.status_val = int(SolverStatus.OSQP_UNSOLVED)
        info.status = status_string(info.status_val)
        info.rho_updates = 0
        info.solve_time = 0.0
        info.polish_time = 0.0
        info.update_time += time.perf_counter() - t0

    @_on_device
    def update_data_mat(self, P_x=None, P_i=None, A_x=None, A_i=None):
        t0 = self._begin_update()
        dt = self._dtype

        def _scale_csc(S, rowscale, colscale, mult=1.0):
            """rowscale[i]*S[i,j]*colscale[j]*mult, preserving the exact nnz
            pattern (scipy's diags@S@diags would prune explicit zeros and
            change the operator's pytree structure across updates)."""
            S = S.tocsc(copy=True)
            cols = np.repeat(np.arange(S.shape[1]), np.diff(S.indptr))
            S.data = S.data * rowscale[S.indices] * colscale[cols] * mult
            return S

        if P_x is not None:
            P_triu = self._P_triu_pattern.copy()
            data = P_triu.data.copy()
            if P_i is None:
                if len(P_x) != len(data):
                    raise OSQPException(int(SolverError.OSQP_DATA_VALIDATION_ERROR))
                data[:] = P_x
            else:
                data[np.asarray(P_i, np.int64)] = P_x
            P_triu = sp.csc_matrix((data, P_triu.indices, P_triu.indptr), shape=P_triu.shape)
            self._P_triu_pattern = P_triu
            P_full = (P_triu + P_triu.T - sp.diags(P_triu.diagonal())).tocsc()
            self._P_orig = P_full
            D = np.asarray(self._scal.D, np.float64)
            c = float(self._scal.c)
            if self._is_sparse:
                from ..ops import spmv

                P_scaled_sp = _scale_csc(P_full, D, D, c)
                self._data = self._data._replace(
                    P=spmv.from_scipy(P_scaled_sp, dt, self._sparse_fmt_P)
                )
            else:
                Pj = jnp.asarray(P_full.toarray(), dt)
                P_scaled = self._scal.c * (self._scal.D[:, None] * Pj * self._scal.D[None, :])
                self._data = self._data._replace(P=P_scaled)
        if A_x is not None:
            A = self._A_pattern.copy()
            data = A.data.copy()
            if A_i is None:
                if len(A_x) != len(data):
                    raise OSQPException(int(SolverError.OSQP_DATA_VALIDATION_ERROR))
                data[:] = A_x
            else:
                data[np.asarray(A_i, np.int64)] = A_x
            A = sp.csc_matrix((data, A.indices, A.indptr), shape=A.shape)
            self._A_pattern = A
            self._A_orig = A.copy()
            if self._is_sparse:
                from ..ops import spmv

                D = np.asarray(self._scal.D, np.float64)
                E = np.asarray(self._scal.E, np.float64)
                A_scaled_sp = _scale_csc(A, E, D)
                self._data = self._data._replace(
                    A=spmv.from_scipy(A_scaled_sp, dt, self._sparse_fmt_A)
                )
            else:
                Aj = jnp.asarray(A.toarray(), dt)
                A_scaled = self._scal.E[:, None] * Aj * self._scal.D[None, :]
                self._data = self._data._replace(A=A_scaled)
        if P_x is not None and not self._is_sparse:
            self._check_convexity()
        self._refactorize()
        info = self._info
        info.status_val = int(SolverStatus.OSQP_UNSOLVED)
        info.status = status_string(info.status_val)
        info.update_time += time.perf_counter() - t0

    @_on_device
    def update_rho(self, rho_new):
        if rho_new <= 0:
            raise ValueError('rho must be positive')
        dt = self._dtype
        self._stg.rho = float(min(max(rho_new, RHO_MIN), RHO_MAX))
        vec = core.rho_vec_from_types(
            self._rho.constr_type, jnp.asarray(self._stg.rho, dt), bool(self._stg.rho_is_vec)
        )
        self._rho = self._rho._replace(
            rho=jnp.asarray(self._stg.rho, dt),
            rho_vec=vec,
            rho_inv_vec=jnp.where(vec > 0, 1.0 / vec, 0.0),
        )
        self._refactorize()

    def update_settings(self, **kwargs):
        refactor_needed = False
        for k, v in kwargs.items():
            if not hasattr(self._stg, k):
                raise ValueError(f'Unrecognized setting {k}')
            if k in ('linsys_solver', 'sigma') and getattr(self._stg, k) != v:
                refactor_needed = True
            setattr(self._stg, k, v)
        if refactor_needed:
            self._refactorize()
