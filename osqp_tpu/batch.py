"""Batched QP solving: thousands of same-structure QPs per chip via vmap.

This is the TPU-native replacement for the reference's thread-pool batch
parallelism (reference src/osqp/nn/torch.py:200-217 uses joblib threads over
per-instance C solvers; reference tests/multithread_test.py proves 2-thread
scaling).  Here the *entire* ADMM solver - Ruiz scaling, Cholesky
factorization, the fixed-point loop, termination checks, adaptive rho with
in-loop refactorization - is vmapped over stacked problem data and compiled
into a single XLA program, so one TPU chip advances every instance in
lock-step on the MXU with zero host round-trips.

Batch semantics of the while_loop: instances that converge early are frozen
(select-masked) while the rest continue; per-instance iteration counts and
statuses are exact.

The MPC hot path: ``update(q=..., l=..., u=...)`` stages new data host-side;
the next ``solve()`` fuses rescaling + constraint retyping + refactorization
+ the solve into one jit call.
"""

from __future__ import annotations

import functools
import time
from types import SimpleNamespace

import numpy as np

import jax
import jax.numpy as jnp

from .backends.jax_backend import _default_dtype, _on_device, _resolve_device
from .constants import SolverStatus, status_string
from ._oracle.solver import OracleSettings
from .solver import core


@functools.partial(jax.jit, static_argnames=('scaling_iters', 'indirect', 'kkt_method'))
def _setup_batch(P, q, A, l, u, rho, settings: core.Settings, scaling_iters: int, indirect: bool,
                 kkt_method: str = 'chol'):
    """Vmapped: scale, type constraints, factorize."""

    def one(P, q, A, l, u, rho):
        if scaling_iters > 0:
            data, scal = core.ruiz_scale(P, q, A, l, u, scaling_iters)
        else:
            data = core.QPData(P=P, q=q, A=A, l=l, u=u)
            scal = core.identity_scaling(P.shape[0], A.shape[0], P.dtype)
        rho_state = core.make_rho_state(data.l, data.u, rho, settings.rho_is_vec)
        if indirect:
            diag = core.build_M_diag(data.P, data.A, settings.sigma, rho_state.rho_vec)
            factor = core.Factor(L=jnp.zeros((0, 0), P.dtype), diag=diag,
                                 Minv=jnp.zeros((0, 0), P.dtype))
        else:
            factor = core.factorize(data.P, data.A, settings.sigma, rho_state.rho_vec, kkt_method)
        return data, scal, rho_state, factor

    return jax.vmap(one)(P, q, A, l, u, rho)


@functools.partial(jax.jit, static_argnames=('indirect', 'kkt_method'))
def _solve_batch(data, scal, settings: core.Settings, rho, factor, iterates, indirect: bool,
                 kkt_method: str = 'chol'):
    def one(data, scal, rho, factor, iterates):
        return core.solve_scaled_impl(
            data, scal, settings, rho, factor, iterates, indirect=indirect, verbose=False,
            kkt_method=kkt_method,
        )

    return jax.vmap(one, in_axes=(0, 0, 0, 0, 0))(data, scal, rho, factor, iterates)


@functools.partial(jax.jit, static_argnames=('indirect', 'kkt_method'))
def _update_and_solve_batch(
    data, scal, settings: core.Settings, rho, factor, iterates,
    q_new, l_new, u_new, has_q, has_l, has_u, indirect: bool,
    kkt_method: str = 'chol',
):
    """Fused MPC step: rescale new vectors, retype constraints, refactorize,
    solve - one XLA program (mirrors reference update_data_vec + solve,
    ref _osqp.py:1312-1429 + 1188-1306)."""

    def one(data, scal, rho, factor, iterates, q_new, l_new, u_new):
        q = jnp.where(has_q, scal.c * (scal.D * q_new), data.q)
        l = jnp.where(has_l, scal.E * l_new, data.l)
        u = jnp.where(has_u, scal.E * u_new, data.u)
        data = data._replace(q=q, l=l, u=u)
        # retype + rebuild rho_vec at the instance's current rho
        types = core.constraint_types(data.l, data.u)
        vec = core.rho_vec_from_types(types, rho.rho, settings.rho_is_vec)
        rho = core.RhoState(
            rho=rho.rho,
            rho_vec=vec,
            rho_inv_vec=jnp.where(vec > 0, 1.0 / vec, 0.0),
            constr_type=types,
        )
        if indirect:
            diag = core.build_M_diag(data.P, data.A, settings.sigma, vec)
            factor = factor._replace(diag=diag)
        else:
            factor = core.factorize(data.P, data.A, settings.sigma, vec, kkt_method)
        res = core.solve_scaled_impl(
            data, scal, settings, rho, factor, iterates, indirect=indirect, verbose=False,
            kkt_method=kkt_method,
        )
        return res, data

    return jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0, 0, 0))(
        data, scal, rho, factor, iterates, q_new, l_new, u_new
    )


@functools.partial(jax.jit, static_argnames=('scaling_iters', 'indirect', 'kkt_method'))
def batch_qp_solve(P, q, A, l, u, settings: core.Settings, rho, scaling_iters: int = 10,
                   indirect: bool = False, kkt_method: str = 'chol') -> core.SolveResult:
    """Pure fused batched solve: scale + factorize + ADMM in one XLA program.

    All inputs carry a leading batch axis.  This is the flagship jittable
    step (used by __graft_entry__ and bench.py) and composes with vmap/
    shard_map for multi-chip batch sharding.
    """
    data, scal, rho_state, factor = _setup_batch(
        P, q, A, l, u, rho, settings, scaling_iters=scaling_iters, indirect=indirect,
        kkt_method=kkt_method,
    )
    B, n = P.shape[0], P.shape[1]
    m = A.shape[1]
    iterates = core.Iterates(
        x=jnp.zeros((B, n), P.dtype),
        z=jnp.zeros((B, m), P.dtype),
        y=jnp.zeros((B, m), P.dtype),
    )
    return _solve_batch(data, scal, settings, rho_state, factor, iterates, indirect=indirect,
                        kkt_method=kkt_method)


@functools.partial(jax.jit, static_argnames=('indirect', 'kkt_method'))
def mpc_rollout(data, scal, settings: core.Settings, rho, factor, iterates, q_seq,
                indirect: bool = False, kkt_method: str = 'chol'):
    """Device-resident MPC rollout: scan over a sequence of cost vectors,
    each step = fused (update q -> warm re-solve) with zero host round-trips.

    ``q_seq`` has shape (steps, B, n).  Returns stacked (x, iters, status)
    per step plus the final carry for continuation.
    """
    B, m = iterates.z.shape
    dtype = iterates.x.dtype
    zeros_m = jnp.zeros((B, m), dtype)
    t = jnp.asarray(True)
    f = jnp.asarray(False)

    def step(carry, q_new):
        data, rho, factor, iterates = carry
        res, data = _update_and_solve_batch(
            data, scal, settings, rho, factor, iterates,
            q_new, zeros_m, zeros_m, t, f, f, indirect=indirect, kkt_method=kkt_method,
        )
        return (data, res.rho, res.factor, res.iterates), (res.x, res.iters, res.status)

    carry, ys = jax.lax.scan(step, (data, rho, factor, iterates), q_seq)
    return carry, ys


# Continuation-pattern entry point: callers that thread the returned carry
# back in (rho/factor/iterates are REPLACED by the carry every call) should
# use this jitted wrapper - donating those buffers lets XLA alias the old
# iterate/factor HBM into the new carry instead of allocating fresh copies
# each rollout.  Do NOT pass buffers you still need afterwards.
mpc_rollout_donated = jax.jit(
    mpc_rollout,
    static_argnames=('indirect', 'kkt_method'),
    donate_argnums=(3, 4, 5),  # rho, factor, iterates
)


def default_core_settings(dtype=jnp.float32, **over) -> core.Settings:
    """Build a traced core.Settings with reference defaults."""
    stg = OracleSettings()
    for k, v in over.items():
        setattr(stg, k, v)
    shim = SimpleNamespace(_stg=stg, _dtype=dtype)
    from .backends.jax_backend import Solver as _S

    return _S._core_settings(shim)


class BatchedOSQP:
    """Solve a batch of same-sparsity QPs.

    Inputs may be per-instance (leading batch axis) or shared (broadcast):
    ``P: (B,n,n) | (n,n)``, ``q: (B,n) | (n,)``, ``A: (B,m,n) | (m,n)``,
    ``l,u: (B,m) | (m,)``.
    """

    def __init__(self, dtype=None, device=None, kkt_method='auto', engine='auto'):
        """engine: 'vmap' (general per-instance data), 'shared' (shared P/A
        across the batch - single-matmul iterations on the MXU), or 'auto'
        (shared when P and A are passed unbatched)."""
        self._dtype = dtype
        self._device = device if device is not None else _resolve_device()
        self._pending = {}
        self._kkt_method_opt = kkt_method
        self._engine_opt = engine
        self._engine = None

    @property
    def _kkt_method(self):
        if self._kkt_method_opt != 'auto':
            return self._kkt_method_opt
        # float32 batches: explicit-inverse matvec solve (MXU-fast);
        # float64: Cholesky (reference-exact trajectories)
        return 'inv' if self._dtype == jnp.float32 else 'chol'

    @property
    def _indirect(self):
        from .constants import LinsysSolverType

        return self._stg.linsys_solver == int(LinsysSolverType.OSQP_INDIRECT_SOLVER)

    @_on_device
    def setup(self, P, q, A, l, u, **settings):
        t0 = time.perf_counter()
        solver_type = settings.pop('solver_type', 'direct')
        self._stg = OracleSettings(**settings)
        if solver_type == 'indirect':
            from .constants import LinsysSolverType

            self._stg.linsys_solver = int(LinsysSolverType.OSQP_INDIRECT_SOLVER)
        if self._dtype is None:
            self._dtype = _default_dtype(self._device)
        dt = self._dtype

        P = np.asarray(P, np.float64)
        A = np.asarray(A, np.float64)
        q = np.asarray(q, np.float64)
        if self._engine_opt == 'auto':
            self._engine = 'shared' if (P.ndim == 2 and A.ndim == 2) else 'vmap'
        else:
            self._engine = self._engine_opt
        if P.ndim == 2:
            assert q.ndim == 2 or A.ndim == 3, 'cannot infer batch size'
        n = P.shape[-1]
        m = A.shape[-2]
        B = max(
            P.shape[0] if P.ndim == 3 else 1,
            q.shape[0] if q.ndim == 2 else 1,
            A.shape[0] if A.ndim == 3 else 1,
            np.asarray(l).shape[0] if np.asarray(l).ndim == 2 else 1,
            np.asarray(u).shape[0] if np.asarray(u).ndim == 2 else 1,
        )
        self.B, self.n, self.m = B, n, m

        if self._engine == 'shared':
            assert P.ndim == 2 and A.ndim == 2, 'shared engine requires unbatched P and A'
            from .batch_shared import shared_setup

            if self._dtype is None:
                self._dtype = _default_dtype(self._device)
            qb = np.broadcast_to(np.asarray(q, np.float64), (B, n)).copy()
            lb = np.broadcast_to(np.asarray(l, np.float64), (B, m)).copy()
            ub = np.broadcast_to(np.asarray(u, np.float64), (B, m)).copy()
            (self._sh_P, self._sh_A, self._sh_Q, self._sh_L, self._sh_U,
             self._sh_scal, self._sh_rho, self._sh_Minv, self._sh_M,
             self._sh_rho_vec) = shared_setup(P, A, qb, lb, ub, self._stg, dtype=self._dtype)
            dtp = self._dtype
            self._sh_X = jnp.zeros((n, B), dtp)
            self._sh_Z = jnp.zeros((m, B), dtp)
            self._sh_Y = jnp.zeros((m, B), dtp)
            self.setup_time = time.perf_counter() - t0
            return self

        def bcast(x, shape):
            x = np.asarray(x, np.float64)
            return np.broadcast_to(x, (B,) + shape).copy() if x.ndim < len(shape) + 1 else x

        Pb = jnp.asarray(bcast(P, (n, n)), dt)
        # symmetrize (accept triu-only input like the reference API)
        Pb = jnp.triu(Pb) + jnp.transpose(jnp.triu(Pb, 1), (0, 2, 1))
        qb = jnp.asarray(bcast(q, (n,)), dt)
        Ab = jnp.asarray(bcast(A, (m, n)), dt)
        lb = jnp.asarray(np.maximum(bcast(l, (m,)), -1e30), dt)
        ub = jnp.asarray(np.minimum(bcast(u, (m,)), 1e30), dt)

        stg = self._core_settings()
        self._data, self._scal, self._rho, self._factor = _setup_batch(
            Pb, qb, Ab, lb, ub,
            jnp.full((B,), self._stg.rho, dt),
            stg,
            scaling_iters=int(self._stg.scaling),
            indirect=self._indirect,
            kkt_method=self._kkt_method,
        )
        self._iterates = core.Iterates(
            x=jnp.zeros((B, n), dt), z=jnp.zeros((B, m), dt), y=jnp.zeros((B, m), dt)
        )
        self.setup_time = time.perf_counter() - t0
        return self

    def _core_settings(self) -> core.Settings:
        from .backends.jax_backend import Solver as _S

        return _S._core_settings(self)  # reuse the host->traced conversion

    @_on_device
    def update(self, q=None, l=None, u=None):
        """Stage batched vector updates; applied fused into the next solve."""
        for name, v in (('q', q), ('l', l), ('u', u)):
            if v is not None:
                dim = self.n if name == 'q' else self.m
                v = np.broadcast_to(np.asarray(v, np.float64), (self.B, dim))
                if name == 'l':
                    v = np.maximum(v, -1e30)
                if name == 'u':
                    v = np.minimum(v, 1e30)
                self._pending[name] = jnp.asarray(v, self._dtype)

    @_on_device
    def warm_start(self, x=None, y=None):
        if self._engine == 'shared':
            if x is not None:
                xs = self._sh_scal.Dinv[:, None] * jnp.asarray(np.asarray(x, np.float64).T, self._dtype)
                self._sh_X = xs
                self._sh_Z = self._sh_A @ xs
            if y is not None:
                self._sh_Y = self._sh_scal.c * (
                    self._sh_scal.Einv[:, None] * jnp.asarray(np.asarray(y, np.float64).T, self._dtype)
                )
            return
        it = self._iterates
        if x is not None:
            xs = jax.vmap(lambda scal, x: scal.Dinv * x)(self._scal, jnp.asarray(x, self._dtype))
            zs = jax.vmap(lambda d, x: d.A @ x)(self._data, xs)
            it = it._replace(x=xs, z=zs)
        if y is not None:
            ys = jax.vmap(lambda scal, y: scal.c * (scal.Einv * y))(
                self._scal, jnp.asarray(y, self._dtype)
            )
            it = it._replace(y=ys)
        self._iterates = it

    @_on_device
    def solve(self):
        t0 = time.perf_counter()
        stg = self._core_settings()
        if self._engine == 'shared':
            return self._solve_shared(stg, t0)
        if not self._stg.warm_starting:
            dt = self._dtype
            self._iterates = core.Iterates(
                x=jnp.zeros((self.B, self.n), dt),
                z=jnp.zeros((self.B, self.m), dt),
                y=jnp.zeros((self.B, self.m), dt),
            )
        if self._pending:
            dt = self._dtype
            zeros_n = jnp.zeros((self.B, self.n), dt)
            zeros_m = jnp.zeros((self.B, self.m), dt)
            res, self._data = _update_and_solve_batch(
                self._data, self._scal, stg, self._rho, self._factor, self._iterates,
                self._pending.get('q', zeros_n),
                self._pending.get('l', zeros_m),
                self._pending.get('u', zeros_m),
                jnp.asarray('q' in self._pending),
                jnp.asarray('l' in self._pending),
                jnp.asarray('u' in self._pending),
                indirect=self._indirect,
                kkt_method=self._kkt_method,
            )
            self._pending = {}
        else:
            res = _solve_batch(
                self._data, self._scal, stg, self._rho, self._factor, self._iterates,
                indirect=self._indirect, kkt_method=self._kkt_method,
            )
        self._iterates = res.iterates
        self._rho = res.rho
        self._factor = res.factor

        solve_time = time.perf_counter() - t0
        status_vals = np.asarray(res.status)
        info = SimpleNamespace(
            status_val=status_vals,
            status=[status_string(s) for s in status_vals],
            iter=np.asarray(res.iters),
            obj_val=np.asarray(res.obj_val),
            dual_obj_val=np.asarray(res.dual_obj_val),
            duality_gap=np.asarray(res.duality_gap),
            prim_res=np.asarray(res.pri_res),
            dual_res=np.asarray(res.dua_res),
            rho_estimate=np.asarray(res.rho_estimate),
            rho_updates=np.asarray(res.rho_updates),
            solve_time=solve_time,
            setup_time=self.setup_time,
            run_time=self.setup_time + solve_time,
        )
        return SimpleNamespace(
            x=np.asarray(res.x),
            y=np.asarray(res.y),
            prim_inf_cert=np.asarray(res.prim_inf_cert),
            dual_inf_cert=np.asarray(res.dual_inf_cert),
            info=info,
        )

    def _solve_shared(self, stg, t0):
        from .batch_shared import shared_solve, settings_scale_q

        dtp = self._dtype
        B, n, m = self.B, self.n, self.m
        if not self._stg.warm_starting:
            self._sh_X = jnp.zeros((n, B), dtp)
            self._sh_Z = jnp.zeros((m, B), dtp)
            self._sh_Y = jnp.zeros((m, B), dtp)
        if self._pending:
            if 'q' in self._pending:
                self._sh_Q = settings_scale_q(self._sh_scal, self._pending['q'].T)
            if 'l' in self._pending:
                self._sh_L = self._sh_scal.E[:, None] * self._pending['l'].T
            if 'u' in self._pending:
                self._sh_U = self._sh_scal.E[:, None] * self._pending['u'].T
            self._pending = {}
        out = shared_solve(
            self._sh_P, self._sh_A, self._sh_Q, self._sh_L, self._sh_U,
            self._sh_scal, stg, self._sh_rho, self._sh_Minv, self._sh_M,
            self._sh_rho_vec, self._sh_X, self._sh_Z, self._sh_Y,
        )
        self._sh_X, self._sh_Z, self._sh_Y = out['X'], out['Z'], out['Y']
        self._sh_rho = out['rho']
        self._sh_rho_vec = out['rho_vec']
        self._sh_Minv, self._sh_M = out['Minv'], out['M']

        solve_time = time.perf_counter() - t0
        status_vals = np.asarray(out['status'])
        info = SimpleNamespace(
            status_val=status_vals,
            status=[status_string(s) for s in status_vals],
            iter=np.asarray(out['iters']),
            obj_val=np.asarray(out['obj_val']),
            dual_obj_val=np.asarray(out['dual_obj_val']),
            duality_gap=np.asarray(out['obj_val'] - out['dual_obj_val']),
            prim_res=np.asarray(out['pri_res']),
            dual_res=np.asarray(out['dua_res']),
            rho_estimate=float(out['rho']),
            rho_updates=int(out['rho_updates']),
            solve_time=solve_time,
            setup_time=self.setup_time,
            run_time=self.setup_time + solve_time,
        )
        return SimpleNamespace(
            x=np.asarray(out['x']),
            y=np.asarray(out['y']),
            prim_inf_cert=np.asarray(out['prim_inf_cert']),
            dual_inf_cert=np.asarray(out['dual_inf_cert']),
            info=info,
        )

    # device-side solve (no host transfers) for benchmarking / embedding in
    # larger jitted computations
    @_on_device
    def solve_device(self):
        stg = self._core_settings()
        res = _solve_batch(
            self._data, self._scal, stg, self._rho, self._factor, self._iterates,
            indirect=self._indirect, kkt_method=self._kkt_method,
        )
        return res
