"""Fused batched solver: Pallas ADMM epochs + batch-level termination.

The highest-throughput path for the north-star workload (thousands of
same-structure QPs per chip).  Differences from the vmapped path
(osqp_tpu.batch._solve_batch):

* The inner K-iteration epoch runs as ONE Pallas kernel
  (osqp_tpu.ops.fused_admm) with all state resident in VMEM and the batch
  axis on the 128-lane dimension - no HBM round trips or kernel launches
  between ADMM iterations.
* Termination checks, infeasibility certificates and adaptive rho run once
  per epoch at batch level, reusing the exact core semantics via vmap.
* Early-converged instances are snapshotted (status/iters/solution frozen)
  while the rest continue - identical result semantics to the vmapped path.

Direct mode with the explicit-inverse KKT solve only (kkt_method='inv').
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .constants import SolverStatus
from .solver import core
from .ops.fused_admm import admm_epoch

_UNSOLVED = int(SolverStatus.OSQP_UNSOLVED)
_SOLVED = int(SolverStatus.OSQP_SOLVED)
_MAX_ITER = int(SolverStatus.OSQP_MAX_ITER_REACHED)
_PRIM_INF = int(SolverStatus.OSQP_PRIMAL_INFEASIBLE)
_PRIM_INF_INACC = int(SolverStatus.OSQP_PRIMAL_INFEASIBLE_INACCURATE)
_DUAL_INF = int(SolverStatus.OSQP_DUAL_INFEASIBLE)
_DUAL_INF_INACC = int(SolverStatus.OSQP_DUAL_INFEASIBLE_INACCURATE)


class FusedState(NamedTuple):
    it: jax.Array  # scalar int32
    x_t: jax.Array  # (n, B)
    z_t: jax.Array  # (m, B)
    y_t: jax.Array  # (m, B)
    dx_t: jax.Array
    dy_t: jax.Array
    rho: jax.Array  # (B,)
    rho_t: jax.Array  # (m, B)
    rhoinv_t: jax.Array  # (m, B)
    Minv_t: jax.Array  # (n, n, B)
    M_t: jax.Array  # (n, n, B)
    status: jax.Array  # (B,)
    iters_done: jax.Array  # (B,)
    rho_updates: jax.Array  # (B,)
    # frozen snapshots at termination time
    fx_t: jax.Array
    fz_t: jax.Array
    fy_t: jax.Array
    fdx_t: jax.Array
    fdy_t: jax.Array
    pri_res: jax.Array  # (B,)
    dua_res: jax.Array
    obj_val: jax.Array
    dual_obj_val: jax.Array


def _batched_check(data, scal, settings, x_b, z_b, y_b, dx_b, dy_b, approximate):
    """vmap of the exact core termination semantics over B-leading data."""

    def one(data, scal, x, z, y, dx, dy):
        st = _mini_state(x, z, y, dx, dy)
        # drop the trailing rel_kkt: the batched engines track it separately
        return core.termination_status(data, scal, st, settings, approximate)[:5]

    return jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0, 0))(
        data, scal, x_b, z_b, y_b, dx_b, dy_b
    )


class _MiniState(NamedTuple):
    x: jax.Array
    z: jax.Array
    y: jax.Array
    delta_x: jax.Array
    delta_y: jax.Array


def _mini_state(x, z, y, dx, dy):
    return _MiniState(x=x, z=z, y=y, delta_x=dx, delta_y=dy)


@functools.partial(jax.jit, static_argnames=('tile', 'interpret'))
def fused_solve(
    data: core.QPData,  # B-leading batched pytree (from batch._setup_batch)
    scal: core.Scaling,
    settings: core.Settings,
    rho0: jax.Array,  # (B,) current rho values
    factor: core.Factor,  # kkt_method='inv' factors, B-leading
    iterates: core.Iterates,  # B-leading
    tile: int = 256,
    interpret: bool = False,
):
    """Solve the batch; returns a core.SolveResult (B-leading)."""
    B, n = data.P.shape[0], data.P.shape[1]
    m = data.A.shape[1]
    dtype = data.P.dtype

    t = lambda a: jnp.transpose(a, (1, 0)) if a.ndim == 2 else jnp.transpose(a, (1, 2, 0))

    ct = settings.check_termination
    epoch_len = jnp.where(ct > 0, ct, settings.iter_cap).astype(jnp.int32)
    epochs_per_adapt = jnp.maximum(
        (settings.adaptive_rho_interval + epoch_len - 1) // jnp.maximum(epoch_len, 1), 1
    )

    st = FusedState(
        it=jnp.int32(0),
        x_t=t(iterates.x),
        z_t=t(iterates.z),
        y_t=t(iterates.y),
        dx_t=jnp.zeros((n, B), dtype),
        dy_t=jnp.zeros((m, B), dtype),
        rho=rho0,
        rho_t=jnp.zeros((m, B), dtype),  # overwritten below
        rhoinv_t=jnp.zeros((m, B), dtype),
        Minv_t=t(factor.Minv),
        M_t=t(factor.L),  # 'inv' mode: L slot holds M
        status=jnp.full((B,), _UNSOLVED, jnp.int32),
        iters_done=jnp.zeros((B,), jnp.int32),
        rho_updates=jnp.zeros((B,), jnp.int32),
        fx_t=t(iterates.x),
        fz_t=t(iterates.z),
        fy_t=t(iterates.y),
        fdx_t=jnp.zeros((n, B), dtype),
        fdy_t=jnp.zeros((m, B), dtype),
        pri_res=jnp.full((B,), jnp.inf, dtype),
        dua_res=jnp.full((B,), jnp.inf, dtype),
        obj_val=jnp.full((B,), jnp.nan, dtype),
        dual_obj_val=jnp.full((B,), jnp.nan, dtype),
    )
    # real rho vectors (B-leading in factor-producing code) -> instance-last
    rho_vec_b = jax.vmap(core.rho_vec_from_types)(
        jax.vmap(core.constraint_types)(data.l, data.u),
        rho0,
        jnp.broadcast_to(settings.rho_is_vec, (B,)),
    )
    st = st._replace(
        rho_t=t(rho_vec_b),
        rhoinv_t=t(jnp.where(rho_vec_b > 0, 1.0 / rho_vec_b, 0.0)),
    )

    def cond(st: FusedState):
        return (st.it < settings.iter_cap) & jnp.any(st.status == _UNSOLVED)

    def body(st: FusedState):
        this_epoch = jnp.minimum(epoch_len, settings.iter_cap - st.it)
        x_t, z_t, y_t, dx_t, dy_t = admm_epoch(
            st.Minv_t, st.M_t, t(data.A), t(data.q), t(data.l), t(data.u),
            st.rho_t, st.rhoinv_t, st.x_t, st.z_t, st.y_t,
            settings.sigma, settings.alpha, this_epoch,
            tile=tile, interpret=interpret,
        )
        it = st.it + this_epoch
        active = st.status == _UNSOLVED
        st = st._replace(
            it=it,
            x_t=jnp.where(active[None], x_t, st.x_t),
            z_t=jnp.where(active[None], z_t, st.z_t),
            y_t=jnp.where(active[None], y_t, st.y_t),
            dx_t=jnp.where(active[None], dx_t, st.dx_t),
            dy_t=jnp.where(active[None], dy_t, st.dy_t),
        )

        # batch-level termination check (exact core semantics via vmap)
        status_new, pri, dua, obj, dobj = _batched_check(
            data, scal, settings, st.x_t.T, st.z_t.T, st.y_t.T, st.dx_t.T, st.dy_t.T,
            False,
        )
        newly = active & (status_new != _UNSOLVED)
        st = st._replace(
            status=jnp.where(newly, status_new, st.status),
            iters_done=jnp.where(active, it, st.iters_done),
            pri_res=jnp.where(active, pri, st.pri_res),
            dua_res=jnp.where(active, dua, st.dua_res),
            obj_val=jnp.where(active, obj, st.obj_val),
            dual_obj_val=jnp.where(active, dobj, st.dual_obj_val),
            fx_t=jnp.where(newly[None], st.x_t, st.fx_t),
            fz_t=jnp.where(newly[None], st.z_t, st.fz_t),
            fy_t=jnp.where(newly[None], st.y_t, st.fy_t),
            fdx_t=jnp.where(newly[None], st.dx_t, st.fdx_t),
            fdy_t=jnp.where(newly[None], st.dy_t, st.fdy_t),
        )

        # adaptive rho, once per epochs_per_adapt epochs, active instances only
        epoch_idx = (it + epoch_len - 1) // jnp.maximum(epoch_len, 1)
        do_adapt = (
            settings.adaptive_rho
            & (settings.adaptive_rho_interval > 0)
            & (epoch_idx % epochs_per_adapt == 0)
        )

        def adapt(st: FusedState):
            still = st.status == _UNSOLVED

            def est(data, x, z, y, rho):
                return core.rho_estimate_fn(data, x, z, y, rho)

            rho_new = jax.vmap(est)(data, st.x_t.T, st.z_t.T, st.y_t.T, st.rho)
            tolr = settings.adaptive_rho_tolerance
            trig = still & ((rho_new > tolr * st.rho) | (rho_new < st.rho / tolr))
            rho_upd = jnp.where(trig, rho_new, st.rho)
            types_b = jax.vmap(core.constraint_types)(data.l, data.u)
            vec_b = jax.vmap(core.rho_vec_from_types)(
                types_b, rho_upd, jnp.broadcast_to(settings.rho_is_vec, (B,))
            )

            def refac(P1, A1, vec1):
                return core.factorize(P1, A1, settings.sigma, vec1, 'inv')

            fac = jax.vmap(refac)(data.P, data.A, vec_b)
            Minv_t_new = t(fac.Minv)
            M_t_new = t(fac.L)
            rho_t_new = t(vec_b)
            return st._replace(
                rho=rho_upd,
                rho_t=jnp.where(trig[None], rho_t_new, st.rho_t),
                rhoinv_t=jnp.where(trig[None], t(jnp.where(vec_b > 0, 1.0 / vec_b, 0.0)), st.rhoinv_t),
                Minv_t=jnp.where(trig[None, None], Minv_t_new, st.Minv_t),
                M_t=jnp.where(trig[None, None], M_t_new, st.M_t),
                rho_updates=st.rho_updates + trig.astype(jnp.int32),
            )

        st = lax.cond(do_adapt, adapt, lambda s: s, st)
        return st

    st = lax.while_loop(cond, body, st)

    # post-loop: unresolved instances -> exact then approximate check, else
    # MAX_ITER (ref _osqp.py:1248-1266 semantics)
    active = st.status == _UNSOLVED
    status_ex, pri_ex, dua_ex, obj_ex, dobj_ex = _batched_check(
        data, scal, settings, st.x_t.T, st.z_t.T, st.y_t.T, st.dx_t.T, st.dy_t.T, False
    )
    status_ap, _, _, obj_ap, _ = _batched_check(
        data, scal, settings, st.x_t.T, st.z_t.T, st.y_t.T, st.dx_t.T, st.dy_t.T, True
    )
    status_fin = jnp.where(
        status_ex != _UNSOLVED,
        status_ex,
        jnp.where(status_ap != _UNSOLVED, status_ap, _MAX_ITER),
    ).astype(jnp.int32)
    st = st._replace(
        status=jnp.where(active, status_fin, st.status),
        iters_done=jnp.where(active, st.it, st.iters_done),
        pri_res=jnp.where(active, pri_ex, st.pri_res),
        dua_res=jnp.where(active, dua_ex, st.dua_res),
        obj_val=jnp.where(
            active, jnp.where(status_ex != _UNSOLVED, obj_ex, jnp.where(status_ap != _UNSOLVED, obj_ap, obj_ex)), st.obj_val
        ),
        dual_obj_val=jnp.where(active, dobj_ex, st.dual_obj_val),
        fx_t=jnp.where(active[None], st.x_t, st.fx_t),
        fz_t=jnp.where(active[None], st.z_t, st.fz_t),
        fy_t=jnp.where(active[None], st.y_t, st.fy_t),
        fdx_t=jnp.where(active[None], st.dx_t, st.fdx_t),
        fdy_t=jnp.where(active[None], st.dy_t, st.fdy_t),
    )

    # assemble SolveResult (B-leading)
    x_b = st.fx_t.T
    z_b = st.fz_t.T
    y_b = st.fy_t.T
    dx_b = st.fdx_t.T
    dy_b = st.fdy_t.T

    infeasible = jnp.isin(
        st.status, jnp.array([_PRIM_INF, _PRIM_INF_INACC, _DUAL_INF, _DUAL_INF_INACC])
    )
    unscaled = ~settings.scaled_termination
    x_out = jnp.where(infeasible[:, None], jnp.nan, scal.D * x_b)
    y_out = jnp.where(infeasible[:, None], jnp.nan, scal.cinv[:, None] * (scal.E * y_b))
    prim_cert = jnp.where(unscaled, scal.E * dy_b, dy_b)
    dual_cert = jnp.where(unscaled, scal.D * dx_b, dx_b)

    rho_est = jax.vmap(core.rho_estimate_fn)(data, x_b, z_b, y_b, st.rho)

    # rebuild B-leading rho/factor state for warm continuation
    types_b = jax.vmap(core.constraint_types)(data.l, data.u)
    vec_b = jax.vmap(core.rho_vec_from_types)(
        types_b, st.rho, jnp.broadcast_to(settings.rho_is_vec, (B,))
    )
    rho_state = core.RhoState(
        rho=st.rho,
        rho_vec=vec_b,
        rho_inv_vec=jnp.where(vec_b > 0, 1.0 / vec_b, 0.0),
        constr_type=types_b,
    )
    factor_out = core.Factor(
        L=jnp.transpose(st.M_t, (2, 0, 1)),
        diag=jax.vmap(jnp.diagonal)(jnp.transpose(st.M_t, (2, 0, 1))),
        Minv=jnp.transpose(st.Minv_t, (2, 0, 1)),
    )

    return core.SolveResult(
        x=x_out,
        y=y_out,
        prim_inf_cert=prim_cert,
        dual_inf_cert=dual_cert,
        status=st.status,
        iters=st.iters_done,
        pri_res=st.pri_res,
        dua_res=st.dua_res,
        obj_val=st.obj_val,
        dual_obj_val=st.dual_obj_val,
        duality_gap=st.obj_val - st.dual_obj_val,
        rho_estimate=rho_est,
        rho_updates=st.rho_updates,
        cg_iters=jnp.zeros((B,), jnp.int32),
        iterates=core.Iterates(x=x_b, z=z_b, y=y_b),
        rho=rho_state,
        factor=factor_out,
    )


@functools.partial(jax.jit, static_argnames=('tile', 'interpret'))
def fused_mpc_rollout(
    data: core.QPData,
    scal: core.Scaling,
    settings: core.Settings,
    rho0: jax.Array,
    factor: core.Factor,
    iterates: core.Iterates,
    q_seq: jax.Array,  # (steps, B, n) new UNSCALED cost vectors
    tile: int = 256,
    interpret: bool = False,
):
    """MPC rollout on the fused path: scan of (update q -> warm fused solve).

    Returns (carry, (x, iters, status)) like osqp_tpu.batch.mpc_rollout.
    """

    def step(carry, q_new):
        data, rho, factor, iterates = carry
        data = data._replace(q=scal.c[:, None] * (scal.D * q_new))
        res = fused_solve(data, scal, settings, rho, factor, iterates,
                          tile=tile, interpret=interpret)
        return (data, res.rho.rho, res.factor, res.iterates), (
            res.x, res.iters, res.status
        )

    carry, ys = jax.lax.scan(step, (data, rho0, factor, iterates), q_seq)
    return carry, ys
