"""Headline benchmark: batched MPC QP throughput (solves/sec/chip).

North-star workload from BASELINE.json: thousands of same-structure QPs per
chip via the fused vmapped ADMM solver, MPC-style (setup once, then
update-q + warm re-solve every step).

Baseline: the float64 scipy reference core (osqp_tpu._oracle, the stand-in
for the OSQP-C builtin backend loop - same algorithm, same tolerances)
solving the identical instances sequentially on CPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def build_problems(B, n, m, seed=0):
    rng = np.random.default_rng(seed)
    L = rng.standard_normal((B, n, n)) / np.sqrt(n)
    P = np.einsum('bij,bkj->bik', L, L) + 0.1 * np.eye(n)
    q = rng.standard_normal((B, n))
    A = rng.standard_normal((B, m, n)) / np.sqrt(n)
    x0 = rng.standard_normal((B, n))
    s0 = rng.random((B, m)) + 0.1
    u = np.einsum('bmn,bn->bm', A, x0) + s0
    l = u - 2 * s0
    return P, q, A, l, u


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n, m = 32, 48
    steps = 20
    opts = dict(eps_abs=1e-3, eps_rel=1e-3, max_iter=4000, verbose=False)

    import jax
    import jax.numpy as jnp

    from osqp_tpu.batch import BatchedOSQP

    P, q, A, l, u = build_problems(B, n, m)

    solver = BatchedOSQP(dtype=jnp.float32)
    solver.setup(P, q, A, l, u, **opts)
    res = solver.solve()  # compile + first (cold) solve
    n_solved = int((res.info.status_val == 1).sum())

    # device-resident MPC rollout: S fused (update-q -> warm re-solve) steps
    # in ONE dispatch (lax.scan) - the production serving pattern
    from osqp_tpu.batch import mpc_rollout

    rng = np.random.default_rng(1)
    q_seq = jnp.asarray(
        q[None] + 0.01 * rng.standard_normal((steps, B, n)), jnp.float32
    )
    stg = solver._core_settings()
    args = (solver._data, solver._scal, stg, solver._rho, solver._factor, solver._iterates)
    carry, (xs, iters, statuses) = mpc_rollout(*args, q_seq)  # compile + warmup
    jax.block_until_ready(xs)

    t0 = time.perf_counter()
    carry, (xs, iters, statuses) = mpc_rollout(*args, q_seq)
    jax.block_until_ready(xs)
    elapsed = time.perf_counter() - t0
    throughput = B * steps / elapsed
    total_iters = int(np.asarray(iters).sum())

    # CPU reference-core baseline on a subsample (same algorithm/tolerances)
    import scipy.sparse as sp

    from osqp_tpu._oracle.solver import ReferenceSolver

    B_ref = min(16, B)
    solvers = []
    for b in range(B_ref):
        s = ReferenceSolver()
        s.setup(sp.csc_matrix(P[b]), q[b], sp.csc_matrix(A[b]), l[b], u[b], **opts)
        s.solve()
        solvers.append(s)
    t0 = time.perf_counter()
    for k in range(steps):
        qk = q + 0.01 * rng.standard_normal((B, n))
        for b, s in enumerate(solvers):
            s.update_data_vec(q=qk[b])
            s.solve()
    ref_elapsed = time.perf_counter() - t0
    ref_throughput = B_ref * steps / ref_elapsed

    print(
        json.dumps(
            {
                'metric': 'batched_mpc_qp_throughput',
                'value': round(throughput, 2),
                'unit': 'solves/s/chip',
                'vs_baseline': round(throughput / ref_throughput, 2),
                'detail': {
                    'batch': B,
                    'n': n,
                    'm': m,
                    'mpc_steps': steps,
                    'solved_frac_cold': n_solved / B,
                    'mean_iters_warm': total_iters / (B * steps),
                    'device': str(
                        solver._device if solver._device is not None else jax.devices()[0]
                    ),
                    'baseline': 'float64 reference core (scipy splu), sequential CPU',
                    'baseline_solves_per_s': round(ref_throughput, 2),
                },
            }
        )
    )


if __name__ == '__main__':
    main()
