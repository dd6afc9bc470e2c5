"""Decompose the rollout step cost: fixed per-step overhead vs per-iteration.

Times shared_mpc_rollout at several eps values; regression of step time on
mean warm iterations separates the epoch-loop cost from the fixed per-step
work (affine rebuild, post-loop checks, output formatting).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    'JAX_COMPILATION_CACHE_DIR',
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), '.jax_cache'),
)

import numpy as np
import jax
import jax.numpy as jnp


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n, m, steps = 32, 48, 10

    from bench import build_shared_problems
    from osqp_tpu._oracle.solver import OracleSettings
    from osqp_tpu.batch import default_core_settings
    from osqp_tpu import batch_shared as bs

    P, q, A, l, u = build_shared_problems(B, n, m)
    f32 = jnp.float32
    rng = np.random.default_rng(1)
    q_seq = jnp.asarray(
        (q[None] + 0.01 * rng.standard_normal((steps, B, n))).transpose(0, 2, 1), f32)

    for eps in (1e-3, 3e-4, 1e-4):
        host = OracleSettings(eps_abs=eps, eps_rel=eps)
        stg = default_core_settings(f32, eps_abs=eps, eps_rel=eps)
        P_s, A_s, Q, L_t, U_t, scal_t, rho0, Minv, M, rho_vec = bs.shared_setup(
            P, A, q, l, u, host, dtype=f32)

        def rollout():
            return bs.shared_mpc_rollout(
                P_s, A_s, Q, L_t, U_t, scal_t, stg, rho0, Minv, M, rho_vec, q_seq)

        carry, (xs, iters, statuses) = rollout()
        jax.block_until_ready(xs)
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(3):
                carry, (xs, iters, statuses) = rollout()
            jax.block_until_ready(xs)
            jax.block_until_ready(jnp.zeros(1) + 1)
            times.append((time.perf_counter() - t0) / 3)
        el = float(np.median(times[1:]))
        it = np.asarray(iters)
        st = np.asarray(statuses)
        # per-step max iters = what the while_loop actually runs
        max_per_step = it.max(axis=1)
        print(f"eps {eps:.0e}: {el/steps*1e3:7.3f} ms/step  "
              f"iters mean {it.mean():6.1f}  step-max mean {max_per_step.mean():6.1f} "
              f"solved {float((st==1).mean()):.4f}")


if __name__ == '__main__':
    main()


def fixed_cost_probe(B=4096):
    """Step time at forced iteration counts (max_iter = k*25): slope = epoch
    cost, intercept = fixed per-step overhead."""
    n, m, steps = 32, 48, 10
    from bench import build_shared_problems
    from osqp_tpu._oracle.solver import OracleSettings
    from osqp_tpu.batch import default_core_settings
    from osqp_tpu import batch_shared as bs
    import time
    P, q, A, l, u = build_shared_problems(B, n, m)
    f32 = jnp.float32
    rng = np.random.default_rng(1)
    q_seq = jnp.asarray(
        (q[None] + 0.01 * rng.standard_normal((steps, B, n))).transpose(0, 2, 1), f32)
    host = OracleSettings(eps_abs=1e-9, eps_rel=1e-9)  # never terminates
    for mi in (25, 100, 400):
        stg = default_core_settings(f32, eps_abs=1e-9, eps_rel=1e-9, max_iter=mi)
        P_s, A_s, Q, L_t, U_t, scal_t, rho0, Minv, M, rho_vec = bs.shared_setup(
            P, A, q, l, u, host, dtype=f32)
        def rollout():
            return bs.shared_mpc_rollout(
                P_s, A_s, Q, L_t, U_t, scal_t, stg, rho0, Minv, M, rho_vec, q_seq)
        carry, (xs, iters, statuses) = rollout()
        jax.block_until_ready(xs)
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(3):
                carry, (xs, iters, statuses) = rollout()
            jax.block_until_ready(xs)
            jax.block_until_ready(jnp.zeros(1) + 1)
            times.append((time.perf_counter() - t0) / 3)
        el = float(np.median(times[1:]))
        print(f"max_iter {mi:4d}: {el/steps*1e3:7.3f} ms/step")
