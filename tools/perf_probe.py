"""Perf probe for the shared batched engine: iteration-precision sweep.

Times a cold shared_solve and a warm re-solve on the bench workload at each
OSQP_TPU_ITER_PRECISION value, reporting throughput / solved_frac / iters.
Run on the real TPU chip:  python tools/perf_probe.py [B]
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
    n, m = 32, 48
    eps = 1e-3

    from bench import build_shared_problems

    from osqp_tpu._oracle.solver import OracleSettings
    from osqp_tpu.batch import default_core_settings
    from osqp_tpu import batch_shared as bs

    P, q, A, l, u = build_shared_problems(B, n, m)
    f32 = jnp.float32
    host = OracleSettings(eps_abs=eps, eps_rel=eps)
    stg = default_core_settings(f32, eps_abs=eps, eps_rel=eps)
    P_s, A_s, Q, L_t, U_t, scal_t, rho0, Minv, M, rho_vec = bs.shared_setup(
        P, A, q, l, u, host, dtype=f32
    )
    X0 = jnp.zeros((n, B), f32)
    Z0 = jnp.zeros((m, B), f32)
    Y0 = jnp.zeros((m, B), f32)

    def run(prec):
        os.environ['OSQP_TPU_ITER_PRECISION'] = prec
        out = bs.shared_solve(P_s, A_s, Q, L_t, U_t, scal_t, stg, rho0,
                              Minv, M, rho_vec, X0, Z0, Y0)
        jax.block_until_ready(out['x'])
        # warm re-solve from the solution (the MPC steady state)
        Xw, Zw, Yw = out['X'], out['Z'], out['Y']
        outw = bs.shared_solve(P_s, A_s, Q, L_t, U_t, scal_t, stg, out['rho'],
                               out['Minv'], out['M'], out['rho_vec'], Xw, Zw, Yw)
        jax.block_until_ready(outw['x'])

        def timeit(fn, reps=5):
            ts = []
            for _ in range(4):
                t0 = time.perf_counter()
                for _ in range(reps):
                    o = fn()
                np.asarray(o['x'])  # materialize (axon lazy completion)
                ts.append((time.perf_counter() - t0) / reps)
            return float(np.median(ts[1:]))

        t_cold = timeit(lambda: bs.shared_solve(
            P_s, A_s, Q, L_t, U_t, scal_t, stg, rho0, Minv, M, rho_vec,
            X0, Z0, Y0))
        t_warm = timeit(lambda: bs.shared_solve(
            P_s, A_s, Q, L_t, U_t, scal_t, stg, out['rho'], out['Minv'],
            out['M'], out['rho_vec'], Xw, Zw, Yw))
        it = np.asarray(out['iters'])
        st = np.asarray(out['status'])
        itw = np.asarray(outw['iters'])
        print(f"{prec:8s} cold {t_cold*1e3:8.2f} ms ({B/t_cold:12.0f}/s) "
              f"warm {t_warm*1e3:8.2f} ms ({B/t_warm:12.0f}/s) "
              f"solved {float((st==1).mean()):.4f} "
              f"iters mean/max {it.mean():.1f}/{it.max()} warm {itw.mean():.1f}/{itw.max()}")

    for prec in ('highest', 'high', 'default'):
        run(prec)


if __name__ == '__main__':
    main()
