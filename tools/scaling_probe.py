"""Scaling probe: distributed huge-QP modes across mesh sizes J = 1,2,4,8.

BASELINE.md's scaling config asks for iterations/s at 1 chip / 1 host /
4 hosts.  Real multi-chip hardware is not reachable from this environment
(one tunneled v5e chip), so this probe does the two things that ARE
measurable/checkable here, with that caveat stated rather than hidden:

1. **Virtual-mesh execution** — runs `parallel.bigqp` and `parallel.banded`
   on a forced-CPU mesh at each J, asserting the distributed math converges
   identically at every mesh size (iteration counts must be J-invariant:
   the mesh only changes where rows live).  Wall-times on virtual devices
   share one CPU and are NOT a hardware scaling claim.

2. **Communication-volume accounting** — the per-CG-iteration bytes each
   design moves over the interconnect, from the sharding layout (these are
   exact, not estimates):

   - bigqp:   all_gather of Pv rows (n floats) + psum tree of A'rho(Av)
              partials (n floats per hop) -> O(n) per device per iteration
   - banded:  6 halo ppermutes of W floats + 2 scalar psums -> O(W)

   At n = 1e6, W = 8, f32: bigqp moves ~8 MB/device/iter; banded moves
   ~200 B.  On a v5e ICI link (~45 GB/s/direction) that is ~180 us vs
   effectively free — the banded design stays compute-bound at any J.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python tools/scaling_probe.py [n]
"""

import json
import sys
import time

import numpy as np
import scipy.sparse as sp


def main(n=4096):
    import jax
    import jax.numpy as jnp

    jax.config.update('jax_enable_x64', True)
    from jax.sharding import Mesh

    from osqp_tpu.parallel.banded import banded_qp_setup, banded_qp_solve
    from osqp_tpu.parallel.bigqp import big_qp_setup, big_qp_solve

    devs = jax.devices('cpu')
    rng = np.random.default_rng(0)
    P = sp.diags([np.full(n, 2.0), np.full(n - 1, -0.8), np.full(n - 1, -0.8)],
                 [0, 1, -1]).tocsc()
    q = rng.standard_normal(n)
    A = (sp.eye(n) + sp.diags([np.full(n - 2, 0.4)], [2], shape=(n, n))).tocsc()
    x0 = rng.standard_normal(n)
    s0 = rng.random(n) + 0.1
    u = A @ x0 + s0
    l = u - 2 * s0

    W = 2  # bandwidth of A (offsets {0, 2}); P bandwidth 1
    rows = []
    for J in (1, 2, 4, 8):
        if len(devs) < J:
            print(f'skip J={J}: only {len(devs)} devices')
            continue
        mesh = Mesh(np.array(devs[:J]).reshape(J), ('mp',))
        row = {'J': J}
        for name, setup, solve in (
            ('bigqp', big_qp_setup, big_qp_solve),
            ('banded', banded_qp_setup, banded_qp_solve),
        ):
            data = setup(P, q, A, l, u, J, dtype=jnp.float64)
            t0 = time.time()
            res = solve(mesh, data, eps_abs=1e-5, eps_rel=1e-5, max_iter=4000)
            jax.block_until_ready(res.x)
            wall = time.time() - t0
            assert int(res.status) == 1, (name, J, int(res.status))
            row[name] = {
                'iters': int(res.iters),
                'wall_s': round(wall, 2),
                'iters_per_s': round(int(res.iters) / wall, 1),
            }
        # exact per-CG-iteration interconnect bytes per device (f32=4B;
        # ring all_gather / reduce-scatter move (J-1)/J * n each)
        row['comm_bytes_per_cg_iter_per_device'] = {
            'bigqp': int(2 * 4 * n * (J - 1) / max(J, 1)),
            'banded': int(6 * 4 * max(W, 1) + 2 * 8) if J > 1 else 0,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    iters = {(r['J'], k): r[k]['iters'] for r in rows for k in ('bigqp', 'banded')}
    base_big = iters[(rows[0]['J'], 'bigqp')]
    base_band = iters[(rows[0]['J'], 'banded')]
    assert all(v == base_big for (j, k), v in iters.items() if k == 'bigqp')
    assert all(v == base_band for (j, k), v in iters.items() if k == 'banded')
    print(f'iteration counts J-invariant: bigqp={base_big}, banded={base_band} '
          '(the mesh only changes where rows live)')


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)
