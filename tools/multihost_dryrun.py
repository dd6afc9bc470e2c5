"""Multi-host (DCN) dryrun: the dp x mp solver across jax.distributed processes.

BASELINE.md's scaling ladder runs at 1 chip / 1 host / 4 hosts; real multi-host
slices are not available here, so this tool pins the MULTI-PROCESS layout the
4-host config would use, on CPU:

    2 processes x 4 virtual CPU devices  =  (dp=2, mp=4) global mesh

with the **dp axis spanning processes** (each batch shard lives wholly inside
one process — on hardware, dp gradients/none cross DCN, only per-instance mp
collectives ride ICI) and the **mp axis inside a process**.  This is exactly
the layout rule from the scaling playbook: put the heavy per-iteration
collectives (mp: psum/pmax per ADMM epoch) on ICI, keep DCN traffic to the
embarrassingly-parallel dp axis (here: zero bytes per iteration).

The check: every process's local dp shard of the multi-process solve must
reproduce the SINGLE-process (8-local-device) iteration counts and statuses
bit-for-bit — the mesh topology must not change the math (J-invariance,
same contract as tools/scaling_probe.py).

Run:  python tools/multihost_dryrun.py            # launcher (spawns workers)
      python tools/multihost_dryrun.py --single   # single-process reference
Exit code 0 iff all processes agree with the single-process run.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys

# Must precede any jax import/initialization in this process.
_N_LOCAL = {'single': 8, 'worker': 4}


def _configure_jax(n_local):
    os.environ['XLA_FLAGS'] = (
        os.environ.get('XLA_FLAGS', '')
        + f' --xla_force_host_platform_device_count={n_local}'
    )
    import jax

    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    return jax


def _problem(B=4, n=8, m=16, seed=11):
    import numpy as np

    rng = np.random.default_rng(seed)
    L = rng.standard_normal((B, n, n))
    P = 0.1 * np.einsum('bij,bkj->bik', L, L) + 0.1 * np.eye(n)
    q = rng.standard_normal((B, n)) * 10.0
    A = rng.standard_normal((B, m, n)) * np.logspace(-1, 1, m)[None, :, None]
    x0 = rng.standard_normal((B, n))
    s0 = rng.random((B, m))
    u = np.einsum('bmn,bn->bm', A, x0) + s0
    l = u - 2 * s0
    return P, q, A, l, u


_SETTINGS = dict(eps_abs=1e-5, eps_rel=1e-5, max_iter=1000)


def _solve(mesh):
    import jax.numpy as jnp

    from osqp_tpu.parallel.sharded import dp_mp_solve

    P, q, A, l, u = _problem()
    return dp_mp_solve(mesh, jnp.asarray(P, jnp.float64), q, A, l, u,
                       **_SETTINGS)


def run_single():
    jax = _configure_jax(8)
    import numpy as np
    from jax.sharding import Mesh

    devs = jax.devices('cpu')
    mesh = Mesh(np.array(devs[:8]).reshape(2, 4), ('dp', 'mp'))
    res = _solve(mesh)
    print(json.dumps({
        'iters': np.asarray(res.iters).tolist(),
        'status': np.asarray(res.status).tolist(),
    }))


def run_worker(pid, port, expect):
    jax = _configure_jax(4)
    import numpy as np
    from jax.sharding import Mesh

    jax.distributed.initialize(
        coordinator_address=f'127.0.0.1:{port}', num_processes=2,
        process_id=pid,
    )
    devs = jax.devices()
    assert len(devs) == 8, f'expected 8 global devices, got {len(devs)}'
    # dp spans the two PROCESSES (DCN axis), mp the 4 devices within each
    # (ICI axis): jax.devices() orders by (process, local id), so a (2, 4)
    # reshape puts process p's devices in dp row p.
    assert all(d.process_index == i // 4 for i, d in enumerate(devs)), (
        [d.process_index for d in devs]
    )
    mesh = Mesh(np.array(devs).reshape(2, 4), ('dp', 'mp'))
    res = _solve(mesh)

    # each process can only read its ADDRESSABLE dp shard — which is exactly
    # the J-invariance claim: this process's instances, same counts
    B = len(expect['iters'])
    lo, hi = pid * B // 2, (pid + 1) * B // 2

    def local_values(arr):
        # dp-sharded outputs are replicated over mp: every local device
        # holds a copy of this process's dp slice — dedup by shard index
        uniq = {}
        for s in arr.addressable_shards:
            key = tuple((sl.start, sl.stop) for sl in s.index)
            uniq[key] = np.ravel(s.data)
        return np.sort(np.concatenate([uniq[k] for k in sorted(uniq)]))

    local_iters = local_values(res.iters)
    local_status = local_values(res.status)
    exp_iters = np.sort(expect['iters'][lo:hi])
    exp_status = np.sort(expect['status'][lo:hi])
    assert (local_status == exp_status).all(), (local_status, exp_status)
    assert (local_iters == exp_iters).all(), (local_iters, exp_iters)
    print(f'worker {pid}: dp shard iters {local_iters.tolist()} '
          f'match single-process run', flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--single', action='store_true')
    ap.add_argument('--worker', type=int, default=None)
    ap.add_argument('--port', type=int, default=None)
    ap.add_argument('--expect', default=None)
    args = ap.parse_args()

    if args.single:
        run_single()
        return
    if args.worker is not None:
        expect = json.loads(args.expect)
        expect['iters'] = list(expect['iters'])
        expect['status'] = list(expect['status'])
        run_worker(args.worker, args.port, expect)
        return

    # launcher: single-process reference first, then 2 coordinated workers
    here = os.path.abspath(__file__)
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, here, '--single'], env=env, capture_output=True,
        text=True, timeout=900,
    )
    if out.returncode != 0:
        print(out.stdout + out.stderr)
        raise SystemExit('single-process reference failed')
    expect = out.stdout.strip().splitlines()[-1]
    ref = json.loads(expect)
    assert all(s == 1 for s in ref['status']), ref
    print(f'single-process reference: iters={ref["iters"]}')

    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        port = s.getsockname()[1]
    procs = [
        subprocess.Popen(
            [sys.executable, here, '--worker', str(pid), '--port', str(port),
             '--expect', expect],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    codes = []
    for pid, p in enumerate(procs):
        try:
            out_text, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            p.kill()
            out_text = '(timeout)'
        print(f'--- worker {pid} (exit {p.returncode}) ---')
        print(out_text.strip())
        codes.append(p.returncode)
    ok = all(c == 0 for c in codes)
    print(json.dumps({
        'multihost_dryrun': 'ok' if ok else 'FAILED',
        'processes': 2, 'devices_per_process': 4,
        'mesh': {'dp(DCN)': 2, 'mp(ICI)': 4},
        'single_process_iters': ref['iters'],
    }))
    raise SystemExit(0 if ok else 1)


if __name__ == '__main__':
    main()
