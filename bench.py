"""Headline benchmark: batched MPC QP throughput (solves/sec/chip).

North-star workload from BASELINE.json: thousands of same-structure QPs per
chip, MPC-style (setup once, then update-q + warm re-solve every step).
Problem family: shared plant (same P, A across the batch - the canonical
condensed-MPC scenario), per-instance costs and bounds.

Engine: the shared-structure batched solver (osqp_tpu.batch_shared) - every
per-iteration op is a single dense MXU matmul over the whole batch.

Baseline: the repo's codegen-emitted embedded C solver at -O3 (OSQP-C
stand-in; the real C core is not fetchable here) driving the same warm
update(q)+solve loop on one CPU core.

Roofline story (BASELINE.md:31 "KKT solve step at HBM speed-of-light"):
besides the headline shape, `detail.shapes` carries additional problem sizes
with `mfu` (vs the chip's bf16 matmul peak), `mxu_frac_f32` (vs the
effective float32-highest matmul peak - f32 `precision=highest` decomposes
into 6 bf16 MXU passes, so peak/6 is the attainable ceiling for this
numerically-required mode), `hbm_frac` (estimated HBM traffic vs peak
bandwidth) and a `regime` classification; `detail.kkt_probe` measures the
KKT solve step ITSELF (the dense batched solve matmul / the sparse
normal-equations matvec) in isolation against the roofline.  Methodology
and formulas in benchmarks/RESULTS.md.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.
"""

import json
import os
import sys
import time

import numpy as np

# TPU v5e (v5 lite) peaks
BF16_PEAK = 197e12  # FLOP/s (dense matmul, bf16)
F32_HIGHEST_PEAK = BF16_PEAK / 6  # 6-pass bf16 decomposition of f32-highest
HBM_PEAK = 819e9  # bytes/s


def _enable_compile_cache():
    """Persistent XLA compilation cache: repeated bench runs (e.g. the
    driver's) skip recompiling the scan-of-solves program.  This jax build
    ignores the JAX_COMPILATION_CACHE_DIR env var; use the config API."""
    import jax

    jax.config.update(
        'jax_compilation_cache_dir',
        os.path.join(os.path.dirname(os.path.abspath(__file__)), '.jax_cache'),
    )
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)


def build_problems(B, n, m, seed=0):
    """Per-instance problems (used by tests/other benches)."""
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


def build_shared_problems(B, n, m, seed=0):
    """Shared P/A, per-instance q/l/u (condensed-MPC scenario batch)."""
    rng = np.random.default_rng(seed)
    L = rng.standard_normal((n, n)) / np.sqrt(n)
    P = L @ L.T + 0.1 * np.eye(n)
    A = rng.standard_normal((m, n)) / np.sqrt(n)
    q = rng.standard_normal((B, n))
    x0 = rng.standard_normal((B, n))
    s0 = rng.random((B, m)) + 0.1
    u = x0 @ A.T + s0
    l = u - 2 * s0
    return P, q, A, l, u


def _sync():
    import jax
    import jax.numpy as jnp

    jax.block_until_ready(jnp.zeros(1) + 1)  # flush lazy-completion backends


def _materialize(x):
    """Force completion by transferring a reduction of the RESULT to host.

    On the axon backend, `block_until_ready` + trailing-sync measurably
    lags (extra ~0.8 ms/rollout of roundtrip overhead) and standalone
    probe loops produced non-physical timings with it; a host transfer
    that data-depends on the output is the reliable completion barrier
    (methodology note in benchmarks/RESULTS.md)."""
    import jax.numpy as jnp

    return float(jnp.sum(x))


def measure_shared(B, n, m, steps, eps=1e-3, reps=30, batches=4, seed=0):
    """Sustained-throughput measurement of the shared-structure engine at
    one problem shape; returns a row dict with roofline fields."""
    import jax
    import jax.numpy as jnp

    from osqp_tpu._oracle.solver import OracleSettings
    from osqp_tpu.batch import default_core_settings
    from osqp_tpu.batch_shared import shared_mpc_rollout, shared_setup

    P, q, A, l, u = build_shared_problems(B, n, m, seed=seed)
    f32 = jnp.float32
    host = OracleSettings(eps_abs=eps, eps_rel=eps)
    stg = default_core_settings(f32, eps_abs=eps, eps_rel=eps)
    np.asarray(jnp.zeros(8) + 1)  # establish the device connection
    t0 = time.perf_counter()
    P_s, A_s, Q, L_t, U_t, scal_t, rho0, Minv, M, rho_vec = shared_setup(
        P, A, q, l, u, host, dtype=f32
    )
    setup_time = time.perf_counter() - t0

    rng = np.random.default_rng(1)
    q_seq = jnp.asarray(
        (q[None] + 0.01 * rng.standard_normal((steps, B, n))).transpose(0, 2, 1), f32
    )

    def rollout():
        return shared_mpc_rollout(
            P_s, A_s, Q, L_t, U_t, scal_t, stg, rho0, Minv, M, rho_vec, q_seq
        )

    carry, (xs, iters, statuses) = rollout()  # compile + warmup
    jax.block_until_ready(xs)

    # Steady-state throughput: the axon tunnel charges a ~50 ms host<->device
    # roundtrip to any SYNCHRONIZED call, but dispatch is async and the
    # device queue pipelines back-to-back executions.  Production batched-MPC
    # serving is a continuous stream, so the headline is the sustained rate:
    # many rollouts per synchronization, median over batches, first batch
    # discarded (one-time lazy linking).
    times = []
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(reps):
            carry, (xs, iters, statuses) = rollout()
        _materialize(xs)
        times.append((time.perf_counter() - t0) / reps)
    elapsed = float(np.median(times[1:] if batches > 1 else times))

    # single-call (synchronized) latency
    t0 = time.perf_counter()
    carry, (xs, iters, statuses) = rollout()
    _materialize(xs)
    latency_ms = (time.perf_counter() - t0) * 1e3

    throughput = B * steps / elapsed
    statuses_np = np.asarray(statuses)
    iters_np = np.asarray(iters)
    mean_iters = float(iters_np.mean())

    # roofline accounting per ADMM iteration (formulas in RESULTS.md):
    # useful flops  = the (n+m, n+2m) affine map per instance,
    # HBM bytes    ~= weights (n+m)(n+2m) re-read + state (n+2m,B) r/w +
    #                 output (n+m,B) write, 4 bytes each (f32)
    flops_per_iter = 2 * (n + m) * (n + 2 * m)  # per instance
    bytes_per_iter = 4.0 * ((n + m) * (n + 2 * m) + B * (3 * (n + 2 * m) + (n + m)))
    iter_rate = throughput * mean_iters  # instance-iterations / s
    achieved_flops = iter_rate * flops_per_iter
    achieved_bytes = iter_rate / B * bytes_per_iter
    mfu = achieved_flops / BF16_PEAK
    mxu_frac_f32 = achieved_flops / F32_HIGHEST_PEAK
    hbm_frac = achieved_bytes / HBM_PEAK
    if max(mxu_frac_f32, hbm_frac) < 0.05:
        regime = 'dispatch/latency-bound'
    elif mxu_frac_f32 >= hbm_frac:
        regime = 'MXU-bound'
    else:
        regime = 'HBM-bound'

    return dict(
        engine='shared', batch=B, n=n, m=m, mpc_steps=steps,
        throughput=round(throughput, 2),
        solved_frac=float((statuses_np == 1).mean()),
        mean_iters_warm=mean_iters,
        setup_time_s=round(setup_time, 3),
        latency_ms=round(latency_ms, 2),
        mfu=round(mfu, 5),
        mxu_frac_f32=round(mxu_frac_f32, 5),
        hbm_frac=round(hbm_frac, 5),
        regime=regime,
    ), (P, q, A, l, u, q_seq)


def kkt_dense_probe(nm, B, iters=1000):
    """The direct-mode KKT solve step in isolation: the batched explicit-
    inverse matmul (nm, nm) @ (nm, B) that the shared engine's 'inv' path
    executes every iteration, chained ITERS times on-device (a DEPENDENT
    chain, like real ADMM iterations; each iterate is renormalized to keep
    values finite).  Reports the achieved fraction of the f32-highest
    matmul roofline - the speed-of-light test for the KKT step at this
    shape."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(3)
    W = jnp.asarray(rng.standard_normal((nm, nm)) / np.sqrt(nm), jnp.float32)
    X = jnp.asarray(rng.standard_normal((nm, B)), jnp.float32)

    @jax.jit
    def chain(W, X):
        def body(_, Xc):
            Y = W @ Xc
            return Y / jnp.maximum(jnp.max(jnp.abs(Y)), 1e-30)

        return lax.fori_loop(0, iters, body, X)

    _materialize(chain(W, X))  # compile + hard completion barrier
    reps = 3
    t0 = time.perf_counter()
    out = X
    for _ in range(reps):
        out = chain(W, out)
    _materialize(out)
    dt = (time.perf_counter() - t0) / reps
    flops = 2.0 * nm * nm * B * iters
    bytes_ = 4.0 * (nm * nm + 2 * nm * B) * iters
    return dict(
        kind='dense-KKT-solve-matmul', nm=nm, batch=B,
        tflops=round(flops / dt / 1e12, 2),
        mxu_frac_f32=round(flops / dt / F32_HIGHEST_PEAK, 4),
        mfu=round(flops / dt / BF16_PEAK, 4),
        hbm_frac=round(bytes_ / dt / HBM_PEAK, 4),
        matmul_us=round(dt / iters * 1e6, 2),
    )


def kkt_sparse_probe(n, m, nnz_per_row=16, iters=50, fmt='bcoo', banded=False,
                     clustered=False):
    """The indirect-mode KKT step in isolation: the fused normal-equations
    matvec  M v = P v + sigma v + A' (rho * (A v))  - the per-CG-iteration
    kernel of the sparse/large-QP path - chained ITERS times on-device,
    in the given SpMV format (osqp_tpu/ops/spmv.py):

    - bcoo : jax BCOO (gather + scatter-add)   - the old fallback
    - ell  : padded-row, gather-only both ways
    - dia  : diagonal bands, NO gathers (banded patterns only)
    - bsr  : 8x128 dense blocks, one 512-byte segment gather per block
    - dense: stream the dense matrix at HBM speed-of-light (the honest
             fast path for unstructured patterns that fit the HBM budget)

    ``banded=True`` draws P/A as band matrices with ~nnz_per_row diagonals;
    ``clustered=True`` draws them as scattered dense 128x128 super-blocks
    (coupled-sub-system structure, the BSR target); otherwise entries are
    scattered uniformly.  The bytes model counts each STORED entry
    (including format padding) once per operand use (data + any index
    bytes) plus the dense vectors; ``eff_gbytes_per_s`` is the honest
    nnz-only number (4 bytes per logical non-zero per use) - the
    apples-to-apples column across formats."""
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp
    from jax import lax

    from osqp_tpu.ops import spmv

    rng = np.random.default_rng(5)
    if banded:
        def band(rows, cols, n_diags, seed):
            r2 = np.random.default_rng(seed)
            offs = np.unique(np.concatenate([[0], r2.integers(-rows // 2, cols // 2, n_diags - 1)]))
            diags = [r2.standard_normal(max(1, min(rows, cols - o) - max(0, -o))) for o in offs]
            return sp.diags(diags, offs, shape=(rows, cols)).tocsc()

        P_sp = band(n, n, nnz_per_row, 7)
        P_sp = (P_sp + P_sp.T).tocsc()
        A_sp = band(m, n, nnz_per_row, 8)
    elif clustered:
        def superblocks(rows, cols, frac, seed):
            r2 = np.random.default_rng(seed)
            nbr, nbc = rows // 128, cols // 128
            picks = r2.random((nbr, nbc)) < frac
            br, bc = np.nonzero(picks)
            S = sp.lil_matrix((rows, cols))
            for i, j in zip(br, bc):
                S[i * 128:(i + 1) * 128, j * 128:(j + 1) * 128] = (
                    r2.standard_normal((128, 128))
                )
            return S.tocsc()

        # ~nnz_per_row average occupancy: frac = nnz_per_row / cols * 128
        P_sp = superblocks(n, n, nnz_per_row / n, 7)
        P_sp = (P_sp + P_sp.T).tocsc()
        A_sp = superblocks(m, n, nnz_per_row / n, 8)
    else:
        dens = nnz_per_row / n
        P_sp = sp.random(n, n, density=dens, random_state=rng, format='csc')
        P_sp = (P_sp + P_sp.T).tocsc()
        A_sp = sp.random(m, n, density=dens, random_state=rng, format='csc')

    P_op = spmv.from_scipy(P_sp, jnp.float32, fmt)
    A_op = spmv.from_scipy(A_sp, jnp.float32, fmt)
    At_op = A_op.T
    rho = jnp.full((m,), 0.1, jnp.float32)
    v0 = jnp.asarray(rng.standard_normal(n), jnp.float32)

    # operators are jit ARGUMENTS (registered pytrees), not closures: baked
    # as closure constants they ship inside the compile payload, which the
    # axon remote-compile endpoint rejects above ~100 MB (HTTP 413)
    @jax.jit
    def chain(P_op, A_op, At_op, rho, v):
        def body(_, v):
            Mv = P_op @ v + 1e-6 * v + At_op @ (rho * (A_op @ v))
            return Mv / jnp.maximum(jnp.max(jnp.abs(Mv)), 1e-30)

        return lax.fori_loop(0, iters, body, v)

    _materialize(chain(P_op, A_op, At_op, rho, v0))  # compile + barrier
    reps = 3
    t0 = time.perf_counter()
    out = v0
    for _ in range(reps):
        out = chain(P_op, A_op, At_op, rho, out)
    _materialize(out)
    dt = (time.perf_counter() - t0) / reps

    nnz_p, nnz_a = P_sp.nnz, A_sp.nnz

    def stored_bytes(op, uses):
        if isinstance(op, spmv.DiaMatrix):
            return 4.0 * op.bands.size * uses          # bands only, no indices
        if isinstance(op, spmv.EllMatrix):
            return 8.0 * op.data.size * uses           # padded data + int32 cols
        if isinstance(op, spmv.BsrMatrix):
            # padded dense blocks (4 B/entry) + per block: one int32
            # block-col and one gathered 512-byte v-segment
            return (4.0 * op.blocks.size + 516.0 * op.bcols.size) * uses
        if isinstance(op, jnp.ndarray):
            return 4.0 * op.size * uses                # dense streaming
        return 12.0 * op.data.size * uses              # BCOO data + (r, c) int32

    flops = 2.0 * (nnz_p + 2 * nnz_a) * iters
    bytes_ = (
        stored_bytes(P_op, 1) + stored_bytes(A_op, 1) + stored_bytes(At_op, 1)
        + 4.0 * (3 * n + 2 * m)
    ) * iters
    eff_bytes = 4.0 * (nnz_p + 2 * nnz_a) * iters  # logical nnz only
    return dict(
        kind='sparse-KKT-normal-eq-matvec', n=n, m=m, fmt=fmt,
        pattern='banded' if banded else ('clustered' if clustered else 'scattered'),
        nnz=int(nnz_p + nnz_a),
        gflops=round(flops / dt / 1e9, 2),
        gbytes_per_s=round(bytes_ / dt / 1e9, 2),
        eff_gbytes_per_s=round(eff_bytes / dt / 1e9, 3),
        hbm_frac=round(bytes_ / dt / HBM_PEAK, 4),
        matvec_us=round(dt / iters * 1e6, 1),
    )


def measure_baseline(P, q, A, l, u, q_seq, eps):
    """Compiled-C baseline (honest OSQP-C stand-in): the repo's own
    codegen-emitted embedded C solver at -O3 driving the same warm
    update(q)+solve loop on one CPU core.  The real OSQP C core cannot be
    built here (no network egress to fetch it); this is the same ADMM
    algorithm in compiled C at the same tolerances - methodology in
    benchmarks/RESULTS.md.  Falls back to the float64 scipy oracle if the
    C toolchain is unavailable."""
    qs_host = np.asarray(q_seq).transpose(0, 2, 1).astype(np.float64)
    steps, B = qs_host.shape[0], qs_host.shape[1]
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), 'tools'))
        from bench_c_baseline import measure_c_baseline

        cres = measure_c_baseline(P, q, A, l, u, qs_host, eps)
        return cres['solves_per_s'], cres['label']
    except Exception as e:  # pragma: no cover - toolchain-dependent
        import scipy.sparse as sp

        from osqp_tpu._oracle.solver import ReferenceSolver

        B_ref = min(16, B)
        opts = dict(eps_abs=eps, eps_rel=eps, max_iter=4000, verbose=False)
        solvers = []
        P_csc, A_csc = sp.csc_matrix(P), sp.csc_matrix(A)
        for b in range(B_ref):
            s = ReferenceSolver()
            s.setup(P_csc, q[b], A_csc, l[b], u[b], **opts)
            s.solve()
            solvers.append(s)
        t0 = time.perf_counter()
        for k in range(steps):
            for b, s in enumerate(solvers):
                s.update_data_vec(q=qs_host[k, b % B_ref])
                s.solve()
        ref_elapsed = time.perf_counter() - t0
        return B_ref * steps / ref_elapsed, (
            f'float64 reference core (scipy splu), sequential CPU '
            f'[C baseline unavailable: {e}]'
        )


def main():
    # Default (driver/headline) workload: B=4096, n=32, m=48, 10 steps.
    # Optional overrides for ad-hoc studies: `python bench.py [B] [n] [m] [steps]`.
    argv = [int(a) for a in sys.argv[1:5]]
    B = argv[0] if len(argv) > 0 else 4096
    n = argv[1] if len(argv) > 1 else 32
    m = argv[2] if len(argv) > 2 else 48
    steps = argv[3] if len(argv) > 3 else 10
    default_run = len(argv) == 0
    eps = 1e-3

    import jax

    if os.environ.get('OSQP_TPU_BENCH_DEVICE') == 'cpu':
        # flow-check mode off the chip (this jax build ignores JAX_PLATFORMS)
        jax.config.update('jax_platforms', 'cpu')
    _enable_compile_cache()

    headline, (P, q, A, l, u, q_seq) = measure_shared(B, n, m, steps, eps=eps)
    ref_throughput, baseline_label = measure_baseline(P, q, A, l, u, q_seq, eps)

    shapes = [headline]
    kkt_probes = []
    if default_run and os.environ.get('OSQP_TPU_BENCH_SHAPES', '1') != '0':
        # second shape: 4x the linear dimension - the affine map carries
        # ~10x the flops per iteration at the same dispatch overheads
        row128, _ = measure_shared(1024, 128, 192, steps, eps=eps,
                                   reps=10, batches=2, seed=2)
        shapes.append(row128)
        # the KKT solve step in isolation, against the roofline
        kkt_probes.append(kkt_dense_probe(nm=32 + 48, B=4096))
        kkt_probes.append(kkt_dense_probe(nm=128 + 192, B=1024))
        kkt_probes.append(kkt_dense_probe(nm=1024, B=1024))
        # large sparse indirect shape: normal-equations matvec per format
        # (bcoo fallback vs the gather-only ELL, the gather-free DIA, the
        # block-streaming BSR, and the dense-streaming scattered answer)
        kkt_probes.append(kkt_sparse_probe(n=16384, m=24576, iters=20, fmt='bcoo'))
        kkt_probes.append(kkt_sparse_probe(n=16384, m=24576, iters=20, fmt='ell'))
        kkt_probes.append(
            kkt_sparse_probe(n=16384, m=24576, iters=20, fmt='dense')
        )
        kkt_probes.append(
            kkt_sparse_probe(n=16384, m=24576, iters=20, fmt='dia', banded=True)
        )
        kkt_probes.append(
            kkt_sparse_probe(n=16384, m=24576, iters=20, fmt='bsr', clustered=True)
        )
        kkt_probes.append(
            kkt_sparse_probe(n=16384, m=24576, iters=20, fmt='bcoo', clustered=True)
        )
        # Larger DIA shapes (n=65k-262k, up to 161 GB/s) are documented in
        # benchmarks/RESULTS.md but excluded here: their remote compiles are
        # erratically slow (50 s - 11 min observed) and would blow the bench
        # budget.  Reproduce with kkt_sparse_probe(n=262144, m=393216,
        # fmt='dia', banded=True).

    detail = {
        'batch': B,
        'n': n,
        'm': m,
        'mpc_steps': steps,
        'solved_frac': headline['solved_frac'],
        'mean_iters_warm': headline['mean_iters_warm'],
        'setup_time_s': headline['setup_time_s'],
        'device': str(jax.devices()[0]),
        'engine': 'shared-structure batched ADMM (MXU matmuls)',
        'baseline': baseline_label,
        'baseline_solves_per_s': round(ref_throughput, 2),
        'mfu': headline['mfu'],
        'latency_ms': headline['latency_ms'],
        'peaks': {
            'bf16_flops': BF16_PEAK,
            'f32_highest_flops': round(F32_HIGHEST_PEAK, 0),
            'hbm_bytes_per_s': HBM_PEAK,
        },
        'shapes': shapes,
        'kkt_probe': kkt_probes,
    }
    # Detail (shapes + roofline probes) goes to a sidecar file and a
    # PRECEDING stdout line; the FINAL stdout line stays compact so the
    # driver's capture parses it (BENCH_r04.json grew past the capture and
    # recorded `parsed: null` — keep the headline line short forever).
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'BENCH_DETAIL.json')
    try:
        with open(detail_path, 'w') as f:
            json.dump(detail, f, indent=1)
    except OSError:
        pass
    print(json.dumps({'detail': detail}))
    print(
        json.dumps(
            {
                'metric': 'batched_mpc_qp_throughput',
                'value': headline['throughput'],
                'unit': 'solves/s/chip',
                'vs_baseline': round(headline['throughput'] / ref_throughput, 2),
                'mfu': headline['mfu'],
            }
        )
    )


if __name__ == '__main__':
    main()
