"""Prototype: Pallas DIA matvec kernel vs the fused-XLA version (chip probe).

Scheme: output tile i covers rows [i*T, i*T+T).  The kernel receives three
ALIGNED tiles of the padded vector (prev/cur/next via three BlockSpecs over
the same array), so every diagonal's shifted window is a STATIC slice of the
2T/3T-neighborhood — no unaligned dynamic vector loads (which Mosaic rejects:
"index in dimension 0 is a multiple of 1024").

Usage: python tools/proto_dia_pallas.py [n] [n_diags] [T]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def cdiv(a, b):
    return -(-a // b)


def make_dia_matvec_pallas(offsets, m, n, T=8192):
    """Returns (f, Mp, Lp): f(bands_padded (D, Mp), vp (1, Lp)) -> y (1, Mp).

    vp layout: [zeros(T), v, zeros(Lp - n - T)] with Lp = T * (Mp//T + 2);
    row r of the output reads vp[0, T + r + o] for each offset o.
    Requires max|offset| <= T.
    """
    D = len(offsets)
    assert max(abs(o) for o in offsets) <= T
    Mp = cdiv(m, T) * T
    ntiles = Mp // T
    Lp = T * (ntiles + 2)
    grid = (ntiles,)

    def kernel(prev_ref, cur_ref, next_ref, bands_ref, out_ref):
        window3 = jnp.concatenate(
            [prev_ref[:, :], cur_ref[:, :], next_ref[:, :]], axis=1
        )  # (1, 3T) — keep 2-D: Mosaic rejects 1-D rolls/slices
        acc = None
        for d, o in enumerate(offsets):
            # want w[j] = window3[0, T + o + j]: roll left by o, slice the
            # aligned middle third (pltpu.roll handles intra-lane shifts)
            rolled = pltpu.roll(window3, (-o) % (3 * T), 1)
            w = jax.lax.slice(rolled, (0, T), (1, 2 * T))
            term = bands_ref[d : d + 1, :] * w
            acc = term if acc is None else acc + term
        out_ref[:, :] = acc

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, Mp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T), lambda i: (0, i + 1), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T), lambda i: (0, i + 2), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T), lambda i: (0, i), memory_space=pltpu.VMEM),
    )

    def f(bands_padded, vp):
        return fn(vp, vp, vp, bands_padded)

    return f, Mp, Lp


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    n_diags = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    T = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
    m = n
    rng = np.random.default_rng(0)
    offs = np.unique(np.concatenate([[0], rng.integers(-200, 200, n_diags - 1)]))
    offsets = tuple(int(o) for o in offs)
    D = len(offsets)
    bands = rng.standard_normal((D, m)).astype(np.float32)
    for d, o in enumerate(offsets):
        idx = np.arange(m)
        bad = (idx + o < 0) | (idx + o >= n)
        bands[d, bad] = 0.0
    v = rng.standard_normal(n).astype(np.float32)

    f_kernel, Mp, Lp = make_dia_matvec_pallas(offsets, m, n, T=T)
    bands_p = np.zeros((D, Mp), np.float32)
    bands_p[:, :m] = bands
    bands_j = jnp.asarray(bands_p)

    def f_pallas(v):
        vp = jnp.zeros((1, Lp), jnp.float32)
        vp = jax.lax.dynamic_update_slice(vp, v[None, :], (0, T))
        return f_kernel(bands_j, vp)[0, :m]

    def f_xla(v):
        pad = jnp.zeros((m,), v.dtype)
        vp = jnp.concatenate([pad, v, pad])
        acc = bands_j[0, :m] * jax.lax.slice(vp, (m + offsets[0],), (2 * m + offsets[0],))
        for d, o in enumerate(offsets[1:], start=1):
            acc = acc + bands_j[d, :m] * jax.lax.slice(vp, (m + o,), (2 * m + o,))
        return acc

    # correctness
    y_ref = np.zeros(m, np.float32)
    for d, o in enumerate(offsets):
        i = np.arange(max(0, -o), min(m, n - o))
        y_ref[i] += bands[d, i] * v[i + o]

    vj = jnp.asarray(v)
    y_p = np.asarray(jax.jit(f_pallas)(vj))
    y_x = np.asarray(jax.jit(f_xla)(vj))
    scale = np.max(np.abs(y_ref)) + 1e-30
    err_p = np.max(np.abs(y_p - y_ref)) / scale
    err_x = np.max(np.abs(y_x - y_ref)) / scale
    print(f'rel err pallas={err_p:.2e} xla={err_x:.2e}')
    assert err_p < 1e-5 and err_x < 1e-5

    def bench(f, iters=50, renorm=True):
        @jax.jit
        def chain(v):
            def body(_, v):
                y = f(v)
                if renorm:
                    return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)
                return y * 0.125  # keep arithmetic alive, no reduction
            return jax.lax.fori_loop(0, iters, body, v)

        r = chain(vj)
        float(jnp.sum(r))
        dts = []
        for _ in range(5):
            t0 = time.perf_counter()
            r = chain(vj)
            float(jnp.sum(r))
            dts.append((time.perf_counter() - t0) / iters)
        return float(np.median(dts))

    bytes_model = 4.0 * (D * m + 3 * m)
    for name, f in (('pallas', f_pallas), ('xla', f_xla)):
        for renorm in (True, False):
            dt = bench(f, renorm=renorm)
            tag = 'renorm' if renorm else 'pure  '
            print(f'{name} {tag}: {dt*1e6:7.1f} us/matvec  {bytes_model/dt/1e9:6.1f} GB/s  '
                  f'({bytes_model/dt/819e9*100:.1f}% HBM peak)')


if __name__ == '__main__':
    main()
