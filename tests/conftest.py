"""Test parametrization ladder.

Adopts the reference's backend/tolerance parametrization pattern
(reference: src/osqp/tests/conftest.py:5-31): every test is parametrized over
``(algebra, solver_type, atol, rtol, decimal_tol)`` with a tolerance ladder;
env vars ``OSQP_TPU_TEST_ALGEBRA_INCLUDE`` / ``OSQP_TPU_TEST_ALGEBRA_SKIP``
select rows.

Default test device is JAX CPU (float64) so the suite runs anywhere;
set ``OSQP_TPU_TEST_DEVICE=tpu`` to run the jax rows on a real chip.
"""

import os

# Must be set before jax initializes inside osqp_tpu.
os.environ.setdefault('OSQP_TPU_DEVICE', os.environ.get('OSQP_TPU_TEST_DEVICE', 'cpu'))
if '--xla_force_host_platform_device_count' not in os.environ.get('XLA_FLAGS', ''):
    # virtual 8-device CPU mesh for the sharding tests
    os.environ['XLA_FLAGS'] = (
        os.environ.get('XLA_FLAGS', '') + ' --xla_force_host_platform_device_count=8'
    )

import jax

if os.environ.get('OSQP_TPU_TEST_DEVICE', 'cpu') != 'tpu':
    # Keep the CPU suite fully off the TPU plugin: this jax build ignores
    # JAX_PLATFORMS, and merely initializing the experimental axon backend
    # opens a tunnel connection that can hang the whole test process when
    # the (single-client) tunnel is busy or unhealthy.
    jax.config.update('jax_platforms', 'cpu')

jax.config.update('jax_enable_x64', True)

# Persistent XLA compilation cache: the solver cores are large fused programs
# (~1-2 min compiles on CPU); repeated suite runs reuse them.  NOTE: this
# jax build ignores the JAX_COMPILATION_CACHE_DIR env var (axon plugin);
# only the config API takes effect.
jax.config.update(
    'jax_compilation_cache_dir',
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), '.jax_cache'),
)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)

from osqp_tpu import algebra_available  # noqa: E402


def pytest_generate_tests(metafunc):
    needed = {'algebra', 'solver_type', 'atol', 'rtol', 'decimal_tol'}
    if not needed.issubset(metafunc.fixturenames):
        return

    include = os.environ.get(
        'OSQP_TPU_TEST_ALGEBRA_INCLUDE', 'numpy jax-direct jax-indirect'
    ).split()
    skip = os.environ.get('OSQP_TPU_TEST_ALGEBRA_SKIP', '').split()
    rows = [x for x in include if x not in skip]

    parameters = ('algebra', 'solver_type', 'atol', 'rtol', 'decimal_tol')
    values = []
    if algebra_available('numpy') and 'numpy' in rows:
        values.append(('numpy', 'direct', 1e-3, 1e-4, 4))
    if os.environ.get('OSQP_TPU_TEST_DEVICE') == 'tpu':
        # Real-chip float32 rows: looser ladder tolerances, the analogue of
        # the reference's cuda-indirect row (reference
        # src/osqp/tests/conftest.py:27-30 — atol 1e-2, rtol 1e-3, 2
        # decimals).  The jax backend auto-selects float32 on TPU devices.
        if algebra_available('jax') and 'jax-direct' in rows:
            values.append(('jax', 'direct', 1e-2, 1e-3, 2))
        if algebra_available('jax') and 'jax-indirect' in rows:
            values.append(('jax', 'indirect', 1e-2, 1e-3, 2))
    else:
        if algebra_available('jax') and 'jax-direct' in rows:
            values.append(('jax', 'direct', 1e-3, 1e-4, 4))
        if algebra_available('jax') and 'jax-indirect' in rows:
            values.append(('jax', 'indirect', 1e-3, 1e-4, 3))

    metafunc.parametrize(parameters, values)
