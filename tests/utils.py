"""Golden-solution fixtures access + precision-class helpers."""

import os
import pathlib

import numpy as np

SOLUTIONS_DIR = pathlib.Path(__file__).parent / 'solutions'


def f32_device() -> bool:
    """True when the suite runs the jax rows on a float32 device (the
    real-chip ladder, OSQP_TPU_TEST_DEVICE=tpu; see conftest)."""
    return os.environ.get('OSQP_TPU_TEST_DEVICE') == 'tpu'


def solve_eps(tight: float, f32: float = 1e-5) -> float:
    """Solver tolerance for the current precision class: ``tight`` on the
    float64 rows, ``f32`` on the real-chip float32 rows (residuals below
    ~1e-5 are unreachable at float32; the reference handles this by keeping
    float64 on every backend, incl. CUDA)."""
    return f32 if f32_device() else tight


def load_high_accuracy(name):
    """Return (x, y, obj) for a named golden fixture."""
    with np.load(SOLUTIONS_DIR / f'{name}.npz') as data:
        return data['x_val'], data['y_val'], data['obj']
