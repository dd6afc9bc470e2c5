"""Golden-solution fixtures access."""

import pathlib

import numpy as np

SOLUTIONS_DIR = pathlib.Path(__file__).parent / 'solutions'


def load_high_accuracy(name):
    """Return (x, y, obj) for a named golden fixture."""
    with np.load(SOLUTIONS_DIR / f'{name}.npz') as data:
        return data['x_val'], data['y_val'], data['obj']
