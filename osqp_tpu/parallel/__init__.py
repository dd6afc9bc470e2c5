"""Multi-chip scale-out: dp×mp batch sharding, row-sharded huge QPs, and
halo-exchange banded QPs over a `jax.sharding.Mesh` (see docs/api.md)."""

from .bigqp import BigQPData, BigQPResult, big_qp_setup, big_qp_solve  # noqa: F401
from .banded import BandedQPData, banded_qp_setup, banded_qp_solve  # noqa: F401
from .sharded import dp_mp_solve, make_batch_shardings  # noqa: F401

__all__ = [
    'BigQPData', 'BigQPResult', 'big_qp_setup', 'big_qp_solve',
    'BandedQPData', 'banded_qp_setup', 'banded_qp_solve',
    'dp_mp_solve', 'make_batch_shardings',
]
