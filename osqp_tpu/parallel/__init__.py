"""Multi-chip scale-out: dp×mp batch sharding, row-sharded huge QPs, and
halo-exchange banded QPs over a `jax.sharding.Mesh` (see docs/api.md)."""

from .bigqp import (  # noqa: F401
    BigQPData, BigQPResult, BigQPRollout,
    big_qp_setup, big_qp_solve, big_qp_update_vec, big_qp_mpc_rollout,
)
from .banded import (  # noqa: F401
    BandedQPData, BandedRollout,
    banded_qp_setup, banded_qp_solve, banded_qp_update_vec,
    banded_mpc_rollout,
)
from .sharded import dp_mp_solve, make_batch_shardings  # noqa: F401

__all__ = [
    'BigQPData', 'BigQPResult', 'BigQPRollout',
    'big_qp_setup', 'big_qp_solve', 'big_qp_update_vec', 'big_qp_mpc_rollout',
    'BandedQPData', 'BandedRollout',
    'banded_qp_setup', 'banded_qp_solve', 'banded_qp_update_vec',
    'banded_mpc_rollout',
    'dp_mp_solve', 'make_batch_shardings',
]
