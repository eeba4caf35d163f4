"""Parallelism layer: device meshes, batch-sharded losses, time-sharded scans.

The reference has no distributed subsystem (SURVEY.md §2.5); this layer is
the TPU-native answer: `jax.sharding.Mesh` + GSPMD for data parallelism and a
blockwise boundary-exchange scan for sequence parallelism, with XLA ICI
collectives replacing intra-device atomics.
"""

from .mesh import (
    DATA_AXIS,
    TIME_AXIS,
    MODEL_AXIS,
    make_mesh,
    batch_sharding,
    shard_batch_pytree,
    replicated,
)
from .dscan import (
    linear_recurrence_reverse_sharded,
    linear_recurrence_forward_sharded,
)
from .api import (
    data_parallel,
    gae_time_sharded,
    lambda_returns_time_sharded,
    lstm_param_shardings,
    td_lambda_error_time_sharded,
    upgo_loss_time_sharded,
    vtrace_error_time_sharded,
)
from .runtime import initialize, global_batch_from_host_local
