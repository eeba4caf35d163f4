"""Batch-parallel execution of the op library over a device mesh.

Every loss in the library is a weighted mean over batch (and time) — under
GSPMD, calling the same jitted op on batch-sharded inputs already yields the
exact global mean, with XLA emitting the ICI all-reduce (this replaces the
reference's blockReduceSum + atomicAdd pattern with a deterministic
collective).  The helpers here just make the sharding explicit and reusable.

Time-sharded (sequence-parallel) variants of the recurrence ops are built on
di_hpc_tpu.parallel.dscan.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from di_hpc_tpu.ops.scan import gae_denominators
from di_hpc_tpu.parallel.dscan import linear_recurrence_reverse_sharded
from di_hpc_tpu.parallel.mesh import DATA_AXIS, TIME_AXIS, shard_batch_pytree


def data_parallel(fn: Callable, mesh: Mesh, batch_dims, axis: str = DATA_AXIS):
    """Wrap an op so its first (pytree) argument is batch-sharded over `axis`
    before the call.  `batch_dims` mirrors the data pytree (see
    shard_batch_pytree); scalar outputs come back as global reductions.

        dp_vtrace = data_parallel(ops.vtrace_error, mesh,
                                  vtrace_data(1, 1, 1, 1, 1, 1))
        losses = dp_vtrace(data, gamma=0.99)
    """

    @functools.wraps(fn)
    def wrapped(data, *args, **kwargs):
        data = shard_batch_pytree(mesh, data, batch_dims, axis)
        return fn(data, *args, **kwargs)

    return wrapped


def gae_time_sharded(
    value: jax.Array,       # (T+1, B), time-sharded consistently with reward
    reward: jax.Array,      # (T, B)
    mesh: Mesh,
    gamma: float = 0.99,
    lambda_: float = 0.97,
    time_axis: str = TIME_AXIS,
    batch_axis: str | None = None,
) -> jax.Array:
    """Sequence-parallel GAE: the recurrence runs blockwise over a time-sharded
    mesh axis (di_hpc_tpu.parallel.dscan) with one tiny boundary all_gather.

    `value` has T+1 rows which do not tile evenly over the time axis; callers
    pass it replicated (or sharded on batch only) while `reward`/the output
    are time-sharded.
    """
    T = reward.shape[0]
    delta = reward + gamma * value[1:] - value[:-1]
    denom = gae_denominators(T, lambda_, dtype=delta.dtype)
    denom_b = denom.reshape((T,) + (1,) * (delta.ndim - 1))
    items = linear_recurrence_reverse_sharded(
        denom_b * delta,
        jnp.full_like(delta, gamma * lambda_),
        mesh,
        time_axis=time_axis,
        batch_axis=batch_axis,
    )
    return jax.lax.stop_gradient(items / denom_b)
