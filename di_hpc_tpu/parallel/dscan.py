"""Time-sharded (sequence-parallel) linear recurrences.

The reference handles long trajectories by one CUDA thread looping over T on a
single device (SURVEY.md §5.7) — sequence length does not scale at all.  Here
T is sharded over a mesh axis and the recurrence y_t = a_t + b_t * y_{t+1}
runs blockwise:

 1. each device solves its local chunk with a zero terminal condition and
    computes the chunk's composed affine map (b_prod, a_comp);
 2. one tiny all_gather of the K per-chunk maps rides the ICI;
 3. every device composes the maps of the chunks *after* (resp. before) its
    own to get its incoming carry, then applies the carry through its local
    suffix (resp. prefix) b-products.

This is the framework's analogue of context/sequence parallelism: the
boundary exchange is O(K * B) while the local work is O(T/K * B) per device.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from di_hpc_tpu.ops.scan import (
    linear_recurrence_forward,
    linear_recurrence_reverse,
)


def _reverse_suffix_products(b: jax.Array) -> jax.Array:
    """s[t] = prod_{u >= t} b[u] along axis 0 (inclusive suffix products)."""
    return jnp.cumprod(b[::-1], axis=0)[::-1]


def _forward_prefix_products(b: jax.Array) -> jax.Array:
    """s[t] = prod_{u <= t} b[u] along axis 0 (inclusive prefix products)."""
    return jnp.cumprod(b, axis=0)


def _local_reverse(a_loc, b_loc, axis_name):
    y_loc = linear_recurrence_reverse(a_loc, b_loc)
    bprod = _reverse_suffix_products(b_loc)                 # (C, B)
    # Chunk-level affine map applied to the carry entering from later chunks.
    chunk_b, chunk_a = bprod[0], y_loc[0]
    all_b = jax.lax.all_gather(chunk_b, axis_name)          # (K, B)
    all_a = jax.lax.all_gather(chunk_a, axis_name)          # (K, B)
    # z[k] = composition over chunks k..K-1 applied to 0; the carry entering
    # chunk k is z[k+1] (0 for the last chunk).
    z = linear_recurrence_reverse(all_a, all_b, method="associative")
    carry_all = jnp.concatenate([z[1:], jnp.zeros_like(z[-1:])], axis=0)
    carry = carry_all[jax.lax.axis_index(axis_name)]
    return y_loc + bprod * carry


def _local_forward(a_loc, b_loc, axis_name):
    y_loc = linear_recurrence_forward(a_loc, b_loc)
    bprod = _forward_prefix_products(b_loc)
    chunk_b, chunk_a = bprod[-1], y_loc[-1]
    all_b = jax.lax.all_gather(chunk_b, axis_name)
    all_a = jax.lax.all_gather(chunk_a, axis_name)
    z = linear_recurrence_forward(all_a, all_b, method="associative")
    carry_all = jnp.concatenate([jnp.zeros_like(z[:1]), z[:-1]], axis=0)
    carry = carry_all[jax.lax.axis_index(axis_name)]
    return y_loc + bprod * carry


def linear_recurrence_reverse_sharded(
    a: jax.Array,
    b: jax.Array,
    mesh: Mesh,
    time_axis: str = "time",
    batch_axis: Optional[str] = None,
) -> jax.Array:
    """y_t = a_t + b_t * y_{t+1} with axis 0 (time) sharded over `time_axis`
    and, optionally, axis 1 (batch) sharded over `batch_axis`."""
    b = jnp.broadcast_to(jnp.asarray(b, a.dtype), a.shape)
    spec = P(time_axis, *( (batch_axis,) if batch_axis else () ))
    fn = jax.shard_map(
        functools.partial(_local_reverse, axis_name=time_axis),
        mesh=mesh, in_specs=(spec, spec), out_specs=spec,
    )
    return fn(a, b)


def linear_recurrence_forward_sharded(
    a: jax.Array,
    b: jax.Array,
    mesh: Mesh,
    time_axis: str = "time",
    batch_axis: Optional[str] = None,
) -> jax.Array:
    """y_t = a_t + b_t * y_{t-1} with time sharded over `time_axis`."""
    b = jnp.broadcast_to(jnp.asarray(b, a.dtype), a.shape)
    spec = P(time_axis, *( (batch_axis,) if batch_axis else () ))
    fn = jax.shard_map(
        functools.partial(_local_forward, axis_name=time_axis),
        mesh=mesh, in_specs=(spec, spec), out_specs=spec,
    )
    return fn(a, b)
