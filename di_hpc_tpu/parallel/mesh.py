"""Device-mesh construction and sharding helpers.

The reference has no distribution subsystem at all (SURVEY.md §2.5) — its
only parallel axis is the CUDA grid over B.  The TPU-native design makes
parallelism first-class: ops are written once and scaled by sharding their
batch (and optionally time) dimensions over a `jax.sharding.Mesh`; XLA
inserts the ICI/DCN collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
TIME_AXIS = "time"
MODEL_AXIS = "model"


def make_mesh(
    axis_sizes: Optional[dict] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh from {axis_name: size}.  A single -1 size is inferred.

    Default: all devices on a single 'data' axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if not axis_sizes:
        axis_sizes = {DATA_AXIS: n}
    names = tuple(axis_sizes.keys())
    sizes = list(axis_sizes.values())
    n_infer = sizes.count(-1)
    assert n_infer <= 1, "at most one axis size may be -1"
    if n_infer:
        known = int(np.prod([s for s in sizes if s != -1])) if len(sizes) > 1 else 1
        assert n % known == 0, (n, axis_sizes)
        sizes[sizes.index(-1)] = n // known
    total = int(np.prod(sizes))
    assert total == n, f"mesh {dict(zip(names, sizes))} != {n} devices"
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, names)


def batch_sharding(mesh: Mesh, batch_dim: int, ndim: int,
                   axis: str = DATA_AXIS) -> NamedSharding:
    """NamedSharding placing `axis` on dimension `batch_dim` of a rank-`ndim`
    array, replicated elsewhere."""
    spec = [None] * ndim
    spec[batch_dim] = axis
    return NamedSharding(mesh, P(*spec))


def shard_batch_pytree(mesh: Mesh, tree, batch_dims, axis: str = DATA_AXIS):
    """device_put a pytree with per-leaf batch dims.

    `batch_dims` is a pytree with the same structure as `tree` (or a single
    int applied to every leaf) giving the dimension to shard over `axis`; a
    batch_dim of -1 replicates that leaf.  None entries must match in both
    trees (they are structure, not leaves).
    """
    if isinstance(batch_dims, int):
        dims_tree = jax.tree.map(lambda _: batch_dims, tree)
    else:
        dims_tree = batch_dims

    def put(leaf, d):
        if d == -1:
            sh = NamedSharding(mesh, P())
        else:
            sh = batch_sharding(mesh, d, jax.numpy.asarray(leaf).ndim, axis)
        return jax.device_put(leaf, sh)

    return jax.tree.map(put, tree, dims_tree)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
