"""Multi-host runtime initialization.

The reference has no communication backend at all (SURVEY.md §2.5) — its
"distribution" is the CUDA grid.  On TPU pods the runtime contract is:

 1. every host calls `initialize()` (jax.distributed) before first jax use;
 2. arrays are globally sharded over a Mesh spanning all hosts; XLA routes
    collectives over ICI within a slice and DCN across slices;
 3. per-host data loading feeds the global batch via
    `jax.make_array_from_process_local_data`.

Failure semantics are delegated to the JAX runtime (a lost host fails the
step; restart + checkpoint restore is the recovery path — see
di_hpc_tpu.utils.checkpoint), mirroring the reference's decision to keep
fault tolerance out of the op library.
"""

from __future__ import annotations

from typing import Optional

import jax

__all__ = ["initialize", "global_batch_from_host_local"]


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize the multi-host runtime (no-op on a single process).

    On TPU pods with standard orchestration (GKE/QueuedResources) all
    arguments are auto-detected; pass them explicitly otherwise.
    """
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_batch_from_host_local(mesh, sharding_spec, host_local_batch):
    """Assemble a globally-sharded array from per-host local data."""
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, sharding_spec)
    return jax.make_array_from_process_local_data(sharding, host_local_batch)
