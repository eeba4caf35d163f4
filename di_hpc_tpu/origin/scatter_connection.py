"""AlphaStar entity-scatter oracle (pure jnp).

Port of reference semantics (hpc_rll/origin/scatter_connection.py:26-65):
scatter (B, M, N) entity embeddings to a (B, N, H, W) spatial map at (y, x)
locations.

Determinism note: the reference's GPU 'cover' mode is admittedly
nondeterministic on collisions (tests/test_scatter.py:17).  Here BOTH modes
are deterministic: 'add' sums collisions (scatter-add is order-independent)
and 'cover' keeps the HIGHEST entity index m (last-writer in entity order —
the torch CPU `scatter_` behavior the reference tests validate against).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def scatter_connection(
    x: jax.Array,              # (B, M, N)
    spatial_size: Tuple[int, int],
    location: jax.Array,       # (B, M, 2) int (y, x)
    scatter_type: str = "cover",
) -> jax.Array:
    assert scatter_type in ("cover", "add"), scatter_type
    B, M, N = x.shape
    H, W = spatial_size
    cell = location[..., 0] * W + location[..., 1]          # (B, M)

    if scatter_type == "add":
        out = jnp.zeros((B, H * W, N), x.dtype)
        out = jax.vmap(lambda o, idx, val: o.at[idx].add(val))(out, cell, x)
    else:
        # Deterministic last-writer: find the max entity index landing on each
        # cell via scatter-max, then gather that entity's embedding.
        m_ids = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32), (B, M))
        winner = jnp.full((B, H * W), -1, jnp.int32)
        winner = jax.vmap(lambda w, idx, m: w.at[idx].max(m))(winner, cell, m_ids)
        gathered = jnp.take_along_axis(
            x, jnp.maximum(winner, 0)[..., None], axis=1
        )  # (B, H*W, N)
        out = jnp.where(winner[..., None] >= 0, gathered, 0.0)

    return out.reshape(B, H, W, N).transpose(0, 3, 1, 2)


class ScatterConnection:
    """Thin stateful wrapper mirroring the reference nn.Module API."""

    def __init__(self, scatter_type: str):
        assert scatter_type in ("cover", "add")
        self.scatter_type = scatter_type

    def __call__(self, x, spatial_size, location):
        return scatter_connection(x, spatial_size, location, self.scatter_type)

    forward = __call__
