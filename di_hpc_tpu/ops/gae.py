"""Fused GAE (TPU-native).

Replaces the reference's one-thread-per-lane reverse loop
(include/hpc/rll/cuda/rl_utils/gae_kernel.h:10-35) with:

 - the denominator recurrence solved in closed form (it is batch-independent;
   see di_hpc_tpu.ops.scan.gae_denominators), and
 - the gae recurrence gae_t = denom_t*delta_t + (gamma*lambda)*gae_{t+1} as a
   log-depth associative scan / single-pass Pallas kernel.

Forward-only, like the reference (GAEFunction.backward returns Nones,
hpc_rll/rl_utils/gae.py:16-18): callers should treat the output as
stop-gradient; we apply stop_gradient explicitly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from di_hpc_tpu.origin.gae import gae_data
from di_hpc_tpu.ops.scan import (
    Method,
    gae_denominators,
    linear_recurrence_reverse,
)

__all__ = ["gae", "gae_data", "GAE"]


@functools.partial(jax.jit, static_argnames=("gamma", "lambda_", "method"))
def gae(data: gae_data, gamma: float = 0.99, lambda_: float = 0.97,
        method: Method = "auto") -> jax.Array:
    """value (T+1, B), reward (T, B) -> advantage (T, B)."""
    from di_hpc_tpu.ops._backend import fused_kernels_ok
    from di_hpc_tpu.ops._validate import check_time_batch

    value, reward = data
    check_time_batch("gae", value, reward)
    T = reward.shape[0]

    if fused_kernels_ok(value, reward, method=method):
        from di_hpc_tpu.pallas_kernels.rl_scans import gae_fused_pallas

        return jax.lax.stop_gradient(
            gae_fused_pallas(value, reward, gamma, lambda_))

    delta = reward + gamma * value[1:] - value[:-1]
    denom = gae_denominators(T, lambda_, dtype=delta.dtype)   # (T,)
    denom_b = denom.reshape((T,) + (1,) * (delta.ndim - 1))
    gae_item = linear_recurrence_reverse(
        denom_b * delta, jnp.full_like(delta, gamma * lambda_), method=method
    )
    return jax.lax.stop_gradient(gae_item / denom_b)


class GAE:
    """Shape-static wrapper mirroring the reference module API
    (hpc_rll/rl_utils/gae.py:20-61).  In JAX the static-shape/pre-allocated
    buffer idiom is subsumed by jit; this class only validates shapes."""

    def __init__(self, T: int, B: int):
        self.T, self.B = T, B

    def __call__(self, value: jax.Array, reward: jax.Array,
                 gamma: float = 0.99, lambda_: float = 0.97) -> jax.Array:
        assert value.shape == (self.T + 1, self.B), value.shape
        assert reward.shape == (self.T, self.B), reward.shape
        return gae(gae_data(value, reward), gamma, lambda_)

    forward = __call__
