"""Fused UPGO loss (TPU-native).

Replaces the reference's three-kernel pipeline (src/rl_utils/upgo.cu:8-69):
the data-dependent-lambda return recurrence (upgo_kernel.h:11-38) becomes a
linear recurrence with binary coefficients on the scan core, and the fused
softmax-CE + loss reduction is left to XLA fusion within one jit.
Advantages are stop-gradient (origin/upgo.py:64-66); gradients flow to the
target logits only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from di_hpc_tpu.ops.scan import Method
from di_hpc_tpu.ops.td import generalized_lambda_returns

__all__ = ["upgo_loss", "upgo_returns", "UPGO"]


def upgo_returns(rewards: jax.Array, bootstrap_values: jax.Array,
                 method: Method = "auto") -> jax.Array:
    """UPGO return targets: lambda-returns with gamma=1 and binary lambdas
    (trace continues iff r_{t+1} + V_{t+2} >= V_{t+1}; origin/upgo.py:34-38)."""
    lambdas = ((rewards + bootstrap_values[1:]) >= bootstrap_values[:-1]).astype(rewards.dtype)
    lambdas = jnp.concatenate([lambdas[1:], jnp.ones_like(lambdas[-1:])], axis=0)
    return generalized_lambda_returns(bootstrap_values, rewards, 1.0, lambdas,
                                      method=method)


@functools.partial(jax.jit, static_argnames=("method",))
def upgo_loss(
    target_output: jax.Array,     # (T, B, N)
    rhos: jax.Array,              # (T, B)
    action: jax.Array,            # (T, B)
    rewards: jax.Array,           # (T, B)
    bootstrap_values: jax.Array,  # (T+1, B)
    method: Method = "auto",
) -> jax.Array:
    from di_hpc_tpu.ops._backend import fused_kernels_ok
    from di_hpc_tpu.ops.categorical import logp
    from di_hpc_tpu.ops._validate import check_upgo

    check_upgo("upgo_loss", target_output, rhos, action, rewards,
               bootstrap_values)

    v = jax.lax.stop_gradient(bootstrap_values)
    r = jax.lax.stop_gradient(rewards)
    rh = jax.lax.stop_gradient(rhos)
    from di_hpc_tpu.ops._backend import UPGO_NBUFS
    if fused_kernels_ok(v, r, rh, method=method, n_bufs=UPGO_NBUFS):
        from di_hpc_tpu.pallas_kernels.rl_scans import upgo_loss_pallas

        # One kernel pass derives the binary lambdas, the gamma=1 return
        # recurrence, the advantage AND the loss reduction (r5: the
        # advantage/metric planes never round-trip HBM and the separate
        # mean pass disappears — profile_upgo_r5.py measured ~30us of
        # composition overhead between the head, the adv kernel, and the
        # mean at T=128, B=512).
        metric = logp(target_output, action)
        return upgo_loss_pallas(rh, metric, r, v)
    returns = upgo_returns(r, v, method=method)
    advantages = rh * (returns - v[:-1])
    metric = logp(target_output, action)
    return -jnp.mean(advantages * metric)


class UPGO:
    """Shape-static wrapper mirroring hpc_rll/rl_utils/upgo.py:30-79."""

    def __init__(self, T: int, B: int, N: int):
        self.T, self.B, self.N = T, B, N

    def __call__(self, target_output, rhos, action, rewards, bootstrap_values):
        assert target_output.shape == (self.T, self.B, self.N)
        assert bootstrap_values.shape == (self.T + 1, self.B)
        return upgo_loss(target_output, rhos, action, rewards, bootstrap_values)

    forward = __call__
