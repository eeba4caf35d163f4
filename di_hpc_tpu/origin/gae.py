"""Generalized Advantage Estimation oracle (pure jnp, naive sequential scan).

Reproduces the reference origin implementation exactly, including its
denominator-normalized variant (reference: hpc_rll/origin/gae.py:27-37):

    delta_t = r_t + gamma*V_{t+1} - V_t
    denom   = 1 + lambda*denom          (denom_T = 0)
    gae     = denom*delta_t + gamma*lambda*gae   (gae_T = 0)
    adv_t   = gae / denom

This module is the correctness oracle and the naive-lowering benchmark
baseline; the fused TPU op lives in di_hpc_tpu.ops.gae.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class gae_data(NamedTuple):
    value: jax.Array   # (T+1, B)
    reward: jax.Array  # (T, B)


def gae(data: gae_data, gamma: float = 0.99, lambda_: float = 0.97) -> jax.Array:
    """Compute advantages (T, B) from value (T+1, B) and reward (T, B)."""
    value, reward = data
    delta = reward + gamma * value[1:] - value[:-1]
    factor = gamma * lambda_

    def step(carry, delta_t):
        gae_item, denom = carry
        denom = 1.0 + lambda_ * denom
        gae_item = denom * delta_t + factor * gae_item
        return (gae_item, denom), gae_item / denom

    init = (jnp.zeros_like(delta[0]), jnp.asarray(0.0, delta.dtype))
    _, adv = jax.lax.scan(step, init, delta, reverse=True)
    return adv
