"""UPGO loss oracle (AlphaStar) — pure jnp port of reference origin semantics
(hpc_rll/origin/upgo.py:7-70).

UPGO is a lambda-return with data-dependent binary lambdas: the trace
continues (lambda=1) iff r_{t+1} + V_{t+2} >= V_{t+1}.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from di_hpc_tpu.origin.td import generalized_lambda_returns
from di_hpc_tpu.origin.ppo import categorical_log_prob


def tb_cross_entropy(logit: jax.Array, label: jax.Array) -> jax.Array:
    """(T, B, N) logits, (T, B) labels -> (T, B) log-prob of the label.

    The reference computes -F.cross_entropy then means over a trailing axis of
    size 1 (origin/upgo.py:7-18); net effect is log softmax at the label.
    """
    assert label.ndim == 2
    return categorical_log_prob(logit, label)


def upgo_returns(rewards: jax.Array, bootstrap_values: jax.Array) -> jax.Array:
    """rewards (T, B), bootstrap_values (T+1, B) -> (T, B) UPGO return targets."""
    # lambdas[t] decides whether the trace continues at t, shifted forward one
    # step with 1.0 appended (reference origin/upgo.py:36-37); lambdas[-1] is
    # ignored by generalized_lambda_returns.
    lambdas = ((rewards + bootstrap_values[1:]) >= bootstrap_values[:-1]).astype(rewards.dtype)
    lambdas = jnp.concatenate([lambdas[1:], jnp.ones_like(lambdas[-1:])], axis=0)
    return generalized_lambda_returns(bootstrap_values, rewards, 1.0, lambdas)


def upgo_loss(
    target_output: jax.Array,    # (T, B, N)
    rhos: jax.Array,             # (T, B) importance ratios
    action: jax.Array,           # (T, B)
    rewards: jax.Array,          # (T, B)
    bootstrap_values: jax.Array, # (T+1, B)
) -> jax.Array:
    returns = upgo_returns(rewards, bootstrap_values)
    advantages = jax.lax.stop_gradient(rhos * (returns - bootstrap_values[:-1]))
    metric = tb_cross_entropy(target_output, action)
    return -jnp.mean(advantages * metric)
