"""V-trace (IMPALA, arXiv:1802.01561) oracle — pure jnp port of reference
origin semantics (hpc_rll/origin/vtrace.py:5-111).

Returns/advantages are computed under stop_gradient (reference wraps them in
torch.no_grad, origin/vtrace.py:64-71); gradients flow only through the
target-policy log-probs, entropy, and the value MSE.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from di_hpc_tpu.origin.ppo import categorical_log_prob, categorical_entropy


class vtrace_data(NamedTuple):
    target_output: jax.Array     # (T, B, N) logits of the learner policy
    behaviour_output: jax.Array  # (T, B, N) logits of the actor policy
    action: jax.Array            # (T, B)
    value: jax.Array             # (T+1, B)
    reward: jax.Array            # (T, B)
    weight: Optional[jax.Array]  # (T, B)


class vtrace_loss(NamedTuple):
    policy_loss: jax.Array
    value_loss: jax.Array
    entropy_loss: jax.Array


def compute_importance_weights(target_output, behaviour_output, action):
    """IS = exp(logpi_target(a) - logpi_behaviour(a)), shape (T, B)."""
    logp_t = categorical_log_prob(target_output, action)
    logp_b = categorical_log_prob(behaviour_output, action)
    return jnp.exp(logp_t - logp_b)


def vtrace_nstep_return(clipped_rhos, clipped_cs, reward, bootstrap_values,
                        gamma=0.99, lambda_=0.95):
    """vs_t = V_t + sum-recurrence item_t, item_t = delta_t + gamma*lambda*c_t*item_{t+1}."""
    deltas = clipped_rhos * (reward + gamma * bootstrap_values[1:] - bootstrap_values[:-1])
    factor = gamma * lambda_

    def step(carry, x):
        delta_t, c_t = x
        item = delta_t + factor * c_t * carry
        return item, item

    _, items = jax.lax.scan(step, jnp.zeros_like(deltas[0]), (deltas, clipped_cs), reverse=True)
    return bootstrap_values[:-1] + items


def vtrace_advantage(clipped_pg_rhos, reward, return_, bootstrap_values, gamma):
    """adv_t = pg_rho_t * (r_t + gamma*vs_{t+1} - V_t)."""
    return clipped_pg_rhos * (reward + gamma * return_ - bootstrap_values)


def vtrace_error(
    data: vtrace_data,
    gamma: float = 0.99,
    lambda_: float = 0.95,
    rho_clip_ratio: float = 1.0,
    c_clip_ratio: float = 1.0,
    rho_pg_clip_ratio: float = 1.0,
) -> vtrace_loss:
    target_output, behaviour_output, action, value, reward, weight = data

    IS = compute_importance_weights(target_output, behaviour_output, action)
    rhos = jnp.minimum(IS, rho_clip_ratio)
    cs = jnp.minimum(IS, c_clip_ratio)
    return_ = vtrace_nstep_return(rhos, cs, reward, value, gamma, lambda_)
    pg_rhos = jnp.minimum(IS, rho_pg_clip_ratio)
    return_t_plus_1 = jnp.concatenate([return_[1:], value[-1:]], axis=0)
    adv = vtrace_advantage(pg_rhos, reward, return_t_plus_1, value[:-1], gamma)

    return_ = jax.lax.stop_gradient(return_)
    adv = jax.lax.stop_gradient(adv)

    if weight is None:
        weight = jnp.ones_like(reward)

    logp = categorical_log_prob(target_output, action)
    pg_loss = -jnp.mean(logp * adv * weight)
    value_loss = jnp.mean((value[:-1] - return_) ** 2 * weight)
    entropy_loss = jnp.mean(categorical_entropy(target_output) * weight)
    return vtrace_loss(pg_loss, value_loss, entropy_loss)
