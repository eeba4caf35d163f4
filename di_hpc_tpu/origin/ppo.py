"""PPO loss oracle (pure jnp).

Functional port of reference origin semantics (hpc_rll/origin/ppo.py:13-80):
policy loss with clip + optional dual-clip (arXiv:1912.09729), optional value
clip, entropy loss, plus approx_kl / clipfrac monitor scalars (stop-gradient).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class ppo_data(NamedTuple):
    logit_new: jax.Array   # (B, N)
    logit_old: jax.Array   # (B, N)
    action: jax.Array      # (B,)
    value_new: jax.Array   # (B,)
    value_old: jax.Array   # (B,)
    adv: jax.Array         # (B,)
    return_: jax.Array     # (B,)
    weight: Optional[jax.Array]


class ppo_loss(NamedTuple):
    policy_loss: jax.Array
    value_loss: jax.Array
    entropy_loss: jax.Array


class ppo_info(NamedTuple):
    approx_kl: jax.Array
    clipfrac: jax.Array


def categorical_log_prob(logit: jax.Array, action: jax.Array) -> jax.Array:
    """log softmax(logit)[action] along the last axis."""
    logp = jax.nn.log_softmax(logit, axis=-1)
    return jnp.take_along_axis(logp, action[..., None], axis=-1)[..., 0]


def categorical_entropy(logit: jax.Array) -> jax.Array:
    """Entropy of Categorical(logits=logit) along the last axis."""
    logp = jax.nn.log_softmax(logit, axis=-1)
    return -jnp.sum(jnp.exp(logp) * logp, axis=-1)


def ppo_error(
    data: ppo_data,
    clip_ratio: float = 0.2,
    use_value_clip: bool = True,
    dual_clip: Optional[float] = None,
):
    assert dual_clip is None or dual_clip > 1.0, (
        f"dual_clip value must be greater than 1.0, but get value: {dual_clip}"
    )
    logit_new, logit_old, action, value_new, value_old, adv, return_, weight = data
    if weight is None:
        weight = jnp.ones_like(adv)

    logp_new = categorical_log_prob(logit_new, action)
    logp_old = categorical_log_prob(logit_old, action)
    entropy_loss = jnp.mean(categorical_entropy(logit_new) * weight)

    ratio = jnp.exp(logp_new - logp_old)
    surr1 = ratio * adv
    surr2 = jnp.clip(ratio, 1 - clip_ratio, 1 + clip_ratio) * adv
    if dual_clip is not None:
        policy_loss = jnp.mean(-jnp.maximum(jnp.minimum(surr1, surr2), dual_clip * adv) * weight)
    else:
        policy_loss = jnp.mean(-jnp.minimum(surr1, surr2) * weight)

    approx_kl = jax.lax.stop_gradient(jnp.mean(logp_old - logp_new))
    clipped = (ratio > 1 + clip_ratio) | (ratio < 1 - clip_ratio)
    clipfrac = jax.lax.stop_gradient(jnp.mean(clipped.astype(adv.dtype)))

    if use_value_clip:
        value_clip = value_old + jnp.clip(value_new - value_old, -clip_ratio, clip_ratio)
        v1 = (return_ - value_new) ** 2
        v2 = (return_ - value_clip) ** 2
        value_loss = 0.5 * jnp.mean(jnp.maximum(v1, v2) * weight)
    else:
        value_loss = 0.5 * jnp.mean((return_ - value_new) ** 2 * weight)

    return ppo_loss(policy_loss, value_loss, entropy_loss), ppo_info(approx_kl, clipfrac)
