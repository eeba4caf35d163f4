"""Fused PPO loss (TPU-native).

The reference hand-fuses categorical log-prob/entropy + surrogate clipping +
value clip + monitor stats + grad stashes into two CUDA kernels
(include/hpc/rll/cuda/rl_utils/ppo_kernel.h:12-242).  The TPU version uses
the fused categorical head (di_hpc_tpu.ops.categorical — one XLA-fused pass
over the new logits yields log-prob + entropy, with a stash-free recompute
backward) plus XLA fusion for the purely elementwise surrogate / value-clip
arithmetic; JAX autodiff reproduces the hand-derived backward, including the
dual-clip subgradient choices.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from typing import NamedTuple

from di_hpc_tpu.origin.ppo import ppo_data, ppo_info, ppo_loss

__all__ = ["ppo_error", "ppo_error_with_logp_old", "ppo_data",
           "ppo_fast_data", "ppo_loss", "ppo_info", "PPO"]


class ppo_fast_data(NamedTuple):
    """ppo_data with the old-policy head precomputed: `logp_old` replaces
    `logit_old`.  Compute it ONCE per collected batch with
    `ops.logp(logit_old, action)` and reuse it across every PPO epoch /
    minibatch — the reference kernel recomputes the old-logits log-prob
    in-kernel on every call (ppo_kernel.h:114-150), paying ~35% of the fused
    op per epoch for a value that never changes within a batch."""
    logit_new: jax.Array   # (B, N)
    logp_old: jax.Array    # (B,)
    action: jax.Array      # (B,)
    value_new: jax.Array   # (B,)
    value_old: jax.Array   # (B,)
    adv: jax.Array         # (B,)
    return_: jax.Array     # (B,)
    weight: Optional[jax.Array]


def _ppo_core(logp_new, entropy, logp_old, value_new, value_old, adv,
              return_, weight, clip_ratio, use_value_clip, dual_clip):
    """Surrogate/value-clip/entropy losses + monitor scalars from
    precomputed per-sample heads (everything downstream of the categorical
    heads in the reference's fused kernel, ppo_kernel.h:152-242)."""
    if weight is None:
        weight = jnp.ones_like(adv)
    entropy_loss = jnp.mean(entropy * weight)

    ratio = jnp.exp(logp_new - logp_old)
    surr1 = ratio * adv
    surr2 = jnp.clip(ratio, 1 - clip_ratio, 1 + clip_ratio) * adv
    if dual_clip is not None:
        policy_loss = jnp.mean(
            -jnp.maximum(jnp.minimum(surr1, surr2), dual_clip * adv) * weight)
    else:
        policy_loss = jnp.mean(-jnp.minimum(surr1, surr2) * weight)

    approx_kl = jax.lax.stop_gradient(jnp.mean(logp_old - logp_new))
    clipped = (ratio > 1 + clip_ratio) | (ratio < 1 - clip_ratio)
    clipfrac = jax.lax.stop_gradient(jnp.mean(clipped.astype(adv.dtype)))

    if use_value_clip:
        value_clip = value_old + jnp.clip(value_new - value_old,
                                          -clip_ratio, clip_ratio)
        v1 = (return_ - value_new) ** 2
        v2 = (return_ - value_clip) ** 2
        value_loss = 0.5 * jnp.mean(jnp.maximum(v1, v2) * weight)
    else:
        value_loss = 0.5 * jnp.mean((return_ - value_new) ** 2 * weight)

    return (ppo_loss(policy_loss, value_loss, entropy_loss),
            ppo_info(approx_kl, clipfrac))


@functools.partial(
    jax.jit, static_argnames=("clip_ratio", "use_value_clip", "dual_clip"))
def ppo_error(
    data: ppo_data,
    clip_ratio: float = 0.2,
    use_value_clip: bool = True,
    dual_clip: Optional[float] = None,
):
    from di_hpc_tpu.ops.categorical import logp, logp_entropy

    assert dual_clip is None or dual_clip > 1.0, (
        f"dual_clip value must be greater than 1.0, but get value: {dual_clip}"
    )
    logit_new, logit_old, action, value_new, value_old, adv, return_, weight = data
    from di_hpc_tpu.ops._validate import check_ppo
    check_ppo("ppo_error", logit_new, logit_old, action, value_new,
              value_old, adv, return_, weight)

    logp_new, entropy = logp_entropy(logit_new, action)
    logp_old = jax.lax.stop_gradient(logp(logit_old, action))
    return _ppo_core(logp_new, entropy, logp_old, value_new, value_old,
                     adv, return_, weight, clip_ratio, use_value_clip,
                     dual_clip)


@functools.partial(
    jax.jit, static_argnames=("clip_ratio", "use_value_clip", "dual_clip"))
def ppo_error_with_logp_old(
    data: ppo_fast_data,
    clip_ratio: float = 0.2,
    use_value_clip: bool = True,
    dual_clip: Optional[float] = None,
):
    """Fast-path PPO loss with the old-policy log-prob precomputed.

    Numerically identical to `ppo_error` when
    `logp_old == ops.logp(logit_old, action)`; skips the per-call old-logits
    head (which the reference recomputes every call, ppo_kernel.h:114-150).
    In a T_epochs x M_minibatches PPO loop, compute logp_old once per batch
    and pass it here (see examples/ppo_training.py).
    """
    from di_hpc_tpu.ops.categorical import logp_entropy

    assert dual_clip is None or dual_clip > 1.0, (
        f"dual_clip value must be greater than 1.0, but get value: {dual_clip}"
    )
    (logit_new, logp_old, action, value_new, value_old, adv, return_,
     weight) = data
    from di_hpc_tpu.ops._validate import check_ppo_fast
    check_ppo_fast("ppo_error_with_logp_old", logit_new, logp_old, action,
                   value_new, value_old, adv, return_, weight)

    logp_new, entropy = logp_entropy(logit_new, action)
    logp_old = jax.lax.stop_gradient(logp_old)
    return _ppo_core(logp_new, entropy, logp_old, value_new, value_old,
                     adv, return_, weight, clip_ratio, use_value_clip,
                     dual_clip)


class PPO:
    """Shape-static wrapper mirroring hpc_rll/rl_utils/ppo.py:12-148.

    The reference encodes dual_clip=None as a 0.0 sentinel for the kernel
    (rl_utils/ppo.py:136-137); here None is handled natively as a static
    branch at trace time.
    """

    def __init__(self, B: int, N: int):
        self.B, self.N = B, N

    def __call__(self, logit_new, logit_old, action, value_new, value_old,
                 adv, return_, weight=None, clip_ratio: float = 0.2,
                 use_value_clip: bool = True, dual_clip=None):
        assert logit_new.shape == (self.B, self.N)
        return ppo_error(
            ppo_data(logit_new, logit_old, action, value_new, value_old,
                     adv, return_, weight),
            clip_ratio, use_value_clip, dual_clip,
        )

    forward = __call__
