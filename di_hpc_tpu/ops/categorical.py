"""Categorical head with automatic fused-kernel dispatch.

logp_entropy(logits, actions) returns (log-prob of action, entropy) computed
either by the single-pass Pallas kernel (TPU, f32) or by plain jnp (which XLA
fuses reasonably but with more HBM passes over the logits).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from di_hpc_tpu.origin.ppo import categorical_entropy, categorical_log_prob

__all__ = ["logp_entropy", "logp"]


def logp_entropy(logits: jax.Array, actions: jax.Array):
    from di_hpc_tpu.pallas_kernels import categorical as _cat

    if _cat.supports(logits):
        return _cat.logp_entropy_pallas(logits, actions)
    return categorical_log_prob(logits, actions), categorical_entropy(logits)


def logp(logits: jax.Array, actions: jax.Array) -> jax.Array:
    """Log-prob only (the fused kernel computes entropy as a byproduct; when
    it is unused XLA drops the dead output buffer copy)."""
    from di_hpc_tpu.pallas_kernels import categorical as _cat

    if _cat.supports(logits):
        return _cat.logp_entropy_pallas(logits, actions)[0]
    return categorical_log_prob(logits, actions)
