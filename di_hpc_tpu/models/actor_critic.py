"""AlphaStar autoregressive policy-head helpers (TPU-native).

Functional equivalents of the `hpc_models` extension
(/root/reference/src/models/actor_critic.cu, actor_critic_kernel.h).  The
reference mutates caller buffers in place; here every op returns new arrays
(donate via jit if in-place semantics are needed for memory).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from di_hpc_tpu.utils.constants import (
    PRE_SAMPLE_DIV_FACTOR,
    PRE_SAMPLE_MASK_VALUE,
)

__all__ = ["update_ae", "lstm_activation", "pre_sample"]


@jax.jit
def update_ae(
    autoregressive_embedding: jax.Array,  # (B, D)
    key_embeddings: jax.Array,            # (B, M, D)
    sample_entity: jax.Array,             # (B,) int
    entity_num: jax.Array,                # (B,) int
) -> jax.Array:
    """ae[b] += key_embeddings[b, sample_entity[b]] unless the sampled entity
    equals entity_num[b] (end flag) (reference actor_critic_kernel.h:12-31)."""
    end_flag = sample_entity == entity_num
    # iota-compare gather instead of take_along_axis (a dynamic gather, which
    # serializes on TPU — CLAUDE.md perf lore); out-of-range "end" indices
    # simply match no row, folding the end-flag zero into the same select.
    row = jax.lax.broadcasted_iota(jnp.int32, key_embeddings.shape[:2], 1)
    hit = (row == sample_entity[:, None]) & ~end_flag[:, None]
    ke = jnp.sum(jnp.where(hit[..., None], key_embeddings, 0.0), axis=1)
    return autoregressive_embedding + ke


@jax.jit
def lstm_activation(
    in_x: jax.Array,  # (B, 4H) precomputed x @ W_ih^T
    in_h: jax.Array,  # (B, 4H) precomputed h @ W_hh^T
    bias: jax.Array,  # (4H,)   b_ih + b_hh
    h: jax.Array,     # (B, H)  (unused value; kept for API parity)
    c: jax.Array,     # (B, H)
):
    """Single fused LSTM cell activation with torch.nn.LSTM gate order
    i, f, g, o (reference actor_critic_kernel.h:33-56 — note this differs from
    the network LSTM's i, f, o, u order).  Returns (h_new, c_new)."""
    gate = in_x + in_h + bias
    i, f, g, o = jnp.split(gate, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


@functools.partial(jax.jit, static_argnames=("mask_value", "div_factor"))
def pre_sample(
    mat: jax.Array,   # (B, M, H) entity keys
    vec: jax.Array,   # (B, H) query
    mask: jax.Array,  # (B, M) bool
    mask_value: float = PRE_SAMPLE_MASK_VALUE,
    div_factor: float = PRE_SAMPLE_DIV_FACTOR,
) -> jax.Array:
    """Masked scaled dot-product logits:
    out[b, m] = mask ? <mat[b, m], vec[b]> / div : mask_value / div
    (reference actor_critic_kernel.h:58-79 with constants from
    src/models/actor_critic.cu:77-78).  The batched mat-vec runs on the MXU."""
    logits = jnp.einsum("bmh,bh->bm", mat, vec,
                        preferred_element_type=mat.dtype) / div_factor
    return jnp.where(mask, logits, mask_value / div_factor)
