"""Autoregressive entity-selection head (AlphaStar selected-units style).

Composes the three `hpc_models` helper ops the reference ships in isolation
(src/models/actor_critic.cu; tested separately in tests/test_actor_critic.py)
into the loop they exist for: at each step, attend over entity keys from the
current autoregressive embedding (pre_sample), pick an entity, fold its key
embedding back into the embedding (update_ae), and advance a single-cell LSTM
(lstm_activation).  Selection ends when the policy picks the sentinel index
`entity_num` (the "end" token).

The loop is a `lax.scan` over a static maximum number of selections with
masking after termination — the jit-compatible form of the reference's
host-side Python loop.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from di_hpc_tpu.models.actor_critic import lstm_activation, pre_sample, update_ae

__all__ = ["EntitySelectionParams", "init_entity_selection", "select_entities"]


class EntitySelectionParams(NamedTuple):
    w_ih: jax.Array   # (D, 4H) input->gates for the LSTM cell (torch i,f,g,o)
    w_hh: jax.Array   # (H, 4H)
    bias: jax.Array   # (4H,)
    w_query: jax.Array  # (H, Hk) lstm output -> attention query


def init_entity_selection(key: jax.Array, input_dim: int, hidden: int,
                          key_dim: int) -> EntitySelectionParams:
    k1, k2, k3 = jax.random.split(key, 3)
    s = 1.0 / jnp.sqrt(hidden)
    return EntitySelectionParams(
        w_ih=jax.random.normal(k1, (input_dim, 4 * hidden)) / jnp.sqrt(input_dim),
        w_hh=jax.random.normal(k2, (hidden, 4 * hidden)) * s,
        bias=jnp.zeros((4 * hidden,)),
        w_query=jax.random.normal(k3, (hidden, key_dim)) * s,
    )


def select_entities(
    params: EntitySelectionParams,
    key_embeddings: jax.Array,      # (B, M, Dk)
    entity_mask: jax.Array,         # (B, M) bool — selectable entities
    entity_num: jax.Array,          # (B,) int — index of the end sentinel
    init_ae: jax.Array,             # (B, D) initial autoregressive embedding
    lstm_state: Tuple[jax.Array, jax.Array],  # (h, c), each (B, H)
    max_selections: int,
    rng: Optional[jax.Array] = None,  # sample when given, else argmax
):
    """Returns a 4-tuple (selected (S, B) int32 — entity_num[b] marks
    'end'/done, logits (S, B, M+1), new_lstm_state (h, c), final
    autoregressive embedding (B, D)).

    Per-row, column entity_num[b] is the end sentinel (zero key): choosing it
    terminates that row's selection — the reference encodes "end" the same
    way (sample_entity == entity_num, actor_critic_kernel.h:20-22).  Ragged
    batches (entity_num[b] < M) are supported: padding entities at columns
    >= entity_num[b] are masked out and their keys zeroed.  Already-selected
    entities are masked out, matching AlphaStar semantics.
    """
    B, M, Dk = key_embeddings.shape
    H = params.w_hh.shape[0]

    col = jax.lax.broadcasted_iota(jnp.int32, (B, M + 1), 1)
    is_real = col < entity_num[:, None]            # true entities per row
    is_sentinel = col == entity_num[:, None]       # per-row end column
    keys_ext = jnp.concatenate(
        [key_embeddings, jnp.zeros((B, 1, Dk), key_embeddings.dtype)], axis=1)
    # Zero the sentinel/padding keys so 'end' attends against a zero vector.
    keys_ext = jnp.where(is_real[..., None], keys_ext, 0.0)
    mask_pad = jnp.concatenate([entity_mask, jnp.ones((B, 1), bool)], axis=1)
    mask_ext = (is_real & mask_pad) | is_sentinel

    def step(carry, step_rng):
        ae, h, c, avail, done = carry
        ih = ae @ params.w_ih
        hh = h @ params.w_hh
        h_new, c_new = lstm_activation(ih, hh, params.bias, h, c)
        query = h_new @ params.w_query                         # (B, Dk)
        logits = pre_sample(keys_ext, query, avail)            # (B, M+1)
        if step_rng is None:
            choice = jnp.argmax(logits, axis=-1)
        else:
            choice = jax.random.categorical(step_rng, logits, axis=-1)
        choice = jnp.where(done, entity_num, choice).astype(jnp.int32)
        is_end = choice == entity_num
        ae_new = update_ae(ae, key_embeddings, choice, entity_num)
        # An entity can be selected once; the end sentinel stays available
        # forever (so its log-prob is finite at every step — a policy-
        # gradient loss on the selection logits needs logp('end') to be a
        # real number, not the pre_sample mask value).
        col_sel = jax.lax.broadcasted_iota(jnp.int32, avail.shape, 1)
        avail = avail & ((col_sel != choice[:, None])
                         | (col_sel == entity_num[:, None]))
        done_new = done | is_end
        h_out = jnp.where(done[:, None], h, h_new)
        c_out = jnp.where(done[:, None], c, c_new)
        return (ae_new, h_out, c_out, avail, done_new), (choice, logits)

    h0, c0 = lstm_state
    init = (init_ae, h0, c0, mask_ext, jnp.zeros((B,), bool))
    if rng is None:
        carry, (selected, logits) = jax.lax.scan(
            step, init, None, length=max_selections)
    else:
        keys = jax.random.split(rng, max_selections)
        carry, (selected, logits) = jax.lax.scan(step, init, keys)
    ae, h, c, _, _ = carry
    return selected, logits, (h, c), ae
