"""Autoregressive entity-selection head + serving actor step."""

import jax
import jax.numpy as jnp
import numpy as np

from di_hpc_tpu import models


def _setup(key, B=3, M=6, Dk=8, H=5):
    ks = jax.random.split(key, 4)
    params = models.init_entity_selection(ks[0], input_dim=Dk, hidden=H, key_dim=Dk)
    keys_emb = jax.random.normal(ks[1], (B, M, Dk))
    mask = jnp.ones((B, M), bool)
    entity_num = jnp.full((B,), M, jnp.int32)  # sentinel = appended column M
    ae0 = jax.random.normal(ks[2], (B, Dk))
    h0 = jnp.zeros((B, H)); c0 = jnp.zeros((B, H))
    return params, keys_emb, mask, entity_num, ae0, (h0, c0)


def test_select_entities_shapes_and_no_repeats(key):
    B, M, S = 3, 6, 5
    params, ke, mask, en, ae0, state = _setup(key, B=B, M=M)
    sel, logits, new_state, ae = models.select_entities(
        params, ke, mask, en, ae0, state, max_selections=S)
    assert sel.shape == (S, B) and logits.shape == (S, B, M + 1)
    sel = np.asarray(sel)
    for b in range(B):
        picked = [s for s in sel[:, b] if s != M]
        # entities are selected at most once
        assert len(picked) == len(set(picked))
        # after the first end sentinel, everything is the sentinel
        ended = False
        for s in sel[:, b]:
            if ended:
                assert s == M
            if s == M:
                ended = True


def test_select_entities_respects_mask(key):
    B, M, S = 2, 5, 4
    params, ke, mask, en, ae0, state = _setup(key, B=B, M=M)
    mask = mask.at[:, 2].set(False)  # entity 2 never selectable
    sel, _, _, _ = models.select_entities(
        params, ke, mask, en, ae0, state, max_selections=S)
    assert not np.any(np.asarray(sel) == 2)


def test_select_entities_deterministic_argmax(key):
    params, ke, mask, en, ae0, state = _setup(key)
    a = models.select_entities(params, ke, mask, en, ae0, state, 4)[0]
    b = models.select_entities(params, ke, mask, en, ae0, state, 4)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_select_entities_ragged_entity_num(key):
    """entity_num[b] < M: padding entities never selected; choosing the
    per-row sentinel column terminates the row."""
    B, M, S = 3, 6, 6
    params, ke, mask, _, ae0, state = _setup(key, B=B, M=M)
    en = jnp.array([3, 6, 4], jnp.int32)  # rows 0 and 2 are ragged
    sel, logits, _, _ = models.select_entities(
        params, ke, mask, en, ae0, state, max_selections=S)
    sel = np.asarray(sel)
    for b, n in enumerate([3, 6, 4]):
        ended = False
        for s in sel[:, b]:
            if ended:
                assert s == n            # after end: sentinel forever
            elif s == n:
                ended = True
            else:
                assert s < n             # only real entities selectable
        # row must end (either by sentinel or run out of entities)
        picked = [s for s in sel[:, b] if s != n]
        assert len(picked) <= n


def test_select_entities_sampled(key):
    params, ke, mask, en, ae0, state = _setup(key)
    k1 = jax.random.split(key)[0]
    sel, _, _, _ = models.select_entities(params, ke, mask, en, ae0, state, 4, rng=k1)
    assert sel.shape == (4, 3)


def test_actor_step(key):
    cfg = models.ActorCriticConfig(obs_dim=12, hidden_size=16, num_layers=2,
                                   action_dim=7)
    B = 4
    params = models.init_actor_critic(key, cfg)
    obs = jax.random.normal(key, (B, cfg.obs_dim))
    # distinct buffers: actor_step donates the state, and XLA rejects the
    # same buffer donated twice
    state = (jnp.zeros((cfg.num_layers, B, cfg.hidden_size)),
             jnp.zeros((cfg.num_layers, B, cfg.hidden_size)))
    action, logits, value, new_state = models.actor_step(
        params, obs, state, jax.random.split(key)[1])
    assert action.shape == (B,) and logits.shape == (B, cfg.action_dim)
    assert value.shape == (B,)
    assert int(action.max()) < cfg.action_dim
    # state advanced
    assert not np.allclose(np.asarray(new_state[0]), 0.0)
