"""AlphaStar-style policy training example: the model family DI-hpc was
built for, end to end.

Composes, in one jitted train step, every AlphaStar-facing component of the
framework the way DI-engine composes the reference's ops:

 - entity encoder -> `network.scatter_connection` ('add' mode, the one-hot
   MXU formulation) builds the spatial map from per-entity embeddings
   (reference src/torch_utils/network/scatter_connection.cu);
 - LN-LSTM core over the trajectory (`network.lstm_fused`, whole-layer
   Pallas kernel path on TPU);
 - action-type head trained with fused V-trace (`ops.vtrace_error`) AND
   UPGO (`ops.upgo_loss`) — AlphaStar's pairing (arXiv:1912.06721);
 - autoregressive selected-units head (`models.select_entities`, built from
   the three hpc_models helpers update_ae / lstm_activation / pre_sample,
   reference src/models/actor_critic.cu) trained with a REINFORCE term on
   its per-step selection log-probs.

Run: `python examples/alphastar_policy_training.py`  (CPU or TPU)
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from di_hpc_tpu import network, ops, origin
from di_hpc_tpu.models import (
    EntitySelectionParams, init_entity_selection, select_entities,
)
from di_hpc_tpu.ops.categorical import logp


class Params(NamedTuple):
    ent_w: jax.Array       # (De, N) entity encoder
    ent_b: jax.Array
    spatial_w: jax.Array   # (N*H*W, F) spatial summary
    core: network.LSTMParams
    act_w: jax.Array       # (Hc, A) action-type head
    val_w: jax.Array       # (Hc,)
    ae_w: jax.Array        # (Hc, N) core output -> initial autoregressive emb
    sel: EntitySelectionParams


def init_params(key, De, N, H, W, F, Hc, A, Hs) -> Params:
    ks = jax.random.split(key, 7)
    s = lambda fan: 1.0 / jnp.sqrt(fan)
    return Params(
        ent_w=jax.random.normal(ks[0], (De, N)) * s(De),
        ent_b=jnp.zeros((N,)),
        spatial_w=jax.random.normal(ks[1], (N * H * W, F)) * s(N * H * W),
        core=network.init_lstm_params(ks[2], N + F, Hc, 1, "LN"),
        act_w=jax.random.normal(ks[3], (Hc, A)) * s(Hc),
        val_w=jax.random.normal(ks[4], (Hc,)) * s(Hc),
        ae_w=jax.random.normal(ks[5], (Hc, N)) * s(Hc),
        sel=init_entity_selection(ks[6], input_dim=N, hidden=Hs, key_dim=N),
    )


def main(steps: int = 20, T: int = 16, B: int = 8, M: int = 32, De: int = 16,
         N: int = 32, H: int = 8, W: int = 8, F: int = 64, Hc: int = 128,
         A: int = 8, Hs: int = 64, max_selections: int = 6):
    key = jax.random.PRNGKey(0)
    params = init_params(key, De, N, H, W, F, Hc, A, Hs)
    optimizer = optax.adam(3e-4)
    opt_state = optimizer.init(params)

    @jax.jit
    def train_step(params, opt_state, key):
        ks = jax.random.split(key, 8)
        # Synthetic trajectory batch (what an actor/replay would supply).
        ent_feats = jax.random.normal(ks[0], (T + 1, B, M, De))
        locations = jnp.stack(
            [jax.random.randint(ks[1], (T + 1, B, M), 0, H),
             jax.random.randint(ks[2], (T + 1, B, M), 0, W)], axis=-1)
        actions = jax.random.randint(ks[3], (T, B), 0, A)
        behaviour_logits = jax.random.normal(ks[4], (T, B, A))
        rewards = jax.random.normal(ks[5], (T, B)) * 0.1
        entity_num = jax.random.randint(ks[6], (B,), M // 2, M + 1)

        def loss_fn(p):
            # Entity embeddings, then the spatial map by scattering each
            # entity's embedding at its (y, x): fold T+1 into the batch dim
            # for one big scatter (static shapes, MXU one-hot path).
            emb = jnp.tanh(ent_feats @ p.ent_w + p.ent_b)   # (T+1,B,M,N)
            spatial = network.scatter_connection(
                emb.reshape((T + 1) * B, M, N), (H, W),
                locations.reshape((T + 1) * B, M, 2), "add")
            spatial = spatial.reshape(T + 1, B, N * H * W) @ p.spatial_w
            core_in = jnp.concatenate(
                [jnp.mean(emb, axis=2), jnp.tanh(spatial)], axis=-1)

            y, _ = network.lstm_fused(p.core, core_in, None, "LN")
            value = y @ p.val_w                              # (T+1, B)
            logits = y[:-1] @ p.act_w                        # (T, B, A)

            # Action-type losses: V-trace PG + value + entropy, plus UPGO
            # (clipped importance weights shared between the two).
            vt = ops.vtrace_error(origin.vtrace_data(
                logits, behaviour_logits, actions, value, rewards, None))
            logp_b = jax.lax.stop_gradient(logp(behaviour_logits, actions))
            rhos = jnp.minimum(
                jnp.exp(jax.lax.stop_gradient(logp(logits, actions)) - logp_b),
                1.0)
            upgo = ops.upgo_loss(logits, rhos, actions, rewards, value)

            # Selected-units head on the final core state: sample an
            # autoregressive selection sequence, REINFORCE its log-probs
            # against the trajectory return (toy advantage).
            ae0 = jnp.tanh(y[-1] @ p.ae_w)                   # (B, N)
            keys_sel = emb[-1]                               # (B, M, N)
            sel_state = (jnp.zeros((B, Hs)), jnp.zeros((B, Hs)))
            selected, sel_logits, _, _ = select_entities(
                p.sel, keys_sel, jnp.ones((B, M), bool), entity_num,
                ae0, sel_state, max_selections, rng=ks[7])
            # Steps after a row's first 'end' are forced repeats of the
            # sentinel — no learning signal there.
            is_end = selected == entity_num[None, :]
            after_end = (jnp.cumsum(is_end.astype(jnp.int32), axis=0)
                         - is_end) > 0
            sel_logp = jnp.where(after_end, 0.0,
                                 logp(sel_logits, selected))  # (S, B)
            adv = jax.lax.stop_gradient(jnp.sum(rewards, 0) - value[0])
            sel_loss = -jnp.mean(adv * jnp.sum(sel_logp, axis=0))

            total = (vt.policy_loss + 0.5 * vt.value_loss
                     - 0.01 * vt.entropy_loss + 0.2 * upgo + 0.1 * sel_loss)
            return total, (vt, upgo, sel_loss)

        (total, (vt, upgo, sel_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, (
            total, vt.policy_loss, vt.value_loss, upgo, sel_loss)

    for i in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, (total, pg, vl, upgo, sel) = train_step(
            params, opt_state, sub)
        if i % 5 == 0 or i == steps - 1:
            print(f"step {i:3d}  total={float(total):+.4f}  pg={float(pg):+.4f}"
                  f"  value={float(vl):.4f}  upgo={float(upgo):+.4f}"
                  f"  select={float(sel):+.4f}", flush=True)
    return params


if __name__ == "__main__":
    main()
