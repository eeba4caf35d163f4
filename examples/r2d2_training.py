"""End-to-end R2D2-style recurrent DQN training example.

Exercises the ops the reference accelerates for R2D2-class agents the way
DI-engine drives them (hpc_rll/rl_utils/td.py QNStepTDRescale +
torch_utils/network/rnn.py LSTM):

 - a recurrent Q-network (LN-LSTM core via `network.lstm_fused` — the
   whole-layer Pallas kernel path when H is a lane multiple on TPU);
 - STORED-STATE sequence replay with BURN-IN: each sampled sequence carries
   the LSTM state recorded at generation time; the first `burn_in` steps
   rebuild a fresh recurrent state under stop_gradient, and only the
   remaining window produces learning signal (the R2D2 recipe,
   arXiv:1810.06965);
 - double-DQN action selection and a frozen target network;
 - per-timestep n-step TD with the R2D2 value rescaling
   h(x) = sign(x)(sqrt(|x|+1)-1) + eps*x via
   `ops.q_nstep_td_error_with_rescale` (vmapped over the learning window),
   with per-sequence importance weights and per-sample td errors for
   prioritized replay.

Run: `python examples/r2d2_training.py`  (CPU or TPU)
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from di_hpc_tpu import network, ops, origin


class R2D2Params(NamedTuple):
    embed_w: jax.Array
    embed_b: jax.Array
    lstm: network.LSTMParams
    q_w: jax.Array
    q_b: jax.Array


def init_params(key, obs_dim: int, hidden: int, actions: int,
                num_layers: int = 1) -> R2D2Params:
    ks = jax.random.split(key, 3)
    scale = lambda fan_in: 1.0 / jnp.sqrt(fan_in)
    return R2D2Params(
        embed_w=jax.random.normal(ks[0], (obs_dim, hidden)) * scale(obs_dim),
        embed_b=jnp.zeros((hidden,)),
        lstm=network.init_lstm_params(ks[1], hidden, hidden, num_layers, "LN"),
        q_w=jax.random.normal(ks[2], (hidden, actions)) * scale(hidden),
        q_b=jnp.zeros((actions,)),
    )


def q_values(params: R2D2Params, obs, state):
    """obs (S, B, obs_dim), state ((L,B,H),(L,B,H)) -> (q (S, B, A), state)."""
    x = jnp.tanh(obs @ params.embed_w + params.embed_b)
    y, next_state = network.lstm_fused(params.lstm, x, state, "LN")
    return y @ params.q_w + params.q_b, next_state


def main(steps: int = 30, S: int = 20, burn_in: int = 4, B: int = 32,
         obs_dim: int = 16, hidden: int = 128, actions: int = 8,
         nstep: int = 3, num_layers: int = 1, gamma: float = 0.99,
         target_update_every: int = 10):
    assert S - burn_in - nstep >= 1
    key = jax.random.PRNGKey(0)
    params = init_params(key, obs_dim, hidden, actions, num_layers)
    target_params = params
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    W = S - burn_in - nstep          # learning-window length

    @jax.jit
    def train_step(params, target_params, opt_state, key):
        # Synthetic replay sample: obs sequences (S+1, B, obs), actions /
        # rewards / dones (S, B), plus the generation-time ("stored") LSTM
        # state for the sequence head.
        ks = jax.random.split(key, 6)
        obs = jax.random.normal(ks[0], (S + 1, B, obs_dim))
        act = jax.random.randint(ks[1], (S, B), 0, actions)
        reward = jax.random.normal(ks[2], (S, B)) * 0.1
        done = jax.random.uniform(ks[3], (S, B)) > 0.97
        stored = (jax.random.normal(ks[4], (num_layers, B, hidden)) * 0.1,
                  jax.random.normal(ks[5], (num_layers, B, hidden)) * 0.1)
        weight = jnp.ones((B,))       # prioritized-replay IS weights

        # Burn-in: rebuild the recurrent state from the stored one with the
        # CURRENT network, no gradient (the R2D2 stored-state + burn-in
        # strategy).  Both online and target nets burn in.
        _, bi_state = q_values(params, obs[:burn_in], stored)
        bi_state = jax.lax.stop_gradient(bi_state)
        _, bi_state_t = q_values(target_params, obs[:burn_in], stored)

        # Target/double-DQN quantities need q at t + nstep, so run the
        # target (and online, for action selection) nets over the full
        # remaining sequence.
        q_tgt, _ = q_values(target_params, obs[burn_in:], bi_state_t)
        q_sel, _ = q_values(params, obs[burn_in:], bi_state)
        next_act = jnp.argmax(jax.lax.stop_gradient(q_sel), axis=-1)

        def loss_fn(p):
            q, _ = q_values(p, obs[burn_in:burn_in + W], bi_state)  # (W,B,A)

            def one_step(q_t, next_q_t, a_t, na_t, r_win, d_t):
                return ops.q_nstep_td_error_with_rescale(
                    origin.q_nstep_td_data(q_t, next_q_t, a_t, na_t,
                                           r_win, d_t, weight),
                    gamma=gamma, nstep=nstep)

            # Per-window slices, all static shapes: q_t at t, target q and
            # double-DQN action at t+nstep, the (nstep, B) reward window,
            # done folded over the window (episode ends kill the bootstrap).
            r_wins = jnp.stack([reward[burn_in + t: burn_in + t + nstep]
                                for t in range(W)])           # (W, nstep, B)
            d_raw = jnp.stack([done[burn_in + t: burn_in + t + nstep]
                               for t in range(W)])            # (W, nstep, B)
            d_wins = d_raw.any(axis=1)                        # (W, B)
            # Rewards past the first intra-window terminal belong to the next
            # episode: mask them with the cumulative not-done product (the
            # origin op only takes a per-window (B,) done, which kills the
            # bootstrap but not post-terminal rewards).
            alive = jnp.cumprod(1.0 - d_raw.astype(r_wins.dtype), axis=1)
            alive = jnp.concatenate(
                [jnp.ones_like(alive[:, :1]), alive[:, :-1]], axis=1)
            r_wins = r_wins * alive
            losses, td = jax.vmap(one_step)(
                q, q_tgt[nstep:nstep + W], act[burn_in:burn_in + W],
                next_act[nstep:nstep + W], r_wins, d_wins)
            return jnp.mean(losses), td

        (loss, td), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        # Replay priorities from the per-sample td errors (the op returns
        # the per-sample criterion output, matching origin semantics —
        # reference origin/td.py:290); R2D2 mixes max and mean over the
        # sequence window.
        per_seq = jnp.abs(td)                          # (W, B)
        priorities = 0.9 * jnp.max(per_seq, axis=0) + 0.1 * jnp.mean(per_seq, axis=0)
        return params, opt_state, loss, priorities

    for i in range(steps):
        key, sub = jax.random.split(key)
        if i % target_update_every == 0:
            target_params = params
        params, opt_state, loss, prio = train_step(
            params, target_params, opt_state, sub)
        if i % 5 == 0 or i == steps - 1:
            print(f"step {i:3d}  loss={float(loss):.4f}  "
                  f"max_priority={float(jnp.max(prio)):.4f}", flush=True)
    return params


if __name__ == "__main__":
    main()
