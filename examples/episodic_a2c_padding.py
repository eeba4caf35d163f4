"""Episodic A2C with TD(lambda) and ragged-batch bucketing.

The reference accelerates ragged batching with grouped padding: episodes are
sorted by size and split into <= `group` buckets by an exact min-padded-cost
DP (oracle_split_group, reference src/rl_utils/padding.cu:44-108), so each
bucket is one dense tensor with bounded pad waste.  Under jit that design is
exactly right for TPU: one compile per BUCKET SHAPE (bounded by `group`),
dense static tensors inside.

This example drives that pipeline end to end:

 - synthetic episodes of random length;
 - `ops.oracle_split_group` buckets them (the C++ DP when built, Python
   fallback otherwise);
 - each bucket is padded dense and fed to a per-shape jitted A2C step:
   TD(lambda) value loss via `ops.td_lambda_error` with the PADDING MASK as
   the per-timestep weight (the weight resolves the reference's (T, B) /
   (B,) weight-shape inconsistency — SURVEY.md quirk — in origin's favor),
   and a policy-gradient term on mask-weighted lambda-return advantages
   (`ops.generalized_lambda_returns`).

Run: `python examples/episodic_a2c_padding.py`  (CPU or TPU)
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from di_hpc_tpu import ops
from di_hpc_tpu.ops.categorical import logp_entropy


class Params(NamedTuple):
    w1: jax.Array
    b1: jax.Array
    w_pi: jax.Array
    w_v: jax.Array


def init_params(key, obs_dim, hidden, actions) -> Params:
    ks = jax.random.split(key, 3)
    s = lambda fan: 1.0 / jnp.sqrt(fan)
    return Params(
        w1=jax.random.normal(ks[0], (obs_dim, hidden)) * s(obs_dim),
        b1=jnp.zeros((hidden,)),
        w_pi=jax.random.normal(ks[1], (hidden, actions)) * s(hidden),
        w_v=jax.random.normal(ks[2], (hidden,)) * s(hidden),
    )


def make_episodes(rng, n_eps, obs_dim, actions, l_min, l_max):
    """Variable-length synthetic episodes: (obs (L+1, D), act (L,), rew (L,))."""
    eps = []
    for _ in range(n_eps):
        L = int(rng.integers(l_min, l_max))
        eps.append((
            rng.standard_normal((L + 1, obs_dim)).astype(np.float32),
            rng.integers(0, actions, size=(L,)).astype(np.int32),
            rng.standard_normal((L,)).astype(np.float32) * 0.1,
        ))
    return eps


def pad_bucket(bucket, T, B):
    """Stack one bucket's episodes to (T[+1], B, ...) dense + (T, B) mask.
    T/B come pre-quantized (multiples of 8/4) so the per-shape jit cache
    stays small across steps; all-zero mask columns contribute nothing."""
    obs = np.zeros((T + 1, B, bucket[0][0].shape[-1]), np.float32)
    act = np.zeros((T, B), np.int32)
    rew = np.zeros((T, B), np.float32)
    mask = np.zeros((T, B), np.float32)
    for b, (o, a, r) in enumerate(bucket):
        L = len(r)
        obs[:L + 1, b] = o
        act[:L, b] = a
        rew[:L, b] = r
        mask[:L, b] = 1.0
    return map(jnp.asarray, (obs, act, rew, mask))


def main(steps: int = 10, n_eps: int = 48, obs_dim: int = 16, hidden: int = 64,
         actions: int = 6, l_min: int = 8, l_max: int = 64, group: int = 3,
         gamma: float = 0.99, lambda_: float = 0.95, seed: int = 0):
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    params = init_params(key, obs_dim, hidden, actions)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    @jax.jit   # one compile per bucket (T, B) shape — bounded by `group`
    def bucket_loss_and_grad(params, obs, act, rew, mask):
        def loss_fn(p):
            h = jnp.tanh(obs @ p.w1 + p.b1)         # (T+1, B, hidden)
            value = h @ p.w_v                       # (T+1, B)
            logits = h[:-1] @ p.w_pi                # (T, B, A)
            # Zero the value at the terminal step and the padded tail: the
            # lambda-return recursion runs over the full padded length, so
            # an unmasked V on padded (all-zero) observations would leak
            # into the return targets of real steps near each episode's end
            # — and these episodes terminate, so V(terminal) = 0 is also
            # the correct bootstrap.
            value = value * jnp.concatenate([mask, jnp.zeros_like(mask[:1])])
            # Mask-weighted TD(lambda): padded steps contribute no loss.
            v_loss = ops.td_lambda_error(
                ops.td_lambda_data(value, rew, mask), gamma, lambda_)
            returns = ops.generalized_lambda_returns(
                value, rew, gamma, lambda_)
            adv = jax.lax.stop_gradient(returns - value[:-1])
            lp, ent = logp_entropy(logits, act)
            denom = jnp.maximum(jnp.sum(mask), 1.0)
            pg = -jnp.sum(lp * adv * mask) / denom
            ent_loss = jnp.sum(ent * mask) / denom
            return pg + 0.5 * v_loss - 0.01 * ent_loss
        return jax.value_and_grad(loss_fn)(params)

    for i in range(steps):
        episodes = make_episodes(rng, n_eps, obs_dim, actions, l_min, l_max)
        # Oracle DP bucketing on episode length (C++ when built): sort, then
        # split into <= `group` buckets minimizing total padded cost.
        episodes.sort(key=lambda e: len(e[2]))
        lengths = [np.zeros((len(e[2]),), np.float32) for e in episodes]
        group_shape, group_idx = ops.oracle_split_group(lengths, group)

        total, n = 0.0, 0
        grads_acc = jax.tree.map(jnp.zeros_like, params)
        for g in range(len(group_shape)):
            bucket = episodes[group_idx[g]:group_idx[g + 1]]
            T = -(-group_shape[g][0] // 8) * 8       # quantize: bounded
            Bq = -(-len(bucket) // 4) * 4            # compile-cache size
            obs, act, rew, mask = pad_bucket(bucket, T, Bq)
            loss, grads = bucket_loss_and_grad(params, obs, act, rew, mask)
            w = len(bucket) / n_eps        # batch-weighted gradient combine
            grads_acc = jax.tree.map(lambda a, b: a + w * b, grads_acc, grads)
            total += float(loss) * w
            n += 1
        updates, opt_state = optimizer.update(grads_acc, opt_state)
        params = optax.apply_updates(params, updates)
        if i % 2 == 0 or i == steps - 1:
            sizes = [f"{group_shape[g][0]}x{group_idx[g+1]-group_idx[g]}"
                     for g in range(len(group_shape))]
            print(f"step {i:3d}  loss={total:+.4f}  buckets(TxB)={sizes}",
                  flush=True)
    return params


if __name__ == "__main__":
    main()
