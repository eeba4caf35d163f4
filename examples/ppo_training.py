"""End-to-end PPO training example on synthetic rollouts.

Exercises the on-policy half of the op library the way DI-engine's PPO
pipeline drives the reference (hpc_rll/rl_utils/ppo.py wrapped per batch):
GAE advantages from `ops.gae`, then several epochs of the fused clipped
surrogate via the FAST PATH `ops.ppo_error_with_logp_old` — the old-policy
log-prob is computed once per collected batch (`ops.logp`) and reused across
all epochs, which the reference cannot do (its kernel recomputes the
old-logits head per call, ppo_kernel.h:114-150).  Monitor outputs
(approx_kl / clipfrac) and optax update included.  Run:

    python examples/ppo_training.py
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from di_hpc_tpu import ops, origin


class PPOParams(NamedTuple):
    w1: jax.Array
    b1: jax.Array
    policy_w: jax.Array
    policy_b: jax.Array
    value_w: jax.Array
    value_b: jax.Array


def init_params(key, obs_dim: int, hidden: int, actions: int) -> PPOParams:
    ks = jax.random.split(key, 3)
    scale = lambda fan_in: 1.0 / jnp.sqrt(fan_in)
    return PPOParams(
        w1=jax.random.normal(ks[0], (obs_dim, hidden)) * scale(obs_dim),
        b1=jnp.zeros((hidden,)),
        policy_w=jax.random.normal(ks[1], (hidden, actions)) * scale(hidden),
        policy_b=jnp.zeros((actions,)),
        value_w=jax.random.normal(ks[2], (hidden, 1)) * scale(hidden),
        value_b=jnp.zeros((1,)),
    )


def forward(params: PPOParams, obs: jax.Array):
    h = jnp.tanh(obs @ params.w1 + params.b1)
    logits = h @ params.policy_w + params.policy_b
    value = (h @ params.value_w + params.value_b)[..., 0]
    return logits, value


def synthetic_rollout(key, T: int, B: int, obs_dim: int):
    ks = jax.random.split(key, 2)
    obs = jax.random.normal(ks[0], (T + 1, B, obs_dim))
    reward = jax.random.normal(ks[1], (T, B)) * 0.1
    return obs, reward


def main(steps: int = 10, epochs: int = 4, T: int = 16, B: int = 64,
         obs_dim: int = 32, hidden: int = 64, actions: int = 8):
    key = jax.random.PRNGKey(0)
    params = init_params(key, obs_dim, hidden, actions)
    optimizer = optax.adam(3e-4)
    opt_state = optimizer.init(params)

    @jax.jit
    def collect(params, key):
        """Roll the behaviour policy over synthetic observations and compute
        GAE advantages (ops.gae = the reference's denominator-normalized
        variant, hpc_rll/origin/gae.py:27-37)."""
        k_env, k_act = jax.random.split(key)
        obs, reward = synthetic_rollout(k_env, T, B, obs_dim)
        logits, value = forward(params, obs)                     # (T+1, B, .)
        action = jax.random.categorical(k_act, logits[:T])       # (T, B)
        adv = ops.gae(origin.gae_data(value, reward), gamma=0.99, lambda_=0.95)
        return_ = adv + value[:T]
        # Old-policy log-prob once per batch: every epoch below reuses it
        # through the ppo fast path instead of re-running the old-logits head.
        logp_old = ops.logp(logits[:T], action)
        return dict(obs=obs[:T], action=action, logp_old=logp_old,
                    value_old=value[:T], adv=adv, return_=return_)

    @jax.jit
    def update(params, opt_state, batch):
        flat = lambda x: x.reshape((-1,) + x.shape[2:])          # (T*B, ...)

        def loss_fn(p):
            logits, value = forward(p, batch["obs"])
            data = ops.ppo_fast_data(
                flat(logits), flat(batch["logp_old"]), flat(batch["action"]),
                flat(value), flat(batch["value_old"]), flat(batch["adv"]),
                flat(batch["return_"]), None)
            (pol, vl, ent), (kl, frac) = ops.ppo_error_with_logp_old(
                data, clip_ratio=0.2, use_value_clip=True, dual_clip=None)
            total = pol + 0.5 * vl - 0.01 * ent
            return total, dict(policy=pol, value=vl, entropy=ent,
                               approx_kl=kl, clipfrac=frac)

        (total, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, total, m

    for i in range(steps):
        key, sub = jax.random.split(key)
        batch = collect(params, sub)
        for _ in range(epochs):
            params, opt_state, total, m = update(params, opt_state, batch)
        if i % 2 == 0 or i == steps - 1:
            print(f"iter {i:3d}  total={float(total):+.4f}  "
                  f"policy={float(m['policy']):+.4f}  "
                  f"value={float(m['value']):.4f}  "
                  f"kl={float(m['approx_kl']):+.5f}  "
                  f"clipfrac={float(m['clipfrac']):.3f}")
    return params


if __name__ == "__main__":
    main()
