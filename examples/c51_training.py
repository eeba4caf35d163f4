"""End-to-end distributional DQN (C51) training example on synthetic
transitions.

Exercises the off-policy/value half of the op library the way DI-engine's
C51 pipeline drives the reference (hpc_rll/rl_utils/td.py DistNStepTD):
a Q-network emitting per-action atom distributions, a frozen target network,
n-step rewards, and the fused scatter-free categorical projection + cross-
entropy from `ops.dist_nstep_td_error` (with per-sample importance weights
and td_error output for prioritized replay).  Run:

    python examples/c51_training.py
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from di_hpc_tpu import ops, origin


class QParams(NamedTuple):
    w1: jax.Array
    b1: jax.Array
    w2: jax.Array
    b2: jax.Array


def init_params(key, obs_dim: int, hidden: int, actions: int,
                n_atom: int) -> QParams:
    ks = jax.random.split(key, 2)
    scale = lambda fan_in: 1.0 / jnp.sqrt(fan_in)
    return QParams(
        w1=jax.random.normal(ks[0], (obs_dim, hidden)) * scale(obs_dim),
        b1=jnp.zeros((hidden,)),
        w2=jax.random.normal(ks[1], (hidden, actions * n_atom)) * scale(hidden),
        b2=jnp.zeros((actions * n_atom,)),
    )


def q_dist(params: QParams, obs: jax.Array, actions: int, n_atom: int):
    """obs (B, obs_dim) -> per-action atom distribution (B, N, n_atom)."""
    h = jnp.tanh(obs @ params.w1 + params.b1)
    logits = (h @ params.w2 + params.b2).reshape(-1, actions, n_atom)
    return jax.nn.softmax(logits, axis=-1)


def main(steps: int = 30, B: int = 128, obs_dim: int = 32, hidden: int = 64,
         actions: int = 8, n_atom: int = 51, nstep: int = 3,
         v_min: float = -10.0, v_max: float = 10.0,
         target_update_every: int = 10):
    key = jax.random.PRNGKey(0)
    params = init_params(key, obs_dim, hidden, actions, n_atom)
    target_params = params
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    support = jnp.linspace(v_min, v_max, n_atom)

    @jax.jit
    def train_step(params, target_params, opt_state, key):
        ks = jax.random.split(key, 5)
        obs = jax.random.normal(ks[0], (B, obs_dim))
        next_obs = obs + jax.random.normal(ks[1], (B, obs_dim)) * 0.3
        act = jax.random.randint(ks[2], (B,), 0, actions)
        reward = jax.random.normal(ks[3], (nstep, B)) * 0.1
        done = jax.random.uniform(ks[4], (B,)) > 0.95
        # Prioritized-replay importance weights (uniform here).
        weight = jnp.ones((B,))

        next_dist = q_dist(target_params, next_obs, actions, n_atom)
        next_q = jnp.einsum("bna,a->bn", next_dist, support)
        next_act = jnp.argmax(next_q, axis=-1)                   # (B,)

        def loss_fn(p):
            dist = q_dist(p, obs, actions, n_atom)
            loss, td_err = ops.dist_nstep_td_error(
                origin.dist_nstep_td_data(dist, next_dist, act, next_act,
                                          reward, done, weight),
                gamma=0.99, v_min=v_min, v_max=v_max, n_atom=n_atom,
                nstep=nstep)
            return loss, td_err

        (loss, td_err), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, td_err

    for i in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss, td_err = train_step(
            params, target_params, opt_state, sub)
        if (i + 1) % target_update_every == 0:
            target_params = params
        if i % 5 == 0 or i == steps - 1:
            print(f"step {i:3d}  loss={float(loss):.4f}  "
                  f"mean|td|={float(jnp.mean(jnp.abs(td_err))):.4f}")
    return params


if __name__ == "__main__":
    main()
