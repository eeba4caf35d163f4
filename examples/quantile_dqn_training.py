"""Quantile-family distributional DQN training example: QR-DQN and IQN.

Exercises the two quantile-regression TD ops the way DI-engine drives the
reference (hpc_rll/rl_utils/td.py QRDQNNStepTDError / IQNNStepTDError):

 - **QR-DQN** (arXiv:1710.10044): a Q-network emitting a FIXED fan of tau
   quantile estimates per action, trained with the pairwise quantile-Huber
   loss from `ops.qrdqn_nstep_td_error` (fixed midpoints tau_hat);
 - **IQN** (arXiv:1806.06923): quantile levels are SAMPLED each step and
   embedded with the cosine feature map, the network is evaluated at those
   levels, and `ops.iqn_nstep_td_error` weights the Huber terms by the
   sampled `replay_quantiles` (explicit kappa).

Both share the n-step target, double-DQN selection against a frozen target
network, and per-sample IS weights / td errors for prioritized replay.

Run: `python examples/quantile_dqn_training.py`  (runs both algos)
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from di_hpc_tpu import ops, origin


class QRParams(NamedTuple):
    w1: jax.Array
    b1: jax.Array
    w2: jax.Array   # (hidden, actions * n_tau) — fixed quantile fan
    b2: jax.Array


class IQNParams(NamedTuple):
    w1: jax.Array
    b1: jax.Array
    w_cos: jax.Array  # (n_cos, hidden) cosine quantile embedding
    b_cos: jax.Array
    w2: jax.Array     # (hidden, actions)
    b2: jax.Array


def init_qr(key, obs_dim, hidden, actions, n_tau) -> QRParams:
    ks = jax.random.split(key, 2)
    s = lambda fan: 1.0 / jnp.sqrt(fan)
    return QRParams(
        w1=jax.random.normal(ks[0], (obs_dim, hidden)) * s(obs_dim),
        b1=jnp.zeros((hidden,)),
        w2=jax.random.normal(ks[1], (hidden, actions * n_tau)) * s(hidden),
        b2=jnp.zeros((actions * n_tau,)),
    )


def init_iqn(key, obs_dim, hidden, actions, n_cos) -> IQNParams:
    ks = jax.random.split(key, 3)
    s = lambda fan: 1.0 / jnp.sqrt(fan)
    return IQNParams(
        w1=jax.random.normal(ks[0], (obs_dim, hidden)) * s(obs_dim),
        b1=jnp.zeros((hidden,)),
        w_cos=jax.random.normal(ks[1], (n_cos, hidden)) * s(n_cos),
        b_cos=jnp.zeros((hidden,)),
        w2=jax.random.normal(ks[2], (hidden, actions)) * s(hidden),
        b2=jnp.zeros((actions,)),
    )


def qr_quantiles(p: QRParams, obs, actions, n_tau):
    """obs (B, obs_dim) -> quantile estimates (B, N, tau) (QR-DQN layout)."""
    h = jnp.tanh(obs @ p.w1 + p.b1)
    return (h @ p.w2 + p.b2).reshape(-1, actions, n_tau)


def iqn_quantiles(p: IQNParams, obs, levels, n_cos):
    """obs (B, obs_dim), levels (tau, B) -> values (tau, B, N) (IQN layout):
    state features modulated by the cosine embedding of each level."""
    h = jnp.tanh(obs @ p.w1 + p.b1)                       # (B, hidden)
    i = jnp.arange(1, n_cos + 1, dtype=h.dtype)
    cos_feat = jnp.cos(jnp.pi * levels[..., None] * i)    # (tau, B, n_cos)
    phi = jax.nn.relu(cos_feat @ p.w_cos + p.b_cos)       # (tau, B, hidden)
    return (h[None] * phi) @ p.w2 + p.b2                  # (tau, B, N)


def train_qrdqn(steps, B, obs_dim, hidden, actions, n_tau, nstep, gamma,
                target_update_every):
    key = jax.random.PRNGKey(0)
    params = init_qr(key, obs_dim, hidden, actions, n_tau)
    target_params = params
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    # Fixed quantile midpoints tau_hat_i = (2i+1)/(2*tau).
    tau_hat = (jnp.arange(n_tau) + 0.5) / n_tau           # (tau,)

    @jax.jit
    def step_fn(params, target_params, opt_state, key):
        ks = jax.random.split(key, 5)
        obs = jax.random.normal(ks[0], (B, obs_dim))
        next_obs = obs + 0.3 * jax.random.normal(ks[1], (B, obs_dim))
        act = jax.random.randint(ks[2], (B,), 0, actions)
        reward = 0.1 * jax.random.normal(ks[3], (nstep, B))
        done = jax.random.uniform(ks[4], (B,)) > 0.95

        next_q = qr_quantiles(target_params, next_obs, actions, n_tau)
        next_act = jnp.argmax(jnp.mean(next_q, axis=-1), axis=-1)  # (B,)

        def loss_fn(p):
            q = qr_quantiles(p, obs, actions, n_tau)
            loss, td = ops.qrdqn_nstep_td_error(
                origin.qrdqn_nstep_td_data(q, next_q, act, next_act,
                                           reward, done, tau_hat, None),
                gamma=gamma, nstep=nstep)
            return loss, td

        (loss, td), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, td

    for i in range(steps):
        key, sub = jax.random.split(key)
        if i % target_update_every == 0:
            target_params = params
        params, opt_state, loss, td = step_fn(params, target_params,
                                              opt_state, sub)
        if i % 5 == 0 or i == steps - 1:
            print(f"[qrdqn] step {i:3d}  loss={float(loss):.4f}  "
                  f"mean|td|={float(jnp.mean(jnp.abs(td))):.4f}", flush=True)
    return params


def train_iqn(steps, B, obs_dim, hidden, actions, n_tau, n_tau_prime, n_cos,
              nstep, gamma, kappa, target_update_every):
    key = jax.random.PRNGKey(1)
    params = init_iqn(key, obs_dim, hidden, actions, n_cos)
    target_params = params
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    @jax.jit
    def step_fn(params, target_params, opt_state, key):
        ks = jax.random.split(key, 7)
        obs = jax.random.normal(ks[0], (B, obs_dim))
        next_obs = obs + 0.3 * jax.random.normal(ks[1], (B, obs_dim))
        act = jax.random.randint(ks[2], (B,), 0, actions)
        reward = 0.1 * jax.random.normal(ks[3], (nstep, B))
        done = jax.random.uniform(ks[4], (B,)) > 0.95
        # Per-sample sampled quantile levels (IQN's defining feature).
        levels = jax.random.uniform(ks[5], (n_tau, B))
        levels_prime = jax.random.uniform(ks[6], (n_tau_prime, B))

        next_q = iqn_quantiles(target_params, next_obs, levels_prime, n_cos)
        next_act = jnp.argmax(jnp.mean(next_q, axis=0), axis=-1)   # (B,)

        def loss_fn(p):
            q = iqn_quantiles(p, obs, levels, n_cos)               # (tau,B,N)
            loss, td = ops.iqn_nstep_td_error(
                origin.iqn_nstep_td_data(q, next_q, act, next_act, reward,
                                         done, levels, None),
                gamma=gamma, nstep=nstep, kappa=kappa)
            return loss, td

        (loss, td), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, td

    for i in range(steps):
        key, sub = jax.random.split(key)
        if i % target_update_every == 0:
            target_params = params
        params, opt_state, loss, td = step_fn(params, target_params,
                                              opt_state, sub)
        if i % 5 == 0 or i == steps - 1:
            print(f"[iqn]   step {i:3d}  loss={float(loss):.4f}  "
                  f"mean|td|={float(jnp.mean(jnp.abs(td))):.4f}", flush=True)
    return params


def main(steps: int = 20, B: int = 64, obs_dim: int = 24, hidden: int = 64,
         actions: int = 8, n_tau: int = 32, n_tau_prime: int = 32,
         n_cos: int = 64, nstep: int = 3, gamma: float = 0.99,
         kappa: float = 1.0, target_update_every: int = 10,
         algo: str = "both"):
    out = {}
    if algo in ("both", "qrdqn"):
        out["qrdqn"] = train_qrdqn(steps, B, obs_dim, hidden, actions, n_tau,
                                   nstep, gamma, target_update_every)
    if algo in ("both", "iqn"):
        out["iqn"] = train_iqn(steps, B, obs_dim, hidden, actions, n_tau,
                               n_tau_prime, n_cos, nstep, gamma, kappa,
                               target_update_every)
    return out


if __name__ == "__main__":
    main()
