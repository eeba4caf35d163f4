"""TD-family loss oracles (pure jnp).

Faithful functional ports of the reference origin semantics
(hpc_rll/origin/td.py), including its quirks, which are the contract the fused
ops are tested against:

 - C51 categorical projection drops mass when the projected atom lands exactly
   on the support grid (l == u == b gives both (u-b) and (b-l) = 0; reference
   origin/td.py:115-116 — replicated, not "fixed").
 - lambda-returns are computed under stop_gradient (origin/td.py:171).
 - n-step reward reduction is sum_i gamma^i * r_i (origin/td.py:345-354).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from di_hpc_tpu.utils.constants import VALUE_RESCALE_EPS


# ---------------------------------------------------------------------------
# Value rescale (R2D2), reference origin/td.py:9-22
# ---------------------------------------------------------------------------

def value_transform(x: jax.Array, eps: float = VALUE_RESCALE_EPS) -> jax.Array:
    """h(x) = sign(x) * (sqrt(|x| + 1) - 1) + eps * x."""
    return jnp.sign(x) * (jnp.sqrt(jnp.abs(x) + 1.0) - 1.0) + eps * x


def value_inv_transform(x: jax.Array, eps: float = VALUE_RESCALE_EPS) -> jax.Array:
    """h^-1(x) = sign(x) * (((sqrt(1 + 4 eps (|x| + 1 + eps)) - 1) / (2 eps))^2 - 1)."""
    inner = (jnp.sqrt(1.0 + 4.0 * eps * (jnp.abs(x) + 1.0 + eps)) - 1.0) / (2.0 * eps)
    return jnp.sign(x) * (inner * inner - 1.0)


# ---------------------------------------------------------------------------
# n-step return, reference origin/td.py:343-354
# ---------------------------------------------------------------------------

class nstep_return_data(NamedTuple):
    reward: jax.Array      # (nstep, B)
    next_value: jax.Array  # (B,) or broadcastable
    done: jax.Array        # (B,)


def _discounted_reward_sum(reward: jax.Array, gamma: float) -> jax.Array:
    """sum_i gamma^i * reward[i] over leading axis (nstep, B) -> (B,)."""
    nstep = reward.shape[0]
    factor = gamma ** jnp.arange(nstep, dtype=reward.dtype)
    return jnp.tensordot(factor, reward, axes=1)


def nstep_return(data: nstep_return_data, gamma: float, nstep: int) -> jax.Array:
    reward, next_value, done = data
    assert reward.shape[0] == nstep
    r = _discounted_reward_sum(reward, gamma)
    return r + (gamma ** nstep) * next_value * (1.0 - done.astype(r.dtype))


# ---------------------------------------------------------------------------
# TD(lambda), reference origin/td.py:146-244
# ---------------------------------------------------------------------------

class td_lambda_data(NamedTuple):
    value: jax.Array    # (T+1, B)
    reward: jax.Array   # (T, B)
    weight: Optional[jax.Array]  # (B,) or None


def multistep_forward_view(
    bootstrap_values: jax.Array,  # (T, B): values at steps 1..T
    rewards: jax.Array,           # (T, B)
    gammas: jax.Array,            # (T, B)
    lambda_: jax.Array,           # (T, B); element T-1 ignored
) -> jax.Array:
    """Sutton & Barto (12.18):

        result[T-1] = r[T-1] + gammas[T-1] * V[T]
        result[t]   = r[t] + gammas[t] * (lambdas[t]*result[t+1]
                                          + (1-lambdas[t]) * V[t+1])
    """
    gammas = jnp.broadcast_to(jnp.asarray(gammas, rewards.dtype), rewards.shape)
    lambda_ = jnp.broadcast_to(jnp.asarray(lambda_, rewards.dtype), rewards.shape)
    discounts = gammas * lambda_

    def step(carry, x):
        r_t, g_t, d_t, v_tp1, is_last = x
        y = jnp.where(
            is_last,
            r_t + g_t * v_tp1,
            r_t + d_t * carry + (g_t - d_t) * v_tp1,
        )
        return y, y

    T = rewards.shape[0]
    is_last = jnp.zeros((T,), bool).at[T - 1].set(True)
    _, result = jax.lax.scan(
        step,
        jnp.zeros_like(rewards[0]),
        (rewards, gammas, discounts, bootstrap_values, is_last),
        reverse=True,
    )
    return result


def generalized_lambda_returns(
    bootstrap_values: jax.Array,  # (T+1, B)
    rewards: jax.Array,           # (T, B)
    gammas,                       # float or (T, B)
    lambda_,                      # float or (T, B)
) -> jax.Array:
    gammas = jnp.broadcast_to(jnp.asarray(gammas, rewards.dtype), rewards.shape)
    lambda_ = jnp.broadcast_to(jnp.asarray(lambda_, rewards.dtype), rewards.shape)
    return multistep_forward_view(bootstrap_values[1:], rewards, gammas, lambda_)


def td_lambda_error(data: td_lambda_data, gamma: float = 0.9, lambda_: float = 0.8) -> jax.Array:
    """0.5 * mean(weight * (lambda_return - V[:-1])^2); returns are
    stop-gradient (reference computes them under torch.no_grad,
    origin/td.py:171-175)."""
    value, reward, weight = data
    if weight is None:
        weight = jnp.ones_like(reward)
    return_ = jax.lax.stop_gradient(
        generalized_lambda_returns(value, reward, gamma, lambda_)
    )
    loss = 0.5 * jnp.mean((return_ - value[:-1]) ** 2 * weight)
    return loss


# ---------------------------------------------------------------------------
# Q n-step TD, reference origin/td.py:247-340
# ---------------------------------------------------------------------------

class q_nstep_td_data(NamedTuple):
    q: jax.Array              # (B, N)
    next_n_q: jax.Array       # (B, N)
    action: jax.Array         # (B,)
    next_n_action: jax.Array  # (B,)
    reward: jax.Array         # (nstep, B)
    done: jax.Array           # (B,)
    weight: Optional[jax.Array]


def _mse(pred, target):
    return (pred - target) ** 2


def q_nstep_td_error(data: q_nstep_td_data, gamma: float, nstep: int = 1,
                     criterion=_mse):
    """criterion(pred, target) -> per-sample loss; defaults to squared error
    (the reference's MSELoss(reduction='none'), origin/td.py:256)."""
    q, next_n_q, action, next_n_action, reward, done, weight = data
    B = q.shape[0]
    if weight is None:
        weight = jnp.ones((B,), q.dtype)
    q_s_a = jnp.take_along_axis(q, action[:, None], axis=1)[:, 0]
    target_q_s_a = jnp.take_along_axis(next_n_q, next_n_action[:, None], axis=1)[:, 0]
    target = nstep_return(nstep_return_data(reward, target_q_s_a, done), gamma, nstep)
    td_error_per_sample = criterion(q_s_a, jax.lax.stop_gradient(target))
    return jnp.mean(td_error_per_sample * weight), td_error_per_sample


def q_nstep_td_error_with_rescale(
    data: q_nstep_td_data,
    gamma: float,
    nstep: int = 1,
    criterion=_mse,
    trans_fn=value_transform,
    inv_trans_fn=value_inv_transform,
):
    q, next_n_q, action, next_n_action, reward, done, weight = data
    B = q.shape[0]
    if weight is None:
        weight = jnp.ones((B,), q.dtype)
    q_s_a = jnp.take_along_axis(q, action[:, None], axis=1)[:, 0]
    target_q_s_a = jnp.take_along_axis(next_n_q, next_n_action[:, None], axis=1)[:, 0]
    target_q_s_a = inv_trans_fn(target_q_s_a)
    target = nstep_return(nstep_return_data(reward, target_q_s_a, done), gamma, nstep)
    target = trans_fn(target)
    td_error_per_sample = criterion(q_s_a, jax.lax.stop_gradient(target))
    return jnp.mean(td_error_per_sample * weight), td_error_per_sample


# ---------------------------------------------------------------------------
# Distributional (C51) n-step TD, reference origin/td.py:25-143
# ---------------------------------------------------------------------------

class dist_nstep_td_data(NamedTuple):
    dist: jax.Array        # (B, N, n_atom)
    next_n_dist: jax.Array # (B, N, n_atom)
    act: jax.Array         # (B,)
    next_n_act: jax.Array  # (B,)
    reward: jax.Array      # (nstep, B)
    done: jax.Array        # (B,)
    weight: Optional[jax.Array]


def dist_nstep_td_error(
    data: dist_nstep_td_data,
    gamma: float,
    v_min: float,
    v_max: float,
    n_atom: int,
    nstep: int = 1,
):
    dist, next_n_dist, act, next_n_act, reward, done, weight = data
    B = act.shape[0]
    r = _discounted_reward_sum(reward, gamma)[:, None]       # (B, 1)
    done_f = done.astype(dist.dtype)[:, None]                # (B, 1)
    support = jnp.linspace(v_min, v_max, n_atom, dtype=dist.dtype)
    delta_z = (v_max - v_min) / (n_atom - 1)
    if weight is None:
        weight = jnp.ones_like(r)
    weight = jnp.asarray(weight)
    if weight.ndim == 1:
        weight = weight[:, None]

    next_dist = jax.lax.stop_gradient(
        jnp.take_along_axis(next_n_dist, next_n_act[:, None, None], axis=1)[:, 0]
    )  # (B, n_atom)

    target_z = r + (1.0 - done_f) * (gamma ** nstep) * support  # (B, n_atom)
    target_z = jnp.clip(target_z, v_min, v_max)
    b = (target_z - v_min) / delta_z
    l = jnp.floor(b).astype(jnp.int32)
    u = jnp.ceil(b).astype(jnp.int32)

    # Categorical projection by scatter-add onto the support.  Deterministic on
    # TPU (segment-sum semantics) unlike the reference's atomicAdd
    # (dist_nstep_td_kernel.h:58-59).  NOTE: when b is integral, l == u and
    # both weights are zero — mass is dropped, replicating the reference.
    proj = jnp.zeros_like(next_dist)
    proj_flat = proj.reshape(-1)
    offset = (jnp.arange(B, dtype=jnp.int32) * n_atom)[:, None]
    proj_flat = proj_flat.at[(l + offset).reshape(-1)].add(
        (next_dist * (u.astype(b.dtype) - b)).reshape(-1)
    )
    proj_flat = proj_flat.at[(u + offset).reshape(-1)].add(
        (next_dist * (b - l.astype(b.dtype))).reshape(-1)
    )
    proj = proj_flat.reshape(B, n_atom)

    dist_s_a = jnp.take_along_axis(dist, act[:, None, None], axis=1)[:, 0]  # (B, n_atom)
    log_p = jnp.log(dist_s_a)
    td_error_per_sample = -jnp.sum(log_p * proj, axis=-1)
    loss = -jnp.mean(jnp.sum(log_p * proj * weight, axis=-1))
    return loss, td_error_per_sample


# ---------------------------------------------------------------------------
# QR-DQN n-step TD, reference origin/td.py:451-517
# ---------------------------------------------------------------------------

class qrdqn_nstep_td_data(NamedTuple):
    q: jax.Array              # (B, N, tau)
    next_n_q: jax.Array       # (B, N, tau)
    action: jax.Array         # (B,)
    next_n_action: jax.Array  # (B,)
    reward: jax.Array         # (nstep, B)
    done: jax.Array           # (B,)
    tau: jax.Array            # quantile values, broadcastable to (B, tau, tau)
    weight: Optional[jax.Array]


def qrdqn_nstep_td_error(
    data: qrdqn_nstep_td_data,
    gamma: float,
    nstep: int = 1,
    value_gamma: Optional[jax.Array] = None,
):
    q, next_n_q, action, next_n_action, reward, done, tau, weight = data
    B = action.shape[0]
    if weight is None:
        weight = jnp.ones((B,), q.dtype)

    q_s_a = jnp.take_along_axis(q, action[:, None, None], axis=1)[:, 0][:, :, None]        # (B, tau, 1)
    target_q_s_a = jnp.take_along_axis(next_n_q, next_n_action[:, None, None], axis=1)[:, 0][:, None, :]  # (B, 1, tau)

    r = _discounted_reward_sum(reward, gamma)[:, None, None]
    done_f = (1.0 - done.astype(q.dtype))[:, None, None]
    if value_gamma is None:
        target_q_s_a = r + (gamma ** nstep) * target_q_s_a * done_f
    else:
        target_q_s_a = r + value_gamma[:, None, None] * target_q_s_a * done_f

    diff = target_q_s_a - q_s_a                                 # (B, tau, tau)
    u = jnp.where(jnp.abs(diff) < 1.0, 0.5 * diff * diff, jnp.abs(diff) - 0.5)
    indicator = jax.lax.stop_gradient((diff <= 0.0).astype(q.dtype))
    loss_per_sample = jnp.mean(jnp.sum(u * jnp.abs(tau - indicator), axis=-1), axis=1)
    return jnp.mean(loss_per_sample * weight), loss_per_sample


# ---------------------------------------------------------------------------
# IQN n-step TD, reference origin/td.py:357-448
# ---------------------------------------------------------------------------

class iqn_nstep_td_data(NamedTuple):
    q: jax.Array                # (tau, B, N)
    next_n_q: jax.Array         # (tau', B, N)
    action: jax.Array           # (B,)
    next_n_action: jax.Array    # (B,)
    reward: jax.Array           # (nstep, B)
    done: jax.Array             # (B,)
    replay_quantiles: jax.Array # (tau, B)
    weight: Optional[jax.Array]


def iqn_nstep_td_error(
    data: iqn_nstep_td_data,
    gamma: float,
    nstep: int = 1,
    kappa: float = 1.0,
    value_gamma: Optional[jax.Array] = None,
):
    q, next_n_q, action, next_n_action, reward, done, replay_quantiles, weight = data
    tau, B, _ = q.shape
    tau_prime = next_n_q.shape[0]
    if weight is None:
        weight = jnp.ones((B,), q.dtype)

    # (B, tau, 1): Q(s, a) quantile samples.
    q_s_a = jnp.take_along_axis(q, action[None, :, None], axis=2)[:, :, 0].T[:, :, None]
    # (B, tau',): target quantile samples.
    target_q_s_a = jnp.take_along_axis(next_n_q, next_n_action[None, :, None], axis=2)[:, :, 0].T

    r = _discounted_reward_sum(reward, gamma)[:, None]
    not_done = (1.0 - done.astype(q.dtype))[:, None]
    if value_gamma is None:
        target_q_s_a = r + (gamma ** nstep) * target_q_s_a * not_done
    else:
        target_q_s_a = r + value_gamma[:, None] * target_q_s_a * not_done

    # (B, tau', tau, 1) pairwise bellman errors.
    bellman_errors = target_q_s_a[:, :, None, None] - q_s_a[:, None, :, :]
    abs_err = jnp.abs(bellman_errors)
    huber = jnp.where(abs_err <= kappa, 0.5 * bellman_errors**2, kappa * (abs_err - 0.5 * kappa))

    rq = replay_quantiles.reshape(tau, B).T[:, None, :, None]               # (B, 1, tau, 1)
    rq = jnp.broadcast_to(rq, (B, tau_prime, tau, 1))
    indicator = jax.lax.stop_gradient((bellman_errors < 0).astype(q.dtype))
    quantile_huber = jnp.abs(rq - indicator) * huber / kappa

    loss_per_sample = jnp.mean(jnp.sum(quantile_huber, axis=2), axis=1)[:, 0]  # (B,)
    return jnp.mean(loss_per_sample * weight), loss_per_sample
