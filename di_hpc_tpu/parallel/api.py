"""Batch-parallel execution of the op library over a device mesh.

Every loss in the library is a weighted mean over batch (and time) — under
GSPMD, calling the same jitted op on batch-sharded inputs already yields the
exact global mean, with XLA emitting the ICI all-reduce (this replaces the
reference's blockReduceSum + atomicAdd pattern with a deterministic
collective).  The helpers here just make the sharding explicit and reusable.

Time-sharded (sequence-parallel) variants of the recurrence ops are built on
di_hpc_tpu.parallel.dscan.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from di_hpc_tpu.ops.scan import gae_denominators
from di_hpc_tpu.parallel.dscan import linear_recurrence_reverse_sharded
from di_hpc_tpu.parallel.mesh import DATA_AXIS, TIME_AXIS, shard_batch_pytree


def data_parallel(fn: Callable, mesh: Mesh, batch_dims, axis: str = DATA_AXIS):
    """Wrap an op so its first (pytree) argument is batch-sharded over `axis`
    before the call.  `batch_dims` mirrors the data pytree (see
    shard_batch_pytree); scalar outputs come back as global reductions.

        # batch_dims mirrors the data pytree — None entries (e.g. an absent
        # weight) must be None in both:
        dp_vtrace = data_parallel(ops.vtrace_error, mesh,
                                  vtrace_data(1, 1, 1, 1, 1, None))
        losses = dp_vtrace(vtrace_data(..., weight=None), gamma=0.99)
    """

    @functools.wraps(fn)
    def wrapped(data, *args, **kwargs):
        data = shard_batch_pytree(mesh, data, batch_dims, axis)
        return fn(data, *args, **kwargs)

    return wrapped


def lambda_returns_time_sharded(
    value: jax.Array,       # (T+1, B) replicated over the time axis
    reward: jax.Array,      # (T, B) time-sharded
    mesh: Mesh,
    gamma: float,
    lambda_: float,
    time_axis: str = TIME_AXIS,
    batch_axis: str | None = None,
) -> jax.Array:
    """Sequence-parallel generalized lambda-returns (scalar gamma/lambda):
    result[t] = [r_t + (g-d)V_{t+1}] + d*result[t+1], d = g*l, with the T-1
    element cut off — runs blockwise over the time-sharded mesh axis."""
    T = reward.shape[0]
    d = gamma * lambda_
    g_eff = jnp.full((T,) + (1,) * (reward.ndim - 1), gamma - d, reward.dtype)
    g_eff = g_eff.at[-1].set(gamma)
    a = reward + g_eff * value[1:]
    b = jnp.full_like(reward, d).at[-1].set(0.0)
    return linear_recurrence_reverse_sharded(
        a, b, mesh, time_axis=time_axis, batch_axis=batch_axis)


def td_lambda_error_time_sharded(
    value: jax.Array,       # (T+1, B)
    reward: jax.Array,      # (T, B)
    weight: jax.Array | None,
    mesh: Mesh,
    gamma: float = 0.9,
    lambda_: float = 0.8,
    time_axis: str = TIME_AXIS,
    batch_axis: str | None = None,
) -> jax.Array:
    """TD(lambda) loss with the return recurrence computed sequence-parallel;
    the final mean is a global reduction XLA lowers to an ICI all-reduce."""
    if weight is None:
        weight = jnp.ones_like(reward)
    return_ = jax.lax.stop_gradient(lambda_returns_time_sharded(
        jax.lax.stop_gradient(value), reward, mesh, gamma, lambda_,
        time_axis, batch_axis))
    return 0.5 * jnp.mean((return_ - value[:-1]) ** 2 * weight)


def lstm_param_shardings(mesh: Mesh, num_layers: int,
                         model_axis: str = "model"):
    """Tensor-parallel NamedShardings for LSTMParams: the 4H gate dimension
    is sharded over `model_axis` (each device holds a slice of every gate),
    matching SURVEY.md §2.5's TP plan for the LSTM hidden dim.  LayerNorm
    over the sharded gate dim is handled by XLA (it inserts the partial-sum
    collectives for the mean/variance)."""
    from jax.sharding import NamedSharding
    from di_hpc_tpu.origin.rnn import LSTMParams

    def ns(*spec):
        return NamedSharding(mesh, P(*spec))

    return LSTMParams(
        wx=tuple(ns(None, model_axis) for _ in range(num_layers)),
        wh=tuple(ns(None, model_axis) for _ in range(num_layers)),
        bias=ns(None, model_axis),
        ln_gamma_x=ns(None, model_axis), ln_beta_x=ns(None, model_axis),
        ln_gamma_h=ns(None, model_axis), ln_beta_h=ns(None, model_axis),
    )


def vtrace_error_time_sharded(
    data,                       # ops.vtrace_data; (T, ...) fields time-sharded
    mesh: Mesh,
    gamma: float = 0.99,
    lambda_: float = 0.95,
    rho_clip_ratio: float = 1.0,
    c_clip_ratio: float = 1.0,
    rho_pg_clip_ratio: float = 1.0,
    time_axis: str = TIME_AXIS,
    batch_axis: str | None = None,
):
    """Sequence-parallel V-trace: categorical heads and elementwise terms are
    sharded over time by GSPMD; the return recurrence runs blockwise via the
    distributed scan (one small boundary all_gather); the shifted
    return_{t+1} access becomes a collective-permute at chunk edges."""
    from di_hpc_tpu.origin.ppo import categorical_entropy, categorical_log_prob
    from di_hpc_tpu.origin.vtrace import vtrace_loss

    target_output, behaviour_output, action, value, reward, weight = data

    logp_target = categorical_log_prob(target_output, action)
    logp_behaviour = jax.lax.stop_gradient(
        categorical_log_prob(behaviour_output, action))
    IS = jax.lax.stop_gradient(jnp.exp(logp_target - logp_behaviour))
    rhos = jnp.minimum(IS, rho_clip_ratio)
    cs = jnp.minimum(IS, c_clip_ratio)
    pg_rhos = jnp.minimum(IS, rho_pg_clip_ratio)

    v = jax.lax.stop_gradient(value)
    deltas = rhos * (reward + gamma * v[1:] - v[:-1])
    items = linear_recurrence_reverse_sharded(
        deltas, gamma * lambda_ * cs, mesh,
        time_axis=time_axis, batch_axis=batch_axis)
    return_ = v[:-1] + items
    return_tp1 = jnp.concatenate([return_[1:], v[-1:]], axis=0)
    adv = pg_rhos * (reward + gamma * return_tp1 - v[:-1])

    if weight is None:
        weight = jnp.ones_like(reward)
    pg_loss = -jnp.mean(logp_target * adv * weight)
    value_loss = jnp.mean((value[:-1] - return_) ** 2 * weight)
    entropy_loss = jnp.mean(categorical_entropy(target_output) * weight)
    return vtrace_loss(pg_loss, value_loss, entropy_loss)


def upgo_loss_time_sharded(
    target_output, rhos, action, rewards, bootstrap_values,
    mesh: Mesh,
    time_axis: str = TIME_AXIS,
    batch_axis: str | None = None,
):
    """Sequence-parallel UPGO: the binary-lambda return recurrence runs on
    the distributed scan; the cross-entropy head shards over time."""
    from di_hpc_tpu.origin.ppo import categorical_log_prob

    v = jax.lax.stop_gradient(bootstrap_values)
    r = jax.lax.stop_gradient(rewards)
    lambdas = ((r + v[1:]) >= v[:-1]).astype(r.dtype)
    lambdas = jnp.concatenate([lambdas[1:], jnp.ones_like(lambdas[-1:])], axis=0)
    # generalized lambda returns with gamma = 1 as a linear recurrence
    d = lambdas.at[-1].set(0.0)
    a = r + (1.0 - d) * v[1:]
    returns = linear_recurrence_reverse_sharded(
        a, d, mesh, time_axis=time_axis, batch_axis=batch_axis)
    advantages = jax.lax.stop_gradient(rhos) * (returns - v[:-1])
    metric = categorical_log_prob(target_output, action)
    return -jnp.mean(advantages * metric)


def gae_time_sharded(
    value: jax.Array,       # (T+1, B), time-sharded consistently with reward
    reward: jax.Array,      # (T, B)
    mesh: Mesh,
    gamma: float = 0.99,
    lambda_: float = 0.97,
    time_axis: str = TIME_AXIS,
    batch_axis: str | None = None,
) -> jax.Array:
    """Sequence-parallel GAE: the recurrence runs blockwise over a time-sharded
    mesh axis (di_hpc_tpu.parallel.dscan) with one tiny boundary all_gather.

    `value` has T+1 rows which do not tile evenly over the time axis; callers
    pass it replicated (or sharded on batch only) while `reward`/the output
    are time-sharded.
    """
    T = reward.shape[0]
    delta = reward + gamma * value[1:] - value[:-1]
    denom = gae_denominators(T, lambda_, dtype=delta.dtype)
    denom_b = denom.reshape((T,) + (1,) * (delta.ndim - 1))
    items = linear_recurrence_reverse_sharded(
        denom_b * delta,
        jnp.full_like(delta, gamma * lambda_),
        mesh,
        time_axis=time_axis,
        batch_axis=batch_axis,
    )
    return jax.lax.stop_gradient(items / denom_b)
