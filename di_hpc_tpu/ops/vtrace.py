"""Fused V-trace (TPU-native).

The reference spends five CUDA kernels on this op
(src/rl_utils/vtrace.cu:8-130); here a single jit fuses the categorical
log-prob/entropy heads, importance weights, the return recurrence (log-depth
scan via the scan core instead of the per-lane reverse loop in
vtrace_kernel.h:161-180), the advantage, and the three weighted-mean losses.
Stop-gradient boundaries replicate origin/vtrace.py:64-71: gradients reach the
target logits (policy-gradient + entropy) and the value (MSE) only.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

from di_hpc_tpu.origin.vtrace import vtrace_data, vtrace_loss
from di_hpc_tpu.ops.scan import Method, linear_recurrence_reverse

__all__ = ["vtrace_error", "vtrace_data", "vtrace_loss", "VTrace"]


@functools.partial(
    jax.jit,
    static_argnames=("gamma", "lambda_", "rho_clip_ratio", "c_clip_ratio",
                     "rho_pg_clip_ratio", "method"),
)
def vtrace_error(
    data: vtrace_data,
    gamma: float = 0.99,
    lambda_: float = 0.95,
    rho_clip_ratio: float = 1.0,
    c_clip_ratio: float = 1.0,
    rho_pg_clip_ratio: float = 1.0,
    method: Method = "auto",
) -> vtrace_loss:
    from di_hpc_tpu.ops._backend import fused_kernels_ok
    from di_hpc_tpu.ops.categorical import logp, logp_entropy
    from di_hpc_tpu.ops._validate import check_vtrace

    target_output, behaviour_output, action, value, reward, weight = data
    check_vtrace("vtrace_error", target_output, behaviour_output, action,
                 value, reward, weight)

    # Fused head: one pass over the target logits yields both the log-prob
    # (grad path) and the entropy.
    logp_target, entropy = logp_entropy(target_output, action)    # (T, B)
    logp_behaviour = jax.lax.stop_gradient(logp(behaviour_output, action))
    IS = jax.lax.stop_gradient(jnp.exp(logp_target - logp_behaviour))

    v = jax.lax.stop_gradient(value)
    from di_hpc_tpu.ops._backend import VTRACE_NBUFS
    if (weight is None
            and fused_kernels_ok(v, reward, IS, method=method,
                                 n_bufs=VTRACE_NBUFS)):
        from di_hpc_tpu.pallas_kernels.rl_scans import vtrace_losses_pallas

        # Unit-weight fast path: recurrence + clips + BOTH loss reductions
        # in one kernel — the (T, B) returns/advantage planes never touch
        # HBM (the composed r4 stage spent ~300us materializing them
        # between the head and the loss epilogue; adjudicated in
        # bench_results/profile_vtrace_compose_r5.py).  The entropy mean
        # stays outside: its producer is the head fusion, so XLA reduces it
        # without materializing the (T, B) entropy plane.
        pg_loss, value_loss = vtrace_losses_pallas(
            IS, logp_target, reward, value, gamma, lambda_,
            rho_clip_ratio, c_clip_ratio, rho_pg_clip_ratio)
        entropy_loss = jnp.mean(entropy)
        return vtrace_loss(pg_loss, value_loss, entropy_loss)
    if fused_kernels_ok(v, reward, IS, method=method, n_bufs=VTRACE_NBUFS):
        from di_hpc_tpu.pallas_kernels.rl_scans import vtrace_returns_adv_pallas

        # Weighted path: the kernel derives the three min(IS, clip) planes
        # in VMEM (5 HBM streams instead of 7) and the weighted losses run
        # outside.
        return_, adv = vtrace_returns_adv_pallas(
            IS, reward, v, gamma, lambda_,
            rho_clip_ratio, c_clip_ratio, rho_pg_clip_ratio)
    else:
        rhos = jnp.minimum(IS, rho_clip_ratio)
        cs = jnp.minimum(IS, c_clip_ratio)
        pg_rhos = jnp.minimum(IS, rho_pg_clip_ratio)
        deltas = rhos * (reward + gamma * v[1:] - v[:-1])
        items = linear_recurrence_reverse(deltas, gamma * lambda_ * cs,
                                          method=method)
        return_ = v[:-1] + items                                  # vs_t, (T, B)
        return_tp1 = jnp.concatenate([return_[1:], v[-1:]], axis=0)
        adv = pg_rhos * (reward + gamma * return_tp1 - v[:-1])

    if weight is None:
        weight = jnp.ones_like(reward)

    pg_loss = -jnp.mean(logp_target * adv * weight)
    value_loss = jnp.mean((value[:-1] - return_) ** 2 * weight)
    entropy_loss = jnp.mean(entropy * weight)
    return vtrace_loss(pg_loss, value_loss, entropy_loss)


class VTrace:
    """Shape-static wrapper mirroring hpc_rll/rl_utils/vtrace.py:45-133."""

    def __init__(self, T: int, B: int, N: int):
        self.T, self.B, self.N = T, B, N

    def __call__(self, target_output, behaviour_output, action, value, reward,
                 weight=None, gamma: float = 0.99, lambda_: float = 0.95,
                 rho_clip_ratio: float = 1.0, c_clip_ratio: float = 1.0,
                 rho_pg_clip_ratio: float = 1.0) -> vtrace_loss:
        assert target_output.shape == (self.T, self.B, self.N)
        assert value.shape == (self.T + 1, self.B)
        return vtrace_error(
            vtrace_data(target_output, behaviour_output, action, value, reward, weight),
            gamma, lambda_, rho_clip_ratio, c_clip_ratio, rho_pg_clip_ratio,
        )

    forward = __call__
