"""First-order linear recurrence machinery — the compute core of the framework.

Every reverse-time recurrence in the reference library is an instance of

    y_t = a_t + b_t * y_{t+1},        t = T-1 .. 0,   y_T given (usually 0)

 - GAE:        gae_t   = denom_t*delta_t + (gamma*lambda)*gae_{t+1}
               (reference kernel: include/hpc/rll/cuda/rl_utils/gae_kernel.h:14-27)
 - TD(lambda): ret_t   = [r_t + (g_t-d_t)V_{t+1}] + d_t*ret_{t+1}, d=g*l
               (reference: hpc_rll/origin/td.py:235-244)
 - V-trace:    item_t  = delta_t + (gamma*lambda*c_t)*item_{t+1}
               (reference: include/hpc/rll/cuda/rl_utils/vtrace_kernel.h:161-180)
 - UPGO:       lambda-return with data-dependent binary lambdas
               (reference: hpc_rll/origin/upgo.py:34-38)

The reference parallelizes over B and runs one CUDA thread sequentially over T
per batch lane.  On TPU we instead reformulate as an *associative scan*: the
affine maps f_t(y) = a_t + b_t*y compose associatively,

    (f @ g)(y) = (a_f + b_f * a_g) + (b_f * b_g) * y,

so `jax.lax.associative_scan` evaluates all suffix compositions in O(log T)
depth, fully vectorized over T and B on the VPU.  A fused single-HBM-pass
Pallas kernel backend lives in `di_hpc_tpu.pallas_kernels.linear_scan` and is
used automatically for f32 (T, B) problems on TPU.

None of the four consuming ops differentiates *through* the recurrence (the
reference computes all returns/advantages under torch.no_grad — e.g.
hpc_rll/origin/td.py:171, origin/vtrace.py:64, origin/upgo.py:64), so these
functions are typically wrapped in stop_gradient by callers; they are still
fully differentiable via JAX autodiff when needed.
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp

Method = Literal["auto", "associative", "scan", "pallas"]


def _affine_compose(left, right):
    """Sequence-order composition of affine maps f(y) = a + b*y.

    For a prefix scan over maps applied in sequence order (left block feeds
    into right block), the composite is f_right(f_left(y)):
        b = b_r * b_l,   a = a_r + b_r * a_l.
    `jax.lax.associative_scan(reverse=True)` flips the sequence internally and
    applies the same combine, so this one function serves both the forward
    recurrence y_t = a_t + b_t*y_{t-1} and the reverse one
    y_t = a_t + b_t*y_{t+1}.
    """
    b_l, a_l = left
    b_r, a_r = right
    return b_l * b_r, a_r + b_r * a_l


def linear_recurrence_reverse(
    a: jax.Array,
    b: jax.Array,
    y_last: jax.Array | float = 0.0,
    method: Method = "auto",
) -> jax.Array:
    """Solve y_t = a_t + b_t * y_{t+1} backwards in time.

    Args:
      a: (T, ...) additive terms.
      b: coefficients, broadcastable to ``a`` ((T, ...), (T,) + trailing 1s,
         or scalar).
      y_last: terminal condition y_T (scalar or broadcastable to a[0]).
      method: "associative" (XLA log-depth scan), "scan" (naive sequential
         lax.scan — the baseline the fused paths are benchmarked against),
         "pallas" (fused VMEM-resident kernel), or "auto".

    Returns:
      (T, ...) array of y_0..y_{T-1}.
    """
    a = jnp.asarray(a)
    b = jnp.broadcast_to(jnp.asarray(b, dtype=a.dtype), a.shape)

    if method == "auto":
        method = _pick_method(a)

    if method == "pallas":
        from di_hpc_tpu.pallas_kernels.linear_scan import linear_scan_reverse_pallas

        return linear_scan_reverse_pallas(a, b, y_last)

    if method == "scan":
        def step(carry, ab):
            a_t, b_t = ab
            y = a_t + b_t * carry
            return y, y

        y0 = jnp.broadcast_to(jnp.asarray(y_last, dtype=a.dtype), a.shape[1:])
        _, ys = jax.lax.scan(step, y0, (a, b), reverse=True)
        return ys

    if method == "associative":
        # Fold the terminal condition into the last additive term so the scan
        # result is directly y_t.
        y_last_arr = jnp.asarray(y_last, dtype=a.dtype)
        if (isinstance(y_last, (int, float)) and y_last == 0.0):
            a_eff = a
        else:
            last = a[-1] + b[-1] * y_last_arr
            a_eff = jnp.concatenate([a[:-1], last[None]], axis=0)
        _, y = jax.lax.associative_scan(_affine_compose, (b, a_eff), reverse=True, axis=0)
        return y

    raise ValueError(f"unknown method: {method}")


def linear_recurrence_forward(
    a: jax.Array,
    b: jax.Array,
    y_first: jax.Array | float = 0.0,
    method: Method = "auto",
) -> jax.Array:
    """Solve y_t = a_t + b_t * y_{t-1} forwards in time (the VJP-dual of the
    reverse recurrence; also used for n-step discounted sums)."""
    a = jnp.asarray(a)
    b = jnp.broadcast_to(jnp.asarray(b, dtype=a.dtype), a.shape)

    if method == "auto":
        method = _pick_method(a)

    if method == "pallas":
        from di_hpc_tpu.pallas_kernels.linear_scan import linear_scan_forward_pallas

        return linear_scan_forward_pallas(a, b, y_first)

    if method == "scan":
        def step(carry, ab):
            a_t, b_t = ab
            y = a_t + b_t * carry
            return y, y

        y0 = jnp.broadcast_to(jnp.asarray(y_first, dtype=a.dtype), a.shape[1:])
        _, ys = jax.lax.scan(step, y0, (a, b))
        return ys

    if method == "associative":
        y_first_arr = jnp.asarray(y_first, dtype=a.dtype)
        if (isinstance(y_first, (int, float)) and y_first == 0.0):
            a_eff = a
        else:
            first = a[0] + b[0] * y_first_arr
            a_eff = jnp.concatenate([first[None], a[1:]], axis=0)
        _, y = jax.lax.associative_scan(_affine_compose, (b, a_eff), axis=0)
        return y

    raise ValueError(f"unknown method: {method}")


def _pick_method(a: jax.Array) -> Method:
    """Heuristic backend choice.

    The Pallas kernel is single-HBM-pass and wins for large f32 (T, B); the
    associative scan is shape/dtype/backend-universal.
    """
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    if (
        on_tpu
        and a.ndim == 2
        and a.dtype == jnp.float32
        and a.shape[0] >= 32
        and a.shape[1] >= 128
        # VMEM feasibility is per B-tile (>=128 lanes), not full B:
        # ~7 live (T, 128) buffers must fit under the 16MB scoped limit.
        and a.shape[0] * 128 * 4 * 7 <= 13 * 1024 * 1024
    ):
        return "pallas"
    return "associative"


@functools.partial(jax.jit, static_argnums=(0,), static_argnames=("dtype",))
def gae_denominators(T: int, lambda_: float, dtype=jnp.float32) -> jax.Array:
    """Closed form of the reference's coupled denominator recurrence.

    The reference updates `denom = 1 + lambda*denom` once per backward step
    starting from 0 (hpc_rll/origin/gae.py:31-36), so at output index t the
    denominator has been updated (T - t) times:

        denom_t = sum_{k=0}^{T-t-1} lambda^k

    Evaluated with cumulative products for numerical robustness at lambda≈1
    (a geometric closed form divides by (1-lambda)).
    """
    # powers[j] = lambda^j for j = 0..T-1, then denom_t = sum of first T-t powers.
    lam = jnp.asarray(lambda_, dtype=dtype)
    powers = jnp.concatenate(
        [jnp.ones((1,), dtype), jnp.cumprod(jnp.full((T - 1,), lam, dtype))]
    ) if T > 1 else jnp.ones((1,), dtype)
    csum = jnp.cumsum(powers)  # csum[j] = sum_{k<=j} lambda^k
    return csum[::-1]  # denom_t = csum[T-1-t]
