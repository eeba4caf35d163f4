"""Single-HBM-pass Pallas kernel for first-order linear recurrences.

Computes y_t = a_t + b_t * y_{t+1} (reverse) or y_t = a_t + b_t * y_{t-1}
(forward) over (T, B) f32 arrays.

Why a kernel: `jax.lax.associative_scan` lowers to O(log T) full passes over
HBM.  This kernel tiles B over the lane dimension, keeps each (T, BLK_B) tile
resident in VMEM, and runs the log-depth affine-composition doubling entirely
on-chip — inputs are read from HBM once and outputs written once, making the
op HBM-bandwidth-bound at speed of light (the same single-pass property the
reference gets from its fused per-lane CUDA loop,
include/hpc/rll/cuda/rl_utils/gae_kernel.h:17-27 — but log-depth and
vectorized over T instead of sequential).

The doubling recurrence (suffix composition of affine maps f_t(y)=a_t+b_t*y):
    b'[t] = b[t] * b[t+k],  a'[t] = a[t] + b[t] * a[t+k]   (identity past T)
doubling k until k >= T.  All shifts are static-offset sublane moves in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# (T, BLK_B) f32 tiles; 3 live buffers (a, b, out) -> 3*T*BLK*4 bytes of VMEM.
_DEF_BLK = 256
_VMEM_BUDGET = 10 * 1024 * 1024

# Test hook: run kernels through the Pallas interpreter (set before first
# call; the jit cache is keyed per-process).
INTERPRET = False


def _pick_blk(T: int, B: int) -> int:
    blk = _DEF_BLK
    while blk > 128 and 3 * T * blk * 4 > _VMEM_BUDGET:
        blk //= 2
    return max(blk, 128)


def _flat_compose(aa, bb, T: int, reverse: bool):
    blk = aa.shape[1]
    bw = bb.shape[1]                  # blk, or 1 for row-constant b
    k = 1
    while k < T:
        if reverse:
            # partner row t+k; identity (a=0, b=1) past the end.
            a_sh = jnp.concatenate(
                [aa[k:], jnp.zeros((k, blk), aa.dtype)], axis=0)
            b_sh = jnp.concatenate(
                [bb[k:], jnp.ones((k, bw), bb.dtype)], axis=0)
        else:
            # partner row t-k; identity before the start.
            a_sh = jnp.concatenate(
                [jnp.zeros((k, blk), aa.dtype), aa[:-k]], axis=0)
            b_sh = jnp.concatenate(
                [jnp.ones((k, bw), bb.dtype), bb[:-k]], axis=0)
        aa = aa + bb * a_sh
        bb = bb * b_sh
        k *= 2
    return aa


_CHUNK_L = 64


def _compose(aa, bb, T: int, reverse: bool):
    """Two-level chunked composition when T splits into 64-row chunks
    (flat doubling otherwise) — the shared implementation for this generic
    kernel AND rl_scans' fused kernels.  Chunking cuts the dominant shift
    traffic from log2(T) to log2(64) passes — measured 105.5 vs 131.9us on
    this scan inside the vtrace kernel at T=1024, B=4096
    (bench_results/profile_chunked_scan_r4.py).  ``bb`` may be (T, blk) or
    (T, 1) (row-constant coefficients — measured neutral there,
    negative_results.json rowconst_chunked_scan_r4, but supported so the
    profile scripts can A/B it)."""
    L = _CHUNK_L
    blk = aa.shape[1]
    if T % L or T <= L:
        return _flat_compose(aa, bb, T, reverse)
    C = T // L
    a = aa.reshape(C, L, blk)
    bw = bb.shape[1]                  # blk, or 1 for row-constant b
    b = bb.reshape(C, L, bw)
    k = 1
    while k < L:
        if reverse:
            a_sh = jnp.concatenate(
                [a[:, k:], jnp.zeros((C, k, blk), a.dtype)], axis=1)
            b_sh = jnp.concatenate(
                [b[:, k:], jnp.ones((C, k, bw), b.dtype)], axis=1)
        else:
            a_sh = jnp.concatenate(
                [jnp.zeros((C, k, blk), a.dtype), a[:, :-k]], axis=1)
            b_sh = jnp.concatenate(
                [jnp.ones((C, k, bw), b.dtype), b[:, :-k]], axis=1)
        a = a + b * a_sh
        b = b * b_sh
        k *= 2
    # Whole-chunk composites live at the chunk's entry row (0 for reverse,
    # L-1 for forward); the cross-chunk scan of C tiny rows gives each
    # chunk its carry-in, applied with the in-chunk partial products.
    carry = jnp.zeros((1, blk), aa.dtype)
    carries = [carry]
    if reverse:
        A, Bc = a[:, 0], b[:, 0]
        for c in range(C - 1, 0, -1):
            carry = A[c][None] + Bc[c][None] * carry
            carries.append(carry)
        carry_in = jnp.concatenate(carries[::-1], axis=0)
    else:
        A, Bc = a[:, -1], b[:, -1]
        for c in range(C - 1):
            carry = A[c][None] + Bc[c][None] * carry
            carries.append(carry)
        carry_in = jnp.concatenate(carries, axis=0)
    return (a + b * carry_in[:, None, :]).reshape(T, blk)


def _scan_kernel(a_ref, b_ref, out_ref, *, T: int, reverse: bool):
    out_ref[:] = _compose(a_ref[:], b_ref[:], T, reverse)


@functools.partial(jax.jit, static_argnames=("reverse",))
def _linear_scan_pallas(a: jax.Array, b: jax.Array, reverse: bool) -> jax.Array:
    T, B = a.shape
    blk = _pick_blk(T, B)
    grid = (pl.cdiv(B, blk),)
    kernel = functools.partial(_scan_kernel, T=T, reverse=reverse)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, B), a.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * T * B * max(1, (T - 1)).bit_length(),
            bytes_accessed=3 * T * B * 4,
            transcendentals=0,
        ),
        interpret=INTERPRET,
    )(a, b)


def linear_scan_reverse_pallas(a: jax.Array, b: jax.Array,
                               y_last: jax.Array | float = 0.0) -> jax.Array:
    """y_t = a_t + b_t * y_{t+1}, t = T-1..0, for (T, B) f32 arrays."""
    assert a.ndim == 2, a.shape
    if not (isinstance(y_last, (int, float)) and y_last == 0.0):
        last = a[-1] + b[-1] * jnp.asarray(y_last, a.dtype)
        a = jnp.concatenate([a[:-1], last[None]], axis=0)
    return _linear_scan_pallas(a, b, reverse=True)


def linear_scan_forward_pallas(a: jax.Array, b: jax.Array,
                               y_first: jax.Array | float = 0.0) -> jax.Array:
    """y_t = a_t + b_t * y_{t-1}, t = 0..T-1, for (T, B) f32 arrays."""
    assert a.ndim == 2, a.shape
    if not (isinstance(y_first, (int, float)) and y_first == 0.0):
        first = a[0] + b[0] * jnp.asarray(y_first, a.dtype)
        a = jnp.concatenate([first[None], a[1:]], axis=0)
    return _linear_scan_pallas(a, b, reverse=False)
