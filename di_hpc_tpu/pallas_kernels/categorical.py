"""Fused categorical head: log-prob of the taken action + entropy in ONE pass
over the logits.

This is the TPU analogue of the reference's fused categorical kernels
(ppo_kernel.h:12-150, vtrace_kernel.h:11-151): those fuse log-softmax, the
action gather, entropy, and THREE backward stash arrays into one block-reduce
kernel.  On TPU we instead read the logits once in VMEM (XLA's lowering of
log_softmax + entropy + gather takes multiple HBM passes over the logits) and
RECOMPUTE the softmax in the backward kernel — on TPU, recompute from one
read beats writing (rows, N) stash arrays (HBM write bandwidth is the
bottleneck, not FLOPs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from di_hpc_tpu.pallas_kernels import linear_scan as _ls

_MAX_N = 8192


def _pick_blk_rows(N: int, n_bufs: int) -> int:
    # +4 headroom for softmax temporaries and pipeline double-buffering.
    blk = 1024
    while blk > 8 and (n_bufs + 4) * blk * N * 4 > 13 * 1024 * 1024:
        blk //= 2
    return blk


def _fwd_kernel(x_ref, a_ref, logp_ref, ent_ref, lse_ref):
    # bf16 inputs are upcast in VMEM: HBM traffic stays half, math is f32.
    x = x_ref[:].astype(jnp.float32)               # (blk, N)
    a = a_ref[:]                                   # (blk, 1)
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    lse = m + jnp.log(s)
    p = e / s
    ent = -jnp.sum(p * (x - lse), axis=-1, keepdims=True)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    xa = jnp.sum(jnp.where(col == a, x, 0.0), axis=-1, keepdims=True)
    logp_ref[:] = xa - lse
    ent_ref[:] = ent
    lse_ref[:] = lse


def _bwd_kernel(x_ref, a_ref, lse_ref, ent_ref, glp_ref, gent_ref, dx_ref):
    """Purely elementwise backward: the per-row log-sum-exp and entropy are
    stashed residuals from the forward ((rows,) vectors — negligible traffic
    next to the (rows, N) logits), so no reductions are recomputed here."""
    x = x_ref[:].astype(jnp.float32)
    a = a_ref[:]
    lse = lse_ref[:]                               # (blk, 1)
    ent = ent_ref[:]                               # (blk, 1)
    glp = glp_ref[:]                               # (blk, 1)
    gent = gent_ref[:]                             # (blk, 1)
    logp = x - lse
    p = jnp.exp(logp)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    onehot = (col == a).astype(x.dtype)
    # d(logp_a)/dx = onehot - p;  dH/dx_j = -p_j * (logp_j + H)
    dx = glp * (onehot - p) - gent * p * (logp + ent)
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _call_fwd(logits2d, actions2d):
    R, N = logits2d.shape
    blk = _pick_blk_rows(N, 3)
    row = lambda i: (i, 0)
    vec = pl.BlockSpec((blk, 1), row, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fwd_kernel,
        out_shape=(jax.ShapeDtypeStruct((R, 1), jnp.float32),
                   jax.ShapeDtypeStruct((R, 1), jnp.float32),
                   jax.ShapeDtypeStruct((R, 1), jnp.float32)),
        grid=(pl.cdiv(R, blk),),
        in_specs=[
            pl.BlockSpec((blk, N), row, memory_space=pltpu.VMEM),
            vec,
        ],
        out_specs=(vec, vec, vec),
        cost_estimate=pl.CostEstimate(
            flops=8 * R * N, bytes_accessed=(R * N + 4 * R) * 4,
            transcendentals=R * N),
        interpret=_ls.INTERPRET,
    )(logits2d, actions2d)


def _call_bwd(logits2d, actions2d, lse, ent, glp, gent):
    R, N = logits2d.shape
    blk = _pick_blk_rows(N, 4)
    row = lambda i: (i, 0)
    vec = pl.BlockSpec((blk, 1), row, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bwd_kernel,
        out_shape=jax.ShapeDtypeStruct((R, N), logits2d.dtype),
        grid=(pl.cdiv(R, blk),),
        in_specs=[
            pl.BlockSpec((blk, N), row, memory_space=pltpu.VMEM),
            vec, vec, vec, vec, vec,
        ],
        out_specs=pl.BlockSpec((blk, N), row, memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=8 * R * N, bytes_accessed=2 * R * N * 4,
            transcendentals=R * N),
        interpret=_ls.INTERPRET,
    )(logits2d, actions2d, lse, ent, glp, gent)


@jax.custom_vjp
def logp_entropy_pallas(logits: jax.Array, actions: jax.Array):
    """(..., N) logits + (...) int actions -> (logp_action, entropy), each
    shaped (...).  Differentiable w.r.t. logits (custom VJP, recompute)."""
    out, _ = _fwd_impl(logits, actions)
    return out


def _fwd_impl(logits, actions):
    batch_shape = logits.shape[:-1]
    N = logits.shape[-1]
    R = 1
    for d in batch_shape:
        R *= d
    x2 = logits.reshape(R, N)
    a2 = actions.reshape(R, 1).astype(jnp.int32)
    lp, ent, lse = _call_fwd(x2, a2)
    return ((lp.reshape(batch_shape), ent.reshape(batch_shape)),
            (logits, actions, lse, ent))


def _vjp_bwd(res, g):
    logits, actions, lse, ent = res
    glp, gent = g
    batch_shape = logits.shape[:-1]
    N = logits.shape[-1]
    R = 1
    for d in batch_shape:
        R *= d
    dx = _call_bwd(
        logits.reshape(R, N),
        actions.reshape(R, 1).astype(jnp.int32),
        lse.reshape(R, 1),
        ent.reshape(R, 1),
        glp.reshape(R, 1).astype(jnp.float32),
        gent.reshape(R, 1).astype(jnp.float32),
    )
    return dx.reshape(logits.shape), None


logp_entropy_pallas.defvjp(_fwd_impl, _vjp_bwd)


def supports(logits: jax.Array) -> bool:
    """Whether the fused kernel applies: TPU backend (or interpret mode),
    f32/bf16 logits, and an action dim that fits the VMEM row-block budget."""
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    return ((on_tpu or _ls.INTERPRET)
            and logits.dtype in (jnp.float32, jnp.bfloat16)
            and 16 <= logits.shape[-1] <= _MAX_N)
