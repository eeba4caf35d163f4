"""Fused categorical head: log-prob of the taken action + entropy.

This is the TPU analogue of the reference's fused categorical kernels
(ppo_kernel.h:12-150, vtrace_kernel.h:11-151): those fuse log-softmax, the
action gather, entropy, and THREE backward gradient-stash arrays into one
block-reduce CUDA kernel.  Here the op is plain jnp that XLA fuses into one
pass over the logits, with two deliberate choices measured on v5e
(bench_results/profile_cat_round{1,2,3}.py):

 - **iota-compare gather**: `take_along_axis` lowers to a dynamic gather that
   costs ~3.5x the whole head (741us vs 205us at R=65k, N=128); summing
   `where(iota == action, x, 0)` keeps the op a fused reduction.
 - **stash-free custom VJP**: autodiff would save the (R, N) softmax as a
   residual (an extra HBM round-trip); the custom backward recomputes it from
   the stashed per-row log-sum-exp — the TPU answer to the reference's three
   (R, N) grad-stash arrays (HBM traffic is the scarce resource, not FLOPs).
 - **division-free entropy**: H = lse - sum(e*x)/sum(e) (one divide per row
   instead of a softmax normalize per element).

A hand-written Pallas kernel for this head was built and measured: it TIES
XLA's fusion forward (208 vs 205us — both are bound by the 4 VPU cross-lane
reductions at ~37us each, not by exp or HBM) and LOSES backward (Mosaic
broadcasts (blk,1) row-vectors across lanes ~3x slower than XLA's fusion,
303 vs 108us), so the kernel was retired (git history: profile_cat_* runs).

A SECOND Pallas attempt (packed single-output, VPU reductions, log outside
the kernel) was built and retired too.  What it established (v5e, R=65k,
N=128): (a) in-VMEM cross-lane reductions cost only ~12us/pass at
2048-row blocks — the ~37us/pass above is the per-pass HBM re-read, not
VPU throughput; (b) (R, 1)-shaped kernel inputs/outputs are tile-padded by
Mosaic and cost ~40-50us EACH in stream traffic; (c) MXU ones-dot
reductions (~11us) buy nothing over the VPU and need a 3-term bf16 split
for f32 accuracy; (d) Mosaic's in-kernel `log` is only ~1e-4 accurate.
Decisive: the isolated-jnp 210us is NOT what callers pay — inside
vtrace/ppo XLA fuses the head's passes with surrounding consumers to an
effective ~90us/head, which the opaque kernel cannot cross-fuse against
(kernel-headed vtrace fwd measured 345us vs 197us jnp).  Single-op Pallas
only pays when the op is a whole fusion island (the LSTM layer, the scans).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["logp_entropy", "logp"]


def _fwd_math(logits: jax.Array, actions: jax.Array):
    x = logits.astype(jnp.float32)
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    sx = jnp.sum(e * x, axis=-1, keepdims=True)
    lse = m + jnp.log(s)
    ent = lse - sx / s
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    a = actions.astype(jnp.int32)[..., None]
    xa = jnp.sum(jnp.where(col == a, x, 0.0), axis=-1, keepdims=True)
    return xa - lse, ent, lse


@jax.custom_vjp
def logp_entropy(logits: jax.Array, actions: jax.Array):
    """(..., N) logits + (...) int actions -> (logp_action, entropy), each
    shaped (...).  Differentiable w.r.t. logits (stash-free custom VJP)."""
    lp, ent, _ = _fwd_math(logits, actions)
    return lp[..., 0], ent[..., 0]


def _le_fwd(logits, actions):
    lp, ent, lse = _fwd_math(logits, actions)
    return (lp[..., 0], ent[..., 0]), (logits, actions, lse, ent)


def _le_bwd(res, g):
    logits, actions, lse, ent = res
    glp, gent = g
    x = logits.astype(jnp.float32)
    logp = x - lse
    p = jnp.exp(logp)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    a = actions.astype(jnp.int32)[..., None]
    glp = glp[..., None].astype(jnp.float32)
    gent = gent[..., None].astype(jnp.float32)
    # d(logp_a)/dx = onehot - p;  dH/dx_j = -p_j * (logp_j + H)
    dx = jnp.where(col == a, glp, 0.0) - p * (glp + gent * (logp + ent))
    return dx.astype(logits.dtype), None


logp_entropy.defvjp(_le_fwd, _le_bwd)


def _lp_math(logits: jax.Array, actions: jax.Array):
    x = logits.astype(jnp.float32)
    m = jnp.max(x, axis=-1, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(x - m), axis=-1, keepdims=True))
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    a = actions.astype(jnp.int32)[..., None]
    xa = jnp.sum(jnp.where(col == a, x, 0.0), axis=-1, keepdims=True)
    return (xa - lse)[..., 0], lse


@jax.custom_vjp
def logp(logits: jax.Array, actions: jax.Array) -> jax.Array:
    """Log-prob of the taken action only (3 reductions instead of 4 — used
    for the behaviour policy in V-trace, whose entropy is never needed)."""
    return _lp_math(logits, actions)[0]


def _lp_fwd(logits, actions):
    lp, lse = _lp_math(logits, actions)
    return lp, (logits, actions, lse)


def _lp_bwd(res, g):
    logits, actions, lse = res
    x = logits.astype(jnp.float32)
    p = jnp.exp(x - lse)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    a = actions.astype(jnp.int32)[..., None]
    glp = g[..., None].astype(jnp.float32)
    dx = jnp.where(col == a, glp, 0.0) - p * glp
    return dx.astype(logits.dtype), None


logp.defvjp(_lp_fwd, _lp_bwd)
