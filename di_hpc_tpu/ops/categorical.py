"""Fused categorical head: log-prob of the taken action + entropy.

This is the TPU analogue of the reference's fused categorical kernels
(ppo_kernel.h:12-150, vtrace_kernel.h:11-151): those fuse log-softmax, the
action gather, entropy, and THREE backward gradient-stash arrays into one
block-reduce CUDA kernel.  Here the forward is ONE variadic `lax.reduce`
over the logits computing every per-row statistic — max, sum e, sum e*x,
gathered x_a — together via the online-softmax monoid
    (m, s) ⊕ (m', s') = (M, s*exp(m-M) + s'*exp(m'-M)),  M = max(m, m'),
so XLA's fusion reads the logits exactly ONCE per head.  Design history,
all measured on v5e (bench_results/profile_cat_round{1,2,3}.py,
profile_head_kernel.py, profile_vtrace_ns.py):

 - **one reduce, not four**: XLA lowers each separate reduction over the
   same operand as its own pass.  At cache-resident sizes those re-reads
   cost ~37us each (tolerable); at the north-star vtrace shape (T=1024,
   B=4096, N=32; 537MB logits) they are real HBM traffic and the
   multi-reduction head measured 5,501us vs a 1,311us floor.  The variadic
   reduce measured 1,522us (86% SoL) there and 141us vs 182us at the small
   (T=128, B=512, N=128) shape — it wins at every measured size, so it is
   the only path.
 - **iota-compare gather**: `take_along_axis` lowers to a dynamic gather
   that serializes on TPU (~3.5x the whole head); `where(iota == action,
   x, 0)` is one of the reduce's fused operands.
 - **stash-free custom VJP**: autodiff would save the (R, N) softmax as a
   residual (an extra HBM round-trip); the custom backward recomputes it
   from the stashed per-row log-sum-exp — the TPU answer to the reference's
   three (R, N) grad-stash arrays.
 - **accuracy**: on CPU the reduce is sequential and matches the
   max-then-sum formulation to ~1e-6.  On TPU the tree-merge exp in the
   combiner costs ~1.6e-4 abs on logp/entropy vs the multi-pass form
   (profile_head_kernel.py); the consuming losses are means over T*B, where
   this is far below the tunnel-noise floor.  A bit-exact two-pass variant
   (exact max, then an add-only variadic reduce) measured 2,993us at the
   north-star shape and was rejected as the default.

TWO Pallas head kernels were built and retired before this (git history:
profile_cat_*, profile_head_kernel.py; bench_results/negative_results.json
`pallas_head_n_minor_blocks`): the decisive facts are that Mosaic pays the
minor-dim lane padding on HBM->VMEM block DMA (reading (bG, 128, 32) f32
blocks runs at 22-23% SoL = exactly 128/32 while XLA reads the same dense
array at 89%), and that an opaque kernel cannot join XLA's cross-fusion
with the op's consumers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["logp_entropy", "logp"]


def _onehot_x(x: jax.Array, actions: jax.Array) -> jax.Array:
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    a = actions.astype(jnp.int32)[..., None]
    return jnp.where(col == a, x, 0.0)


def _reduce_stats(x: jax.Array, actions: jax.Array, with_ent: bool):
    """One pass over the logits: returns per-row (lse, xa[, sx_over_s]).

    All reduce operands are elementwise functions of x, so XLA's fusion
    reads x once; a singleton element enters the monoid as
    (m=x, s=1, sx=x, xa=onehot*x).
    """
    # -inf NEVER enters the monoid: (a) the max-accumulator identity must be
    # FINITE — TPU lowers the variadic reduce with init-padded lanes, and
    # combining two -inf accumulators evaluates exp(-inf - (-inf)) = nan
    # (observed on real hardware at small/odd shapes, e.g. (1, 3)); (b) the
    # same combine fires for two -inf DATA elements, i.e. the standard
    # masked-invalid-action idiom logits=[x, -inf, ...].  Masked data is
    # clamped to -1e9, NOT f32-min: when two all-masked partials merge with
    # M equal to the clamp, their sx-channel adds the raw clamped values
    # (e = exp(0) = 1), and 2 * f32-min overflows to -inf whose later
    # 0-weighted merge is 0 * -inf = nan (seen on real TPU); -1e9 cannot
    # overflow, still underflows every exp (exp(-1e9 - M) = 0, and a masked
    # action's logp = -1e9 - lse has exp == 0).  The reduce INIT stays
    # f32-min — a strict lower bound for all (clamped) data, and an exact
    # monoid identity (max(min, m) = m; 0 * exp(min - m) = 0).
    ninf = jnp.finfo(jnp.float32).min
    x = jnp.maximum(x, -1e9)
    xa_arr = _onehot_x(x, actions)
    ones = jnp.ones_like(x)
    dims = (x.ndim - 1,)
    zero = jnp.float32(0)

    if with_ent:
        def comb(acc, val):
            m1, s1, sx1, xa1 = acc
            m2, s2, sx2, xa2 = val
            m = jnp.maximum(m1, m2)
            e1 = jnp.exp(m1 - m)
            e2 = jnp.exp(m2 - m)
            return (m, s1 * e1 + s2 * e2, sx1 * e1 + sx2 * e2, xa1 + xa2)

        m, s, sx, xa = jax.lax.reduce((x, ones, x, xa_arr),
                                      (ninf, zero, zero, zero), comb, dims)
        return m + jnp.log(s), xa, sx / s

    def comb3(acc, val):
        m1, s1, xa1 = acc
        m2, s2, xa2 = val
        m = jnp.maximum(m1, m2)
        return (m, s1 * jnp.exp(m1 - m) + s2 * jnp.exp(m2 - m), xa1 + xa2)

    m, s, xa = jax.lax.reduce((x, ones, xa_arr), (ninf, zero, zero),
                              comb3, dims)
    return m + jnp.log(s), xa


def _fwd_math(logits: jax.Array, actions: jax.Array):
    x = logits.astype(jnp.float32)
    lse, xa, sx_s = _reduce_stats(x, actions, with_ent=True)
    ent = lse - sx_s
    return xa - lse, ent, lse


@jax.custom_vjp
def logp_entropy(logits: jax.Array, actions: jax.Array):
    """(..., N) logits + (...) int actions -> (logp_action, entropy), each
    shaped (...).  Differentiable w.r.t. logits (stash-free custom VJP).

    Masked-logit contract: logits <= -1e9 (including -inf) are treated as
    masked-invalid.  Their probability is exactly 0 in every statistic, but
    the logp of a MASKED taken action is returned FINITE (~-1e9 - lse), not
    -inf as log_softmax would give — consumers must not rely on -inf
    propagation to detect invalid-action sampling (check the action against
    the mask instead).  Gradients w.r.t. a masked taken action's logit are
    0 for logits STRICTLY below -1e9 (the true derivative through the
    forward's maximum(x, -1e9) clamp; at exactly -1e9 the clamp is the
    identity and the usual logp gradient applies)."""
    lp, ent, _ = _fwd_math(logits, actions)
    return lp, ent


def _le_fwd(logits, actions):
    lp, ent, lse = _fwd_math(logits, actions)
    return (lp, ent), (logits, actions, lse, ent)


def _le_bwd(res, g):
    logits, actions, lse, ent = res
    glp, gent = g
    x = logits.astype(jnp.float32)
    logp = x - lse[..., None]
    p = jnp.exp(logp)
    # Masked -inf logits give p = 0 with logp = -inf; the entropy term
    # would then evaluate 0 * (gent * -inf) = nan.  Clamping logp at -88
    # (where f32 exp already underflows to exactly 0) is exact wherever
    # p > 1e-38 and zeroes the term, as the true limit does, below that.
    logp_safe = jnp.maximum(logp, -88.0)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    a = actions.astype(jnp.int32)[..., None]
    glp = glp[..., None].astype(jnp.float32)
    gent = gent[..., None].astype(jnp.float32)
    # d(logp_a)/dx = onehot - p;  dH/dx_j = -p_j * (logp_j + H).  The onehot
    # term is zeroed where the TAKEN action's logit is masked (x < -1e9):
    # the forward clamps those logits via maximum(x, -1e9), whose true
    # derivative is 0 below the clamp (r4 advisor finding — the raw onehot
    # would emit glp at a masked position).
    dx = jnp.where((col == a) & (x >= -1e9), glp, 0.0) - p * (
        glp + gent * (logp_safe + ent[..., None]))
    return dx.astype(logits.dtype), None


logp_entropy.defvjp(_le_fwd, _le_bwd)


def _lp_math(logits: jax.Array, actions: jax.Array):
    x = logits.astype(jnp.float32)
    lse, xa = _reduce_stats(x, actions, with_ent=False)
    return xa - lse, lse


@jax.custom_vjp
def logp(logits: jax.Array, actions: jax.Array) -> jax.Array:
    """Log-prob of the taken action only (drops the entropy statistic —
    used for the behaviour policy in V-trace, whose entropy is never
    needed).

    Same masked-logit contract as logp_entropy: logits <= -1e9 (incl. -inf)
    have probability exactly 0, but a masked TAKEN action's logp comes back
    finite (~-1e9 - lse), not -inf; gradients w.r.t. a taken logit strictly
    below -1e9 are 0."""
    return _lp_math(logits, actions)[0]


def _lp_fwd(logits, actions):
    lp, lse = _lp_math(logits, actions)
    return lp, (logits, actions, lse)


def _lp_bwd(res, g):
    logits, actions, lse = res
    x = logits.astype(jnp.float32)
    p = jnp.exp(x - lse[..., None])
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    a = actions.astype(jnp.int32)[..., None]
    glp = g[..., None].astype(jnp.float32)
    # Masked taken action (x < -1e9): onehot term zeroed, as in _le_bwd.
    dx = jnp.where((col == a) & (x >= -1e9), glp, 0.0) - p * glp
    return dx.astype(logits.dtype), None


logp.defvjp(_lp_fwd, _lp_bwd)
