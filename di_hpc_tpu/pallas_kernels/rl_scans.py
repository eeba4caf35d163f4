"""Fully-fused single-pass RL recurrence kernels.

These go beyond the generic linear-scan kernel (linear_scan.py) by moving the
op's elementwise prologue/epilogue INTO the kernel, so each op touches HBM
exactly once per input/output — the same total-fusion property the reference
gets from its hand-written CUDA kernels (e.g. gae_kernel.h fuses delta
computation, the recurrence, and the denominator divide in one kernel), but
log-depth over T instead of sequential:

  - gae_fused_pallas:      value, reward -> advantage       (gae_kernel.h:10-35)
  - lambda_returns_pallas: value, reward -> lambda-returns  (td_lambda_kernel.h:11-40)
  - td_lambda_loss_pallas: value, reward -> scalar loss (returns + loss
                           partial sums in one pass)        (td_lambda_kernel.h:42-79)
  - vtrace_returns_adv_pallas: IS, reward, value (clips folded in-kernel)
                           -> (vs returns, advantages)      (vtrace_kernel.h:153-195)
  - vtrace_losses_pallas:  IS, logp, reward, value -> (pg_loss, value_loss)
                           — the returns/advantage planes never touch HBM
                           (r5; reference spreads this over vtrace_kernel.h's
                           return + advantage + loss kernels)
  - upgo_advantages_pallas / upgo_loss_pallas: binary-lambda recurrence
                           (+ loss reduction, r5)           (upgo_kernel.h:11-38)

All recurrence outputs are targets the consuming losses treat as
stop-gradient (SURVEY.md §7), so forward-only kernels suffice; the
loss-level kernels carry custom VJPs that recompute the (detached)
returns/advantages in the backward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from di_hpc_tpu.pallas_kernels import linear_scan as _ls
from di_hpc_tpu.ops._backend import (ROWCONST_SCAN_NBUFS,
                                     UPGO_NBUFS, VTRACE_NBUFS)


# NOTE on gradients: these kernels are forward-only.  Their outputs are
# recurrence targets the consuming losses detach (the reference's
# GAEFunction.backward likewise returns Nones, hpc_rll/rl_utils/gae.py:16-18),
# so each public entry point carries a zero-gradient custom VJP — without one,
# jax.grad cannot linearize through the pallas_call even when the cotangent
# is severed by a downstream stop_gradient.


def _suffix_scan(aa: jax.Array, bb: jax.Array) -> jax.Array:
    """In-VMEM suffix composition: y[t] = a[t] + b[t] * y[t+1], y[T] = 0.

    bb may be (T, 1) (row-constant coefficients, cheaper shifts) or match aa.
    """
    T = aa.shape[0]
    k = 1
    while k < T:
        a_sh = jnp.concatenate([aa[k:], jnp.zeros((k,) + aa.shape[1:], aa.dtype)], axis=0)
        b_sh = jnp.concatenate([bb[k:], jnp.ones((k,) + bb.shape[1:], bb.dtype)], axis=0)
        aa = aa + bb * a_sh
        bb = bb * b_sh
        k *= 2
    return aa


def _suffix_scan_full_plane(aa: jax.Array, bb: jax.Array) -> jax.Array:
    """Suffix composition for FULL-PLANE (T, blk) coefficients: the
    two-level chunked scheme shared with the generic kernel
    (linear_scan._compose — one implementation, one chunk length).  For
    full-plane bb the flat doubling scan's shifts dominate VMEM traffic:
    chunking measured 105.5 vs 131.9us on the vtrace kernel at T=1024,
    B=4096 — 97% SoL (bench_results/profile_chunked_scan_r4.py).  The r2
    retirement of chunking covered only row-constant-b gae, where the flat
    scan (_suffix_scan) is already at floor and stays."""
    return _ls._compose(aa, bb, aa.shape[0], reverse=True)


def _pick_blk(T: int, B: int, n_bufs: int) -> int:
    # Budget counts io buffers (double-buffered by the pipeline) plus ~4
    # live doubling-scan temporaries; Mosaic's scoped-vmem limit is 16MB.
    blk = 512
    while blk > 128 and (n_bufs + 4) * (T + 1) * blk * 4 > 13 * 1024 * 1024:
        blk //= 2
    return blk


# ---------------------------------------------------------------------------
# GAE
# ---------------------------------------------------------------------------

def _gae_kernel(value_ref, reward_ref, denom_ref, out_ref, *,
                gamma: float, lambda_: float, T: int):
    v = value_ref[:]           # (T+1, blk)
    r = reward_ref[:]          # (T, blk)
    denom = denom_ref[:]       # (T, 1)
    delta = r + gamma * v[1:] - v[:-1]
    a = denom * delta
    b = jnp.full((T, 1), gamma * lambda_, a.dtype)
    y = _suffix_scan(a, b)
    out_ref[:] = y / denom


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def gae_fused_pallas(value: jax.Array, reward: jax.Array,
                     gamma: float = 0.99, lambda_: float = 0.97) -> jax.Array:
    """Single-HBM-pass GAE: reads value (T+1, B) + reward (T, B), writes
    adv (T, B); delta/denominator/divide all fused in VMEM.  Forward-only
    (zero-grad VJP)."""
    return _gae_fused_impl(value, reward, gamma, lambda_)


gae_fused_pallas.defvjp(
    lambda v, r, g, l: (_gae_fused_impl(v, r, g, l), (v, r)),
    lambda g, l, res, ct: tuple(jnp.zeros_like(x) for x in res),
)


@functools.partial(jax.jit, static_argnames=("gamma", "lambda_"))
def _gae_fused_impl(value: jax.Array, reward: jax.Array,
                    gamma: float, lambda_: float) -> jax.Array:
    from di_hpc_tpu.ops.scan import gae_denominators

    T, B = reward.shape
    denom = gae_denominators(T, lambda_, dtype=reward.dtype).reshape(T, 1)
    blk = _pick_blk(T, B, ROWCONST_SCAN_NBUFS)
    kernel = functools.partial(_gae_kernel, gamma=gamma, lambda_=lambda_, T=T)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, B), reward.dtype),
        grid=(pl.cdiv(B, blk),),
        in_specs=[
            pl.BlockSpec((T + 1, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=6 * T * B * max(1, (T - 1)).bit_length(),
            bytes_accessed=3 * T * B * 4,
            transcendentals=0,
        ),
        interpret=_ls.INTERPRET,
    )(value, reward, denom)


# ---------------------------------------------------------------------------
# Generalized lambda returns (scalar gamma/lambda)
# ---------------------------------------------------------------------------

def _lret_body(v, r, gamma: float, lambda_: float, T: int):
    """Shared lambda-returns math on in-VMEM tiles: v (T+1, blk), r (T, blk)
    -> returns (T, blk)."""
    d = gamma * lambda_
    # a[t] = r[t] + (gamma - d) * V[t+1], except a[T-1] = r[T-1] + gamma*V[T];
    # b[t] = d, except b[T-1] = 0.
    row = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
    is_last = row == (T - 1)
    g_eff = jnp.where(is_last, gamma, gamma - d).astype(v.dtype)
    a = r + g_eff * v[1:]
    b = jnp.where(is_last, 0.0, d).astype(v.dtype)
    return _suffix_scan(a, b)


def _lret_kernel(value_ref, reward_ref, out_ref, *, gamma: float,
                 lambda_: float, T: int):
    out_ref[:] = _lret_body(value_ref[:], reward_ref[:], gamma, lambda_, T)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def lambda_returns_pallas(value: jax.Array, reward: jax.Array,
                          gamma: float, lambda_: float) -> jax.Array:
    """Fused generalized lambda-returns for scalar gamma/lambda: reads
    value (T+1, B) + reward (T, B) once, writes returns (T, B).
    Forward-only (zero-grad VJP)."""
    return _lambda_returns_impl(value, reward, gamma, lambda_)


lambda_returns_pallas.defvjp(
    lambda v, r, g, l: (_lambda_returns_impl(v, r, g, l), (v, r)),
    lambda g, l, res, ct: tuple(jnp.zeros_like(x) for x in res),
)


@functools.partial(jax.jit, static_argnames=("gamma", "lambda_"))
def _lambda_returns_impl(value: jax.Array, reward: jax.Array,
                         gamma: float, lambda_: float) -> jax.Array:
    T, B = reward.shape
    blk = _pick_blk(T, B, ROWCONST_SCAN_NBUFS)
    kernel = functools.partial(_lret_kernel, gamma=gamma, lambda_=lambda_, T=T)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, B), reward.dtype),
        grid=(pl.cdiv(B, blk),),
        in_specs=[
            pl.BlockSpec((T + 1, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=6 * T * B * max(1, (T - 1)).bit_length(),
            bytes_accessed=3 * T * B * 4,
            transcendentals=0,
        ),
        interpret=_ls.INTERPRET,
    )(value, reward)


# ---------------------------------------------------------------------------
# TD(lambda) loss, fully fused (returns + squared error in one pass)
# ---------------------------------------------------------------------------

def _tdl_loss_kernel(value_ref, reward_ref, out_ref, *, gamma: float,
                     lambda_: float, T: int, B: int):
    """Writes per-lane partial sums of e*e into this block's (1, blk) slice
    of a (1, B) output; the caller sums the B lanes (a ~16KB epilogue).
    The r3 scheme accumulated a full scalar into a REVISITED (1, 128) block
    (read-modify-write chaining every grid step); per-block partials
    measured 59.2 vs 63.3us at T=1024, B=4096 (profile_tdl_r4.py) and drop
    the cross-step dependence.  The time axis is reduced in-kernel (cheap:
    sublane reduction); the lane axis is left to XLA."""
    v = value_ref[:]
    ret = _lret_body(v, reward_ref[:], gamma, lambda_, T)
    e = ret - v[:-1]
    blk = e.shape[1]
    if B % blk:
        # Ragged last block: the padding lanes are uninitialized VMEM (can
        # be NaN) and they would join the caller's lane sum — zero them.
        i = pl.program_id(0)
        col = (i * blk
               + jax.lax.broadcasted_iota(jnp.int32, e.shape, 1))
        e = jnp.where(col < B, e, 0.0)
    out_ref[:] = jnp.sum(e * e, axis=0, keepdims=True)


def _tdl_err_kernel(value_ref, reward_ref, out_ref, *, gamma: float,
                    lambda_: float, T: int):
    v = value_ref[:]
    ret = _lret_body(v, reward_ref[:], gamma, lambda_, T)
    out_ref[:] = ret - v[:-1]


def _tdl_call(kernel_fn, make_out, value, reward, gamma, lambda_,
              **kernel_kw):
    """``make_out(blk) -> (out_shape, out_spec)`` so the output block width
    is derived from the SAME blk as the grid and input specs (a second
    independent _pick_blk call at the call sites could silently diverge if
    the VMEM charge ever changes)."""
    T, B = reward.shape
    blk = _pick_blk(T, B, ROWCONST_SCAN_NBUFS)
    out_shape, out_spec = make_out(blk)
    kernel = functools.partial(kernel_fn, gamma=gamma, lambda_=lambda_, T=T,
                               **kernel_kw)
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(pl.cdiv(B, blk),),
        in_specs=[
            pl.BlockSpec((T + 1, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        cost_estimate=pl.CostEstimate(
            flops=8 * T * B * max(1, (T - 1)).bit_length(),
            bytes_accessed=2 * T * B * 4,
            transcendentals=0,
        ),
        interpret=_ls.INTERPRET,
    )(value, reward)


@functools.partial(jax.jit, static_argnames=("gamma", "lambda_"))
def _tdl_loss_impl(value, reward, gamma: float, lambda_: float):
    T, B = reward.shape
    parts = _tdl_call(
        _tdl_loss_kernel,
        lambda blk: (jax.ShapeDtypeStruct((1, B), jnp.float32),
                     pl.BlockSpec((1, blk), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)),
        value, reward, gamma, lambda_, B=B)
    return 0.5 * jnp.sum(parts) / (T * B)


@functools.partial(jax.jit, static_argnames=("gamma", "lambda_"))
def _tdl_err_impl(value, reward, gamma: float, lambda_: float):
    T, B = reward.shape
    return _tdl_call(
        _tdl_err_kernel,
        lambda blk: (jax.ShapeDtypeStruct((T, B), reward.dtype),
                     pl.BlockSpec((T, blk), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)),
        value, reward, gamma, lambda_)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def td_lambda_loss_pallas(value: jax.Array, reward: jax.Array,
                          gamma: float, lambda_: float) -> jax.Array:
    """Fully-fused TD(lambda) loss (unit weight):
    0.5 * mean((stop_grad(lambda_returns) - value[:-1])**2).

    One HBM pass over value (T+1, B) + reward (T, B) with only per-block
    scalar partials written back — vs the two-stage path's 5 passes (write
    returns, read them back, re-read value for the loss).  The backward
    recomputes the TD error with a second single-pass kernel, so training
    traffic matches the two-stage path while the forward (the reference's
    benchmarked surface, td_lambda_kernel.h:11-40) runs at the 2-pass floor.
    Gradient contract matches origin (origin/td.py:169-175): returns are
    detached, d loss/d value[:-1] = -(ret - v)/N, value[T] and reward get
    zeros."""
    return _tdl_loss_impl(value, reward, gamma, lambda_)


def _tdl_loss_fwd(value, reward, gamma, lambda_):
    return _tdl_loss_impl(value, reward, gamma, lambda_), (value, reward)


def _tdl_loss_bwd(gamma, lambda_, res, ct):
    value, reward = res
    T, B = reward.shape
    e = _tdl_err_impl(value, reward, gamma, lambda_)
    dv_head = (-ct / (T * B)) * e
    dv = jnp.concatenate([dv_head, jnp.zeros((1, B), value.dtype)], axis=0)
    return dv, jnp.zeros_like(reward)


td_lambda_loss_pallas.defvjp(_tdl_loss_fwd, _tdl_loss_bwd)


# ---------------------------------------------------------------------------
# UPGO advantages (binary-lambda prologue + scan + advantage epilogue)
# ---------------------------------------------------------------------------

def _upgo_kernel(rhos_ref, reward_ref, value_ref, adv_ref, *, T: int):
    """adv = rhos * (upgo_returns - V[:-1]) in one pass: the data-dependent
    binary lambdas (trace continues iff r_{t+1} + V_{t+2} >= V_{t+1},
    origin/upgo.py:34-38), the gamma=1 lambda-return recurrence, and the
    advantage are all derived in VMEM from 3 input streams (the generic
    path materializes the lambda/a/d planes and runs the scan as a separate
    kernel; reference counterpart upgo_kernel.h:11-38)."""
    rhos = rhos_ref[:]
    r = reward_ref[:]
    v = value_ref[:]                           # (T+1, blk)
    lam = ((r + v[1:]) >= v[:-1]).astype(r.dtype)
    # multistep_forward_view's shifted-lambda layout: d[t] = lam[t+1] for
    # t < T-1 and d[T-1] = 0 (the horizon cut).
    d = jnp.concatenate([lam[1:], jnp.zeros_like(lam[-1:])], axis=0)
    a = r + (1.0 - d) * v[1:]
    ret = _suffix_scan_full_plane(a, d)
    adv_ref[:] = rhos * (ret - v[:-1])


@jax.custom_vjp
def upgo_advantages_pallas(rhos, reward, value):
    """Fused UPGO advantage: one pass over rhos/reward (T, B) + value
    (T+1, B) -> rhos * (upgo_returns - V[:-1]).  Forward-only (the UPGO
    loss detaches advantages entirely; zero-grad VJP)."""
    return _upgo_adv_impl(rhos, reward, value)


upgo_advantages_pallas.defvjp(
    lambda rh, r, v: (_upgo_adv_impl(rh, r, v), (rh, r, v)),
    lambda res, ct: tuple(jnp.zeros_like(x) for x in res),
)


@jax.jit
def _upgo_adv_impl(rhos, reward, value):
    T, B = reward.shape
    # Full-plane binary coefficients: same scan-temporary charge story as
    # the vtrace kernel (see _vtrace_returns_adv_impl) => n_bufs=10.
    blk = _pick_blk(T, B, UPGO_NBUFS)
    kernel = functools.partial(_upgo_kernel, T=T)
    tb = lambda i: (0, i)
    spec = pl.BlockSpec((T, blk), tb, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, B), reward.dtype),
        grid=(pl.cdiv(B, blk),),
        in_specs=[spec, spec,
                  pl.BlockSpec((T + 1, blk), tb, memory_space=pltpu.VMEM)],
        out_specs=spec,
        cost_estimate=pl.CostEstimate(
            flops=10 * T * B * max(1, (T - 1)).bit_length(),
            bytes_accessed=4 * T * B * 4,
            transcendentals=0,
        ),
        interpret=_ls.INTERPRET,
    )(rhos, reward, value)


def _upgo_loss_kernel(rhos_ref, lp_ref, reward_ref, value_ref, out_ref, *,
                      T: int, B: int):
    """_upgo_kernel's advantage + the loss reduction in one pass: out is
    this block's (1, blk) slice of (1, B) per-lane partial sums of
    adv * logp (the r5 vtrace_losses scheme; at the bench shape the
    composed op lost ~30us to the adv/metric plane round-trip and the
    separate mean pass, profile_upgo_r5.py)."""
    rhos = rhos_ref[:]
    lp = lp_ref[:]
    r = reward_ref[:]
    v = value_ref[:]                           # (T+1, blk)
    lam = ((r + v[1:]) >= v[:-1]).astype(r.dtype)
    d = jnp.concatenate([lam[1:], jnp.zeros_like(lam[-1:])], axis=0)
    a = r + (1.0 - d) * v[1:]
    ret = _suffix_scan_full_plane(a, d)
    prod = rhos * (ret - v[:-1]) * lp
    blk = prod.shape[1]
    if B % blk:
        i = pl.program_id(0)
        col = i * blk + jax.lax.broadcasted_iota(jnp.int32, prod.shape, 1)
        prod = jnp.where(col < B, prod, 0.0)
    out_ref[:] = jnp.sum(prod, axis=0, keepdims=True)


@functools.partial(jax.jit)
def _upgo_loss_impl(rhos, lp, reward, value):
    T, B = reward.shape
    blk = _pick_blk(T, B, UPGO_NBUFS)
    kernel = functools.partial(_upgo_loss_kernel, T=T, B=B)
    tb = lambda i: (0, i)
    spec = pl.BlockSpec((T, blk), tb, memory_space=pltpu.VMEM)
    parts = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
        grid=(pl.cdiv(B, blk),),
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((T + 1, blk), tb, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, blk), tb, memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=12 * T * B * max(1, (T - 1)).bit_length(),
            bytes_accessed=4 * T * B * 4,
            transcendentals=0,
        ),
        interpret=_ls.INTERPRET,
    )(rhos, lp, reward, value)
    return -jnp.sum(parts) / (T * B)


@jax.custom_vjp
def upgo_loss_pallas(rhos, lp, reward, value):
    """Fully-fused UPGO loss: -mean(rhos * (upgo_returns - V[:-1]) * logp)
    with the binary-lambda recurrence, the advantage AND the loss reduction
    in one kernel — the advantage/metric planes never round-trip HBM.

    Gradient contract (matches ops.upgo_loss: advantages detached,
    origin/upgo.py:64-66): d loss/d lp = -adv/(T*B), recomputed in the
    backward with the plain advantage kernel; rhos/reward/value get
    zeros."""
    return _upgo_loss_impl(rhos, lp, reward, value)


def _upgo_loss_fwd(rhos, lp, reward, value):
    return _upgo_loss_impl(rhos, lp, reward, value), (rhos, reward, value)


def _upgo_loss_bwd(res, ct):
    rhos, reward, value = res
    T, B = reward.shape
    adv = _upgo_adv_impl(rhos, reward, value)
    dlp = (-ct / (T * B)) * adv
    return (jnp.zeros_like(rhos), dlp, jnp.zeros_like(reward),
            jnp.zeros_like(value))


upgo_loss_pallas.defvjp(_upgo_loss_fwd, _upgo_loss_bwd)


# ---------------------------------------------------------------------------
# V-trace returns + advantage
# ---------------------------------------------------------------------------

def _vtrace_kernel(is_ref, reward_ref, value_ref, ret_ref, adv_ref, *,
                   gamma: float, lambda_: float, rho_clip: float,
                   c_clip: float, pg_clip: float, T: int):
    IS = is_ref[:]
    r = reward_ref[:]
    v = value_ref[:]           # (T+1, blk)
    # The three clipped importance-weight planes are all min(IS, clip) of
    # the ONE IS plane — folding the clips here turns 7 HBM streams into 5
    # and spares XLA materializing rhos/cs/pg_rhos (VERDICT r3 lever; the
    # reference reads three pre-clipped arrays per its torch contract,
    # vtrace_kernel.h:161-180).
    rhos = jnp.minimum(IS, rho_clip)
    cs = jnp.minimum(IS, c_clip)
    delta = rhos * (r + gamma * v[1:] - v[:-1])
    items = _suffix_scan_full_plane(delta, gamma * lambda_ * cs)
    ret = v[:-1] + items
    ret_ref[:] = ret
    ret_tp1 = jnp.concatenate([ret[1:], v[-1:]], axis=0)
    adv_ref[:] = jnp.minimum(IS, pg_clip) * (r + gamma * ret_tp1 - v[:-1])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def vtrace_returns_adv_pallas(is_weights, reward, value,
                              gamma: float = 0.99, lambda_: float = 0.95,
                              rho_clip: float = 1.0, c_clip: float = 1.0,
                              pg_clip: float = 1.0):
    """Fused V-trace recurrence: one pass over the IS-weight + reward (T, B)
    planes and value (T+1, B), producing (returns, advantages); the three
    min(IS, clip) planes are derived in-kernel (reference spreads this over
    3 kernels on pre-clipped inputs, vtrace_kernel.h:153-195).  Forward-only
    (zero-grad VJP)."""
    return _vtrace_returns_adv_impl(is_weights, reward, value, gamma,
                                    lambda_, rho_clip, c_clip, pg_clip)


vtrace_returns_adv_pallas.defvjp(
    lambda i, rw, v, g, l, rc, cc, pc: (
        _vtrace_returns_adv_impl(i, rw, v, g, l, rc, cc, pc), (i, rw, v)),
    lambda g, l, rc, cc, pc, res, ct: tuple(jnp.zeros_like(x) for x in res),
)


@functools.partial(jax.jit, static_argnames=(
    "gamma", "lambda_", "rho_clip", "c_clip", "pg_clip"))
def _vtrace_returns_adv_impl(is_weights, reward, value, gamma: float,
                             lambda_: float, rho_clip: float, c_clip: float,
                             pg_clip: float):
    T, B = reward.shape
    # n_bufs=10, not the 5 ios: unlike gae/lambda-returns (row-constant
    # (T, 1) coefficients), vtrace's suffix scan carries a FULL (T, blk)
    # coefficient plane (cs, derived in-kernel), so the doubling loop keeps
    # ~2 extra (T, blk) shift temporaries live per operand, plus the
    # in-kernel rhos/cs derivations.  At T=1024, B=4096 a 7-ios charge
    # picked blk=256 and Mosaic measured 18MB scoped VMEM against the 16MB
    # limit (r3 prewarm); 10 ios picks blk=128 and leaves the T=128 stages'
    # blk=512 choice untouched.  The charge constant lives in ops/_backend
    # so the fused_kernels_ok gate uses the identical number.
    blk = _pick_blk(T, B, VTRACE_NBUFS)
    kernel = functools.partial(_vtrace_kernel, gamma=gamma, lambda_=lambda_,
                               rho_clip=rho_clip, c_clip=c_clip,
                               pg_clip=pg_clip, T=T)
    tb = lambda i: (0, i)
    spec = pl.BlockSpec((T, blk), tb, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((T, B), reward.dtype),
                   jax.ShapeDtypeStruct((T, B), reward.dtype)),
        grid=(pl.cdiv(B, blk),),
        in_specs=[spec, spec,
                  pl.BlockSpec((T + 1, blk), tb, memory_space=pltpu.VMEM)],
        out_specs=(spec, spec),
        cost_estimate=pl.CostEstimate(
            flops=12 * T * B * max(1, (T - 1)).bit_length(),
            bytes_accessed=5 * T * B * 4,
            transcendentals=0,
        ),
        interpret=_ls.INTERPRET,
    )(is_weights, reward, value)
    return out


# ---------------------------------------------------------------------------
# V-trace losses (recurrence + pg/value loss partial sums, nothing
# materialized)
# ---------------------------------------------------------------------------

def _vtrace_losses_kernel(is_ref, lp_ref, reward_ref, value_ref, out_ref, *,
                          gamma: float, lambda_: float, rho_clip: float,
                          c_clip: float, pg_clip: float, T: int, B: int):
    """Same recurrence as _vtrace_kernel, but instead of writing the (T, B)
    returns/advantage planes it reduces them straight into per-lane partial
    sums of the policy-gradient and value losses (td_lambda's partial-sum
    scheme, _tdl_loss_kernel).  out is this block's (2, blk) slice of a
    (2, B) array: row 0 = sum_T(logp * adv), row 1 = sum_T((v - ret)^2)."""
    IS = is_ref[:]
    lp = lp_ref[:]
    r = reward_ref[:]
    v = value_ref[:]           # (T+1, blk)
    rhos = jnp.minimum(IS, rho_clip)
    cs = jnp.minimum(IS, c_clip)
    delta = rhos * (r + gamma * v[1:] - v[:-1])
    items = _suffix_scan_full_plane(delta, gamma * lambda_ * cs)
    ret = v[:-1] + items
    ret_tp1 = jnp.concatenate([ret[1:], v[-1:]], axis=0)
    adv = jnp.minimum(IS, pg_clip) * (r + gamma * ret_tp1 - v[:-1])
    pg = lp * adv
    e = v[:-1] - ret
    blk = pg.shape[1]
    if B % blk:
        # Ragged last block: zero the uninitialized padding lanes before
        # they join the caller's lane sum (see _tdl_loss_kernel).
        i = pl.program_id(0)
        col = i * blk + jax.lax.broadcasted_iota(jnp.int32, pg.shape, 1)
        pg = jnp.where(col < B, pg, 0.0)
        e = jnp.where(col < B, e, 0.0)
    out_ref[0:1, :] = jnp.sum(pg, axis=0, keepdims=True)
    out_ref[1:2, :] = jnp.sum(e * e, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("gamma", "lambda_", "rho_clip",
                                             "c_clip", "pg_clip"))
def _vtrace_losses_impl(is_weights, lp, reward, value, gamma: float,
                        lambda_: float, rho_clip: float, c_clip: float,
                        pg_clip: float):
    T, B = reward.shape
    blk = _pick_blk(T, B, VTRACE_NBUFS)  # same charge shape as the 5-stream
    kernel = functools.partial(_vtrace_losses_kernel, gamma=gamma,
                               lambda_=lambda_, rho_clip=rho_clip,
                               c_clip=c_clip, pg_clip=pg_clip, T=T, B=B)
    tb = lambda i: (0, i)
    spec = pl.BlockSpec((T, blk), tb, memory_space=pltpu.VMEM)
    parts = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2, B), jnp.float32),
        grid=(pl.cdiv(B, blk),),
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((T + 1, blk), tb, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2, blk), tb, memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=14 * T * B * max(1, (T - 1)).bit_length(),
            bytes_accessed=4 * T * B * 4,
            transcendentals=0,
        ),
        interpret=_ls.INTERPRET,
    )(is_weights, lp, reward, value)
    pg_loss = -jnp.sum(parts[0]) / (T * B)
    value_loss = jnp.sum(parts[1]) / (T * B)
    return pg_loss, value_loss


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def vtrace_losses_pallas(is_weights, lp, reward, value,
                         gamma: float = 0.99, lambda_: float = 0.95,
                         rho_clip: float = 1.0, c_clip: float = 1.0,
                         pg_clip: float = 1.0):
    """Fully-fused unit-weight V-trace pg/value losses:
    (-mean(logp * adv), mean((value[:-1] - vs)^2)) with the recurrence,
    clips, advantage AND both loss reductions in one kernel pass — the
    (T, B) returns/advantage planes never touch HBM (the r4 composed stage
    paid ~5 extra plane passes materializing them between the head and the
    epilogue; VERDICT r4 weak #3).

    Gradient contract (matches ops.vtrace_error's composition of the
    stop-gradient reference semantics, origin/vtrace.py:64-71): returns and
    advantages are detached, so d pg/d lp = -adv/(T*B) and
    d vl/d value[:-1] = 2*(value - vs)/(T*B); is_weights and reward get
    zeros.  The backward recomputes ret/adv with the existing 5-stream
    kernel (one extra pass, training traffic matches the two-stage path)."""
    return _vtrace_losses_impl(is_weights, lp, reward, value, gamma, lambda_,
                               rho_clip, c_clip, pg_clip)


def _vtrace_losses_fwd(is_weights, lp, reward, value, gamma, lambda_,
                       rho_clip, c_clip, pg_clip):
    out = _vtrace_losses_impl(is_weights, lp, reward, value, gamma, lambda_,
                              rho_clip, c_clip, pg_clip)
    return out, (is_weights, reward, value)


def _vtrace_losses_bwd(gamma, lambda_, rho_clip, c_clip, pg_clip, res, ct):
    is_weights, reward, value = res
    ct_pg, ct_vl = ct
    T, B = reward.shape
    ret, adv = _vtrace_returns_adv_impl(is_weights, reward, value, gamma,
                                        lambda_, rho_clip, c_clip, pg_clip)
    dlp = (-ct_pg / (T * B)) * adv
    dv_head = (ct_vl * 2.0 / (T * B)) * (value[:-1] - ret)
    dvalue = jnp.concatenate([dv_head, jnp.zeros((1, B), value.dtype)], axis=0)
    return jnp.zeros_like(is_weights), dlp, jnp.zeros_like(reward), dvalue


vtrace_losses_pallas.defvjp(_vtrace_losses_fwd, _vtrace_losses_bwd)
