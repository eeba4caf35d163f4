"""Fused LSTM-layer Pallas kernel: the whole time loop on-chip.

The reference runs the LSTM's sequential part as a host loop launching one
cuBLAS GEMM + 2 kernels per step (src/torch_utils/network/lstm.cu:131-163).
The XLA `lax.scan` version already removes the launch overhead; this kernel
goes further by keeping Wh and the hidden state RESIDENT IN VMEM across the
whole sequence — the recurrent weight matrix is read from HBM once per layer
instead of participating in XLA's per-iteration loop dataflow, and each
step's (B, 4H) gate math never touches HBM.

Layout: grid = (B-blocks, S); time is the fastest-varying grid axis, so each
B-block runs its full sequence with h/c carried in VMEM scratch.  The h @ Wh
product runs on the MXU at the ambient matmul precision; LayerNorm + gate
activations on the VPU.  Inputs are the sequence-wide pre-computed gate projections
gx = LN_x(x @ Wx) + bias (one large MXU GEMM done by XLA outside — the same
hoist the reference does, lstm.cu:121-123).

Gradients: `lstm_layer_fused` carries a custom VJP whose backward is a
second on-chip reverse-loop kernel (hand-derived cell + LayerNorm backward,
reading the stashed h/c sequences) — the TPU analogue of the reference's
hand-derived LstmBackward (lstm.cu:188-379).  Weight gradients fall out as
sequence-wide reductions AFTER the kernel: one h_prev^T @ d(gh_pre) MXU GEMM
for dWh, mirroring the forward's hoisted x @ Wx.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from di_hpc_tpu.pallas_kernels import linear_scan as _ls
from di_hpc_tpu.utils.constants import LAYERNORM_EPS

# Wh must stay resident in VMEM: (H, 4H) f32 under ~8MB -> H <= 716.
_WH_VMEM_BUDGET = 8 * 1024 * 1024

# The in-kernel h @ Wh MXU product runs at the AMBIENT matmul precision
# (precision=None): single-pass bf16 by default on TPU — measured 148us vs
# 352us for forced-f32 (6-pass) at the reference config — while parity
# workflows that set jax.default_matmul_precision("float32") get exact-f32
# recurrences in kernel and oracle alike (the 64-step recurrence is chaotic,
# so cross-precision comparisons diverge to O(1); see CLAUDE.md).


# LN statistics are SINGLE-PASS (var = E[x^2] - E[x]^2): one fewer (blk, 4H)
# VPU traversal than the (x - mean)^2 form.  Measured 203.5 vs 207.0 us at
# S=32, B=256, H=512 and part of the 17.8% ref-config win
# (profile_lstm_r2.py, 2026-08-20).  The backward kernels recompute stats
# with the SAME formulation so fwd and bwd see identical values.  The
# m2 - m*m subtraction can round negative beyond eps when mean^2 >> var
# (possible for the RAW x @ Wx projection after training, which is not
# guaranteed zero-centred), so it is clamped at 0 — free on the VPU and
# identical in fwd and bwd.


def _ln_stats(x):
    m = jnp.mean(x, axis=-1, keepdims=True)
    m2 = jnp.mean(x * x, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(jnp.maximum(m2 - m * m, 0.0) + LAYERNORM_EPS)
    return m, rstd


def _ln(x, gamma, beta):
    mean, rstd = _ln_stats(x)
    return (x - mean) * rstd * gamma + beta


def _xgate(gxp32, glnx_ref, blnx_ref, bias_ref, norm):
    """x-side gate pre-activation from the RAW x @ Wx projection: the
    x-LayerNorm and bias are folded in-kernel (round 2) so the XLA side
    neither materializes a normalized gx stream nor pays LN_x's backward
    passes over (S, B, 4H) — measured 267.6 us/layer for the x-side
    GEMM+LN+bias fwd+grad at S=32, B=256, H=512 before the fold
    (bench_results/profile_lstm_bwd_r2.py).

    The forward kernel applies this PER UNROLLED STEP inside _layer_kernel's
    time loop; a batched variant over the whole (U*blk, 4H) block was
    measured SLOWER (Mosaic inserts a relayout for the (U*blk, 4H) view)
    and retired — see the round-3 decomposition,
    bench_results/r3_lstm_decomp.json: LN_x 6.6 us of a 39.2 us layer at
    S=64, B=3, H=384.  Row-wise LN is identical either way, so the backward
    kernels' per-step recompute still matches bit-for-bit."""
    if norm:
        return (_ln(gxp32, glnx_ref[:].astype(jnp.float32),
                    blnx_ref[:].astype(jnp.float32))
                + bias_ref[:].astype(jnp.float32))
    return gxp32 + bias_ref[:].astype(jnp.float32)


def _gates(gate, c, H):
    # One sigmoid over the contiguous i|f|o 3H block (one VPU transcendental
    # pass instead of three) + tanh over the last H block.
    sfo = jax.nn.sigmoid(gate[:, :3 * H])
    u = jnp.tanh(gate[:, 3 * H:])
    c_new = sfo[:, H:2 * H] * c + sfo[:, :H] * u
    h_new = sfo[:, 2 * H:3 * H] * jnp.tanh(c_new)
    return h_new, c_new


def _step_math(gx32, h, c, wh_ref, gln_ref, bln_ref, H, norm):
    gh = jax.lax.dot_general(
        h.astype(wh_ref.dtype), wh_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=None)                            # (blkB, 4H) on the MXU
    if norm:
        gh = _ln(gh, gln_ref[:].astype(jnp.float32),
                 bln_ref[:].astype(jnp.float32))
    return _gates(gx32 + gh, c, H)


def _layer_kernel(gxp_ref, wh_ref, glnx_ref, blnx_ref, gln_ref, bln_ref,
                  bias_ref, h0_ref, c0_ref,
                  y_ref, *out_refs, S: int, H: int, U: int, norm: bool,
                  stash: bool):
    if stash:
        c_seq_ref, hn_ref, cn_ref, h_scr, c_scr = out_refs
    else:
        hn_ref, cn_ref, h_scr, c_scr = out_refs
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init():
        h_scr[:] = h0_ref[:].astype(jnp.float32)
        c_scr[:] = c0_ref[:].astype(jnp.float32)

    # bf16 inputs: streams/weights stay bf16 (half the HBM traffic, native
    # MXU rate); the h/c CARRY and all gate math stay f32 in scratch —
    # casting h to the weight dtype at the GEMM input is exactly the
    # rounding the stored y stream sees, so the backward's recompute from y
    # matches the forward.  U consecutive time steps run per grid
    # invocation (amortizes per-grid-step overhead; r3 decomposition: U=4
    # 30.7 vs U=2 39.2 us/layer at S=64, B=3, H=384 and 207.2 vs 219.6 at
    # S=32, B=256, H=512 — r3_lstm_decomp.json).  LN_x stays PER STEP: a
    # batched (U*blk, 4H) LN_x was built and measured SLOWER (38.1/268.7 us
    # vs 30.7/207.2 at the two configs) — the (U, blk, 4H) -> (U*blk, 4H)
    # reshape + re-slicing materializes a relayout that costs more than the
    # saved per-op overhead.
    h = h_scr[:]                                   # (blkB, H) f32
    c = c_scr[:]
    for u_i in range(U):
        gx32 = _xgate(gxp_ref[u_i].astype(jnp.float32),
                      glnx_ref, blnx_ref, bias_ref, norm)
        h, c = _step_math(gx32, h, c,
                          wh_ref, gln_ref, bln_ref, H, norm)
        y_ref[u_i] = h.astype(y_ref.dtype)
        if stash:
            # c_seq residual for the backward kernel only: inference calls
            # skip this (S, B, H) HBM write entirely.
            c_seq_ref[u_i] = c.astype(c_seq_ref.dtype)
    h_scr[:] = h
    c_scr[:] = c

    # Constant block index over s: stays in VMEM, flushed once per B-block.
    # Writing only on the final step saves two (blk, H) VPU copies per step.
    @pl.when(s == S // U - 1)
    def _flush_state():
        hn_ref[:] = h.astype(hn_ref.dtype)
        cn_ref[:] = c.astype(cn_ref.dtype)


def _pick_blk_b(B: int, H: int, n_bufs: int = 10, itemsize: int = 4) -> int:
    """B-block size bounded by scoped VMEM: Wh plus ~n_bufs live/double-
    buffered (blk, 4H) buffers.  The backward kernel carries roughly twice
    the forward's streams (gx/gh_pre in, dgate/dg_pre out, plus residual
    sequences), so it passes a larger n_bufs — an undersized estimate
    surfaces only as a Mosaic scoped-vmem compile error on real hardware
    (seen at B=256, H=512 with the old fixed count).  itemsize is the
    STREAM dtype's (bf16 streams halve the buffer bytes and let blk grow);
    the f32 gate-math temporaries ride in n_bufs slack."""
    blk = min(B, 512)
    while blk > 8 and (H * 4 * H + n_bufs * blk * 4 * H) * itemsize > 12 * 1024 * 1024:
        blk //= 2
    return max(blk, 8)


@functools.partial(jax.jit, static_argnames=("norm", "stash"))
def _layer_impl(gxp, wh, glnx, blnx, gln, bln, bias, h0, c0, norm: bool,
                stash: bool = True):
    S, B, H4 = gxp.shape
    H = H4 // 4
    # bf16 streams halve buffer bytes but the f32 gate-math temporaries do
    # not shrink: fold them in as extra stream-equivalents.  A forward-only
    # raise to blk=128 at H=512 f32 was re-measured NEUTRAL (851 -> 861 us
    # fwd at S=32, B=256, L=2; bench_results/profile_fwd_blk.py) — the old
    # "+9%" reading did not reproduce, so the shared picker stands.
    itemsize = gxp.dtype.itemsize
    # Four time steps per grid invocation when S allows it (then 2, then 1).
    # The round-3 blk sweep (bench_results/r3_lstm_decomp.json) found the
    # per-step cost is governed by the B-BLOCK, not U: at S=32, B=256,
    # H=512 f32 the kernel runs 195.1 us at blk=64 vs 265.2 at blk=32
    # (stash: 210.7 vs 283.2) — both compiled on real hardware — while U=2
    # vs U=4 is noise at fixed blk.  The old picker charge (12..18 + 4 for
    # U=2) priced this config at blk=32; the charge below keeps blk=64
    # reachable at U<=4 while still refusing the measured scoped-VMEM OOM
    # point (U=8, blk=32, H=512: 16.5MB > the 16MB Mosaic limit).  U is
    # kept at 4 for the per-grid-step overhead amortization at small B.
    U = 4 if S % 4 == 0 else (2 if S % 2 == 0 else 1)
    n_bufs = (8 + 2 * U) if itemsize == 4 else (16 + 3 * U)
    blk = _pick_blk_b(B, H, n_bufs=n_bufs, itemsize=itemsize)
    kernel = functools.partial(_layer_kernel, S=S, H=H, U=U, norm=norm,
                               stash=stash)
    sb = lambda b, s: (s, b, 0)
    const_b = lambda b, s: (b, 0)
    seq_spec = pl.BlockSpec((U, blk, H4), sb, memory_space=pltpu.VMEM)
    out_seq = pl.BlockSpec((U, blk, H), sb, memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((blk, H), const_b, memory_space=pltpu.VMEM)
    full = lambda b, s: (0, 0)
    vec4 = pl.BlockSpec((1, H4), full, memory_space=pltpu.VMEM)
    seq_shape = jax.ShapeDtypeStruct((S, B, H), gxp.dtype)
    state_shape = jax.ShapeDtypeStruct((B, H), gxp.dtype)
    out_shape = ((seq_shape, seq_shape, state_shape, state_shape) if stash
                 else (seq_shape, state_shape, state_shape))
    out_specs = ((out_seq, out_seq, state_spec, state_spec) if stash
                 else (out_seq, state_spec, state_spec))
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(pl.cdiv(B, blk), S // U),
        in_specs=[
            seq_spec,
            pl.BlockSpec((H, H4), full, memory_space=pltpu.VMEM),
            vec4, vec4, vec4, vec4, vec4,
            state_spec, state_spec,
        ],
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((blk, H), jnp.float32),
                        pltpu.VMEM((blk, H), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * S * B * H * H4,
            bytes_accessed=(S * B * H4 + 2 * S * B * H + H * H4) * 4,
            transcendentals=4 * S * B * H,
        ),
        interpret=_ls.INTERPRET,
    )(gxp, wh, glnx.reshape(1, H4), blnx.reshape(1, H4),
      gln.reshape(1, H4), bln.reshape(1, H4), bias.reshape(1, H4), h0, c0)
    if stash:
        return outs
    y, hn, cn = outs
    return y, None, hn, cn


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def lstm_layer_fused(gxp, wh, glnx, blnx, gln, bln, bias, h0, c0,
                     norm: bool = True):
    """One LSTM layer over a full sequence, time loop fused on-chip.

    Args:
      gxp: (S, B, 4H) RAW input projection x @ Wx — the x-side LayerNorm
        and the bias are applied IN-KERNEL (round-2 fold; saves the XLA
        LN_x forward+backward passes over the (S, B, 4H) stream).
      wh:  (H, 4H) recurrent weights (resident in VMEM for all S steps).
      glnx, blnx: (4H,) LayerNorm params for the x-projection.
      gln, bln: (4H,) LayerNorm params for the h-projection.
        (All four are ignored when norm=False — pass ones/zeros.)
      bias: (4H,) gate bias.
      h0, c0: (B, H) initial state.

    Returns (y (S, B, H), h_n (B, H), c_n (B, H)).
    """
    y, _, hn, cn = _layer_impl(gxp, wh, glnx, blnx, gln, bln, bias, h0, c0,
                               norm, stash=False)
    return y, hn, cn


def _layer_fwd(gxp, wh, glnx, blnx, gln, bln, bias, h0, c0, norm: bool):
    y, c_seq, hn, cn = _layer_impl(gxp, wh, glnx, blnx, gln, bln, bias,
                                   h0, c0, norm)
    return (y, hn, cn), (gxp, wh, glnx, blnx, gln, bln, bias, h0, c0, y,
                         c_seq)


def _bwd_kernel(gx_ref, ghp_ref, cprev_ref, cseq_ref, dy_ref, wh_ref,
                gln_ref, bln_ref, dhn_ref, dcn_ref,
                dgx_ref, dgpre_ref, dh0_ref, dc0_ref, dh_scr, dc_scr,
                *, S: int, H: int, norm: bool):
    """Hand-derived reverse step, whole reverse loop on-chip.

    The TPU analogue of the reference's LstmBackward (lstm.cu:188-379,
    activation_backward + layernorm_backward kernels): Wh stays resident in
    VMEM and the (dh, dc) carry lives in scratch.  Weight gradients are NOT
    accumulated in-kernel: the per-step d(gate) and d(gh_pre) stream out,
    and dWh / dgamma / dbeta become sequence-wide MXU/VPU reductions outside
    (one big GEMM beats S tiny rank-B updates, and revisited-output
    accumulation is not portable to interpret mode).
    """
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init_carry():
        dh_scr[:] = dhn_ref[:].astype(jnp.float32)
        dc_scr[:] = dcn_ref[:].astype(jnp.float32)

    # Recompute the forward's post-GEMM intermediates for step t = S-1-s.
    # All math is f32; bf16 streams are upcast on load, downcast on store.
    gh_pre = ghp_ref[0].astype(jnp.float32)       # (blk, 4H)
    if norm:
        mean, rstd = _ln_stats(gh_pre)            # single-pass, matches fwd
        xhat = (gh_pre - mean) * rstd
        gh = (xhat * gln_ref[:].astype(jnp.float32)
              + bln_ref[:].astype(jnp.float32))
    else:
        gh = gh_pre
    gate = gx_ref[0].astype(jnp.float32) + gh
    sfo = jax.nn.sigmoid(gate[:, :3 * H])         # one pass over i|f|o
    si, sf, so = sfo[:, :H], sfo[:, H:2 * H], sfo[:, 2 * H:3 * H]
    su = jnp.tanh(gate[:, 3 * H:])
    c_prev = cprev_ref[0].astype(jnp.float32)
    tc = jnp.tanh(cseq_ref[0].astype(jnp.float32))  # tanh(c_t)

    # Cell backward.
    dh = dh_scr[:] + dy_ref[0].astype(jnp.float32)
    dc = dc_scr[:] + dh * so * (1.0 - tc * tc)
    dgate = jnp.concatenate([
        (dc * su) * si * (1.0 - si),
        (dc * c_prev) * sf * (1.0 - sf),
        (dh * tc) * so * (1.0 - so),
        (dc * si) * (1.0 - su * su),
    ], axis=-1)                                   # (blk, 4H) f32
    dgx_ref[0] = dgate.astype(dgx_ref.dtype)

    # LayerNorm backward (feature axis = 4H lanes).
    if norm:
        dxhat = dgate * gln_ref[:].astype(jnp.float32)
        m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
        m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
        dg_pre = rstd * (dxhat - m1 - xhat * m2)
    else:
        dg_pre = dgate
    dgpre_ref[0] = dg_pre.astype(dgpre_ref.dtype)

    # Carry to step t-1: dh via Wh^T (MXU), dc via the forget gate.
    dh_scr[:] = jax.lax.dot_general(
        dg_pre.astype(wh_ref.dtype), wh_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=None)
    dc_scr[:] = dc * sf

    # Constant-index blocks flush at grid end; write once at t = 0 (saves
    # two (blk, H) VPU copies on every other step).
    @pl.when(s == S - 1)
    def _flush_state():
        dh0_ref[:] = dh_scr[:].astype(dh0_ref.dtype)
        dc0_ref[:] = dc_scr[:].astype(dc0_ref.dtype)


@functools.partial(jax.jit, static_argnames=("norm",))
def _bwd_impl(gx, gh_pre_seq, c_prev, c_seq, dy, wh, gln, bln, dhn, dcn,
              norm: bool):
    S, B, H4 = gx.shape
    H = H4 // 4
    itemsize = gx.dtype.itemsize
    blk = _pick_blk_b(B, H, n_bufs=18 if itemsize == 4 else 24,
                      itemsize=itemsize)
    kernel = functools.partial(_bwd_kernel, S=S, H=H, norm=norm)
    rev = lambda b, s: (S - 1 - s, b, 0)
    const_b = lambda b, s: (b, 0)
    full = lambda b, s: (0, 0)
    seq4 = pl.BlockSpec((1, blk, H4), rev, memory_space=pltpu.VMEM)
    seq1 = pl.BlockSpec((1, blk, H), rev, memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((blk, H), const_b, memory_space=pltpu.VMEM)
    vec4 = pl.BlockSpec((1, H4), full, memory_space=pltpu.VMEM)
    dgx, dg_pre_seq, dh0, dc0 = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((S, B, H4), gx.dtype),
                   jax.ShapeDtypeStruct((S, B, H4), gx.dtype),
                   jax.ShapeDtypeStruct((B, H), gx.dtype),
                   jax.ShapeDtypeStruct((B, H), gx.dtype)),
        grid=(pl.cdiv(B, blk), S),
        in_specs=[seq4, seq4, seq1, seq1, seq1,
                  pl.BlockSpec((H, H4), full, memory_space=pltpu.VMEM),
                  vec4, vec4, state_spec, state_spec],
        out_specs=(seq4, seq4, state_spec, state_spec),
        scratch_shapes=[pltpu.VMEM((blk, H), jnp.float32),
                        pltpu.VMEM((blk, H), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=6 * S * B * H * H4,
            bytes_accessed=(5 * S * B * H4 + 4 * S * B * H + H * H4) * 4,
            transcendentals=5 * S * B * H,
        ),
        interpret=_ls.INTERPRET,
    )(gx, gh_pre_seq, c_prev, c_seq, dy, wh,
      gln.reshape(1, H4), bln.reshape(1, H4), dhn, dcn)
    return dgx, dg_pre_seq, dh0, dc0


def _bwd_kernel_v2(gxp_ref, yprev_ref, cprev_ref, dy_ref, wh_ref,
                   glnx_ref, blnx_ref, gln_ref, bln_ref, bias_ref,
                   h0_ref, c0_ref, dhn_ref, dcn_ref,
                   dgxp_ref, dgpre_ref, dgln_ref, dglnx_ref, dsum_ref,
                   dh0_ref, dc0_ref,
                   dh_scr, dc_scr, *, S: int, B: int, H: int, norm: bool):
    """Single-pass reverse loop: forward recompute + LN grads on-chip.

    V2 of the hand-derived backward (see _bwd_kernel for the streaming V1).
    Instead of materializing gh_pre = h_prev @ Wh in HBM and reducing the LN
    grads in separate XLA passes, this kernel
      - streams h_prev (= y shifted by one step) and recomputes gh_pre on
        the MXU in-kernel,
      - recomputes c_t = f*c_prev + i*u from the gates so only the SHIFTED
        c stream is read (one (S,B,H) read instead of two),
      - recomputes the x-side gate LN from the RAW gxp stream and emits
        d(gxp) directly (round-2 LN_x fold: no XLA LN_x backward passes),
      - accumulates dgamma_h/dgamma_x/sum(dgate) into revisited
        constant-index output blocks that live in VMEM for the whole grid
        (sum(dgate) serves dbeta_x, dbeta_h AND dbias — all three are
        Σ dgate since the gate is linear in each).
    d(gh_pre) still streams out and dWh is one sequence-wide MXU GEMM
    outside: a fully-fused variant that accumulated dWh in-kernel was
    measured SLOWER (3208 vs 2676 us at S=32,B=256,H=512,L=2) — the
    per-step (H, 4H) outer-product update is MXU-latency-bound at blk-deep
    contraction, and the second resident (H,4H) block forces blk down to 32.
    HBM traffic drops from ~39 to ~20 (S*B*H)-float units per layer.
    """
    b, s = pl.program_id(0), pl.program_id(1)
    t_is_0 = s == S - 1          # reverse grid: step s handles t = S-1-s

    @pl.when(s == 0)
    def _init_carry():
        dh_scr[:] = dhn_ref[:].astype(jnp.float32)
        dc_scr[:] = dcn_ref[:].astype(jnp.float32)

    @pl.when((b == 0) & (s == 0))
    def _init_accum():
        dgln_ref[:] = jnp.zeros_like(dgln_ref)
        dglnx_ref[:] = jnp.zeros_like(dglnx_ref)
        dsum_ref[:] = jnp.zeros_like(dsum_ref)

    # h_prev stays in the stream dtype for the MXU recompute (for bf16 this
    # is exactly the rounding the forward's GEMM input saw); everything
    # after the GEMM is f32.
    h_prev = jnp.where(t_is_0, h0_ref[:], yprev_ref[0])
    c_prev = jnp.where(t_is_0, c0_ref[:],
                       cprev_ref[0]).astype(jnp.float32)
    blk = h_prev.shape[0]
    if B % blk:
        # Ragged last block: zero-substitute padding rows on load.  Stream
        # OUTPUTS are bounds-clipped by Pallas, but the dWh/dgamma/dbeta
        # accumulators sum over every block row, and uninitialized VMEM can
        # be NaN (NaN*0 = NaN), so the substitution must happen before any
        # math.  With these rows zeroed, their dgate rows are exactly zero
        # and contribute nothing to the accumulators.
        valid = (b * blk + jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0)
                 ) < B
        h_prev = jnp.where(valid, h_prev, 0.0)
        c_prev = jnp.where(valid, c_prev, 0.0)
    else:
        valid = None

    # Recompute the forward's step t intermediates (same ops, same ambient
    # matmul precision as the forward kernel -> matching values).
    gh_pre = jax.lax.dot_general(
        h_prev, wh_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=None)
    if norm:
        mean, rstd = _ln_stats(gh_pre)            # single-pass, matches fwd
        xhat = (gh_pre - mean) * rstd
        gh = (xhat * gln_ref[:].astype(jnp.float32)
              + bln_ref[:].astype(jnp.float32))
    else:
        gh = gh_pre

    # x-side gate recompute from the raw projection (matches _xgate).
    # Padding rows must be zeroed BEFORE the LN stats: uninitialized VMEM
    # can be NaN and the dglnx accumulator sums over every block row
    # (NaN * 0 = NaN — same hazard as h_prev above).
    gxp = gxp_ref[0].astype(jnp.float32)
    if valid is not None:
        gxp = jnp.where(valid, gxp, 0.0)
    if norm:
        meanx, rstdx = _ln_stats(gxp)
        xhatx = (gxp - meanx) * rstdx
        gate_x = (xhatx * glnx_ref[:].astype(jnp.float32)
                  + blnx_ref[:].astype(jnp.float32)
                  + bias_ref[:].astype(jnp.float32))
    else:
        gate_x = gxp + bias_ref[:].astype(jnp.float32)
    gate = gate_x + gh
    if valid is not None:
        gate = jnp.where(valid, gate, 0.0)      # NaN-proof transcendentals
    sfo = jax.nn.sigmoid(gate[:, :3 * H])         # one pass over i|f|o
    si, sf, so = sfo[:, :H], sfo[:, H:2 * H], sfo[:, 2 * H:3 * H]
    su = jnp.tanh(gate[:, 3 * H:])
    c_t = sf * c_prev + si * su
    tc = jnp.tanh(c_t)

    # Cell backward.
    dh = dh_scr[:] + dy_ref[0].astype(jnp.float32)
    if valid is not None:
        dh = jnp.where(valid, dh, 0.0)
    dc = dc_scr[:] + dh * so * (1.0 - tc * tc)
    if valid is not None:
        dc = jnp.where(valid, dc, 0.0)
    dgate = jnp.concatenate([
        (dc * su) * si * (1.0 - si),
        (dc * c_prev) * sf * (1.0 - sf),
        (dh * tc) * so * (1.0 - so),
        (dc * si) * (1.0 - su * su),
    ], axis=-1)                                   # (blk, 4H) f32

    # x-side LayerNorm backward: d(gxp) streams out in place of d(gate).
    if norm:
        dxhatx = dgate * glnx_ref[:].astype(jnp.float32)
        m1x = jnp.mean(dxhatx, axis=-1, keepdims=True)
        m2x = jnp.mean(dxhatx * xhatx, axis=-1, keepdims=True)
        dgxp = rstdx * (dxhatx - m1x - xhatx * m2x)
        dglnx_ref[:] += jnp.sum(dgate * xhatx, axis=0, keepdims=True)
    else:
        dgxp = dgate
    dgxp_ref[0] = dgxp.astype(dgxp_ref.dtype)
    dsum_ref[:] += jnp.sum(dgate, axis=0, keepdims=True)

    # h-side LayerNorm backward + in-VMEM param-grad accumulation (f32).
    if norm:
        dxhat = dgate * gln_ref[:].astype(jnp.float32)
        m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
        m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
        dg_pre = rstd * (dxhat - m1 - xhat * m2)
        dgln_ref[:] += jnp.sum(dgate * xhat, axis=0, keepdims=True)
    else:
        dg_pre = dgate
    dgpre_ref[0] = dg_pre.astype(dgpre_ref.dtype)

    # Carry to step t-1: dh via Wh^T (MXU), dc via the forget gate.
    dh_scr[:] = jax.lax.dot_general(
        dg_pre.astype(wh_ref.dtype), wh_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=None)
    dc_scr[:] = dc * sf

    # Constant-index blocks flush at grid end; write once at t = 0.
    @pl.when(t_is_0)
    def _flush_state():
        dh0_ref[:] = dh_scr[:].astype(dh0_ref.dtype)
        dc0_ref[:] = dc_scr[:].astype(dc0_ref.dtype)


# V2 VMEM model: Wh resident ((H,4H), stream dtype) + ~12 double-buffered
# (blk, 4H)-equivalent stream buffers (gxp in, dgxp/dgpre out, y/c/dy
# shifted streams — stream dtype) + ~8 live (blk, 4H) f32 gate-math
# temporaries (gh_pre/xhat/xhatx/gate/dgate/dxhat/dxhatx/dg_pre — always
# f32 regardless of streams; +2 over round 1 for the in-kernel LN_x fold).
def _v2_vmem_bytes(blk: int, H: int, itemsize: int = 4) -> int:
    return (H * 4 * H + 12 * blk * 4 * H) * itemsize + 8 * blk * 4 * H * 4


# 15MB: the blk=64 point at H=512 f32 models to 14.7MB and was compiled and
# measured on real hardware (454.5 us vs 616.5 at blk=32, S=32 B=256 —
# round-3 blk sweep); the old 14MB budget priced it out.
_V2_VMEM_BUDGET = 15 * 1024 * 1024


def _bwd_fits_v2(B: int, H: int, itemsize: int = 4) -> bool:
    # B gate: V2 trades one extra per-step MXU product (the gh_pre
    # recompute) for ~2x less HBM traffic — a win only when the streams are
    # big enough to dominate (measured v5e fwd+grad: S=32,B=256,H=512,L=2:
    # 2263 vs 2673 us; S=64,B=3,H=384,L=3: 409 vs 373 us).
    return (B >= 64 and
            _v2_vmem_bytes(_pick_blk_b_v2(B, H, itemsize), H, itemsize)
            <= _V2_VMEM_BUDGET)


def _pick_blk_b_v2(B: int, H: int, itemsize: int = 4) -> int:
    blk = min(B, 256)
    while blk > 8 and _v2_vmem_bytes(blk, H, itemsize) > _V2_VMEM_BUDGET:
        blk //= 2
    return max(blk, 8)


@functools.partial(jax.jit, static_argnames=("norm",))
def _bwd_impl_v2(gxp, y, c_seq, dy, wh, glnx, blnx, gln, bln, bias,
                 h0, c0, dhn, dcn, norm: bool):
    S, B, H4 = gxp.shape
    H = H4 // 4
    blk = _pick_blk_b_v2(B, H, gxp.dtype.itemsize)
    kernel = functools.partial(_bwd_kernel_v2, S=S, B=B, H=H, norm=norm)
    rev = lambda b, s: (S - 1 - s, b, 0)
    # Stream at t-1 (clamped at 0; the t==0 step selects h0/c0 in-kernel).
    rev_m1 = lambda b, s: (jnp.maximum(S - 2 - s, 0), b, 0)
    const_b = lambda b, s: (b, 0)
    full = lambda b, s: (0, 0)
    seq4 = pl.BlockSpec((1, blk, H4), rev, memory_space=pltpu.VMEM)
    seq1 = pl.BlockSpec((1, blk, H), rev, memory_space=pltpu.VMEM)
    seq1_m1 = pl.BlockSpec((1, blk, H), rev_m1, memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((blk, H), const_b, memory_space=pltpu.VMEM)
    vec4 = pl.BlockSpec((1, H4), full, memory_space=pltpu.VMEM)
    dgxp, dg_pre_seq, dgln, dglnx, dsum, dh0, dc0 = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((S, B, H4), gxp.dtype),
                   jax.ShapeDtypeStruct((S, B, H4), gxp.dtype),
                   jax.ShapeDtypeStruct((1, H4), jnp.float32),
                   jax.ShapeDtypeStruct((1, H4), jnp.float32),
                   jax.ShapeDtypeStruct((1, H4), jnp.float32),
                   jax.ShapeDtypeStruct((B, H), gxp.dtype),
                   jax.ShapeDtypeStruct((B, H), gxp.dtype)),
        grid=(pl.cdiv(B, blk), S),
        in_specs=[seq4, seq1_m1, seq1_m1, seq1,
                  pl.BlockSpec((H, H4), full, memory_space=pltpu.VMEM),
                  vec4, vec4, vec4, vec4, vec4,
                  state_spec, state_spec, state_spec, state_spec],
        out_specs=(seq4, seq4, vec4, vec4, vec4, state_spec, state_spec),
        scratch_shapes=[pltpu.VMEM((blk, H), jnp.float32),
                        pltpu.VMEM((blk, H), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=6 * S * B * H * H4,
            bytes_accessed=(3 * S * B * H4 + 3 * S * B * H + H * H4) * 4,
            transcendentals=6 * S * B * H,
        ),
        interpret=_ls.INTERPRET,
    )(gxp, y, c_seq, dy, wh, glnx.reshape(1, H4), blnx.reshape(1, H4),
      gln.reshape(1, H4), bln.reshape(1, H4), bias.reshape(1, H4),
      h0, c0, dhn, dcn)
    return dgxp, dg_pre_seq, dgln, dglnx, dsum, dh0, dc0


def _layer_bwd(norm: bool, res, ct):
    """Backward via the on-chip reverse-loop kernel.

    V2 path (when two (H, 4H) blocks fit in scoped VMEM): everything —
    gh_pre recompute, x-side LN recompute, cell+LN backward,
    dgamma/dbeta/dbias accumulation — runs inside one Pallas kernel; HBM
    sees only the gxp/y/c/dy input streams and the dgxp/dgpre outputs.
    V1 fallback: the gh_pre recompute is one sequence-wide MXU GEMM
    (mirroring the forward's hoisted x @ Wx) and the x-side gate + LN_x
    backward are sequence-wide XLA passes here (cheap at the small-B shapes
    that route to V1); the kernel streams out per-step d(gate) and
    d(gh_pre), from which dWh and the LN-param grads are sequence-wide
    reductions.  (A pure-jnp lax.scan version of this backward measured
    ~415us at the reference config vs ~150us forward — per-step XLA loop
    overhead, not math, dominates; hence the kernels.)
    """
    gxp, wh, glnx, blnx, gln, bln, bias, h0, c0, y, c_seq = res
    dy, dhn, dcn = ct
    B, H = h0.shape
    if _bwd_fits_v2(B, H, gxp.dtype.itemsize):
        dgxp, dg_pre_seq, dgln, dglnx, dsum, dh0, dc0 = _bwd_impl_v2(
            gxp, y, c_seq, dy, wh, glnx, blnx, gln, bln, bias,
            h0, c0, dhn, dcn, norm)
        # dWh as two sequence-wide MXU GEMMs on the un-shifted stashes
        # (h_prev_t = y_{t-1} for t>0, h0 for t=0) — no concat materialization.
        dwh = (jnp.einsum("bh,bg->hg", h0, dg_pre_seq[0])
               + jnp.einsum("sbh,sbg->hg", y[:-1], dg_pre_seq[1:]))
        dsum_v = dsum.reshape(-1)
        if norm:
            # Σ dgate serves dbeta_x, dbeta_h and dbias alike (the gate is
            # linear in each).
            return (dgxp, dwh,
                    dglnx.reshape(-1).astype(glnx.dtype),
                    dsum_v.astype(blnx.dtype),
                    dgln.reshape(-1).astype(gln.dtype),
                    dsum_v.astype(bln.dtype),
                    dsum_v.astype(bias.dtype), dh0, dc0)
        return (dgxp, dwh, jnp.zeros_like(glnx), jnp.zeros_like(blnx),
                jnp.zeros_like(gln), jnp.zeros_like(bln),
                dsum_v.astype(bias.dtype), dh0, dc0)

    # ----- V1 fallback -----
    # x-side gate recompute in XLA with the same single-pass stats the
    # forward kernel used.  Stream dtype is kept (for bf16 this rounds
    # gate_x by ~1 bf16 ulp vs the forward's in-kernel f32 value — V1+bf16
    # only occurs at small B where grad tolerances are loose).
    gxp32 = gxp.astype(jnp.float32)
    if norm:
        meanx, rstdx = _ln_stats(gxp32)
        xhatx = (gxp32 - meanx) * rstdx
        gx = (xhatx * glnx.astype(jnp.float32) + blnx.astype(jnp.float32)
              + bias.astype(jnp.float32)).astype(gxp.dtype)
    else:
        gx = (gxp32 + bias.astype(jnp.float32)).astype(gxp.dtype)
    # h_prev/c_prev per step: state BEFORE step t.
    h_prev = jnp.concatenate([h0[None], y[:-1]], axis=0)
    c_prev = jnp.concatenate([c0[None], c_seq[:-1]], axis=0)
    # f32 output even for bf16 streams: the forward's in-kernel GEMM
    # accumulated in f32, and the V1 backward's LN/gate recompute reads this
    # — a bf16-rounded gh_pre would perturb rstd/sigmoids by ~8e-3 relative.
    gh_pre_seq = jnp.einsum("sbh,hg->sbg", h_prev, wh,
                            preferred_element_type=jnp.float32)

    dgate, dg_pre_seq, dh0, dc0 = _bwd_impl(
        gx, gh_pre_seq, c_prev, c_seq, dy, wh, gln, bln, dhn, dcn, norm)
    dwh = jnp.einsum("sbh,sbg->hg", h_prev, dg_pre_seq)
    dgate32 = dgate.astype(jnp.float32)
    dbias = jnp.sum(dgate32, axis=(0, 1)).astype(bias.dtype)
    if norm:
        # h-side: xhat recomputed sequence-wide (one fused elementwise +
        # reduce pass over (S, B, 4H)); x-side: LN_x backward on dgate.
        # Stats and reductions in f32 even for bf16 streams.
        ghp32 = gh_pre_seq.astype(jnp.float32)
        mean, rstd = _ln_stats(ghp32)             # single-pass, matches fwd
        xhat = (ghp32 - mean) * rstd
        dgln = jnp.sum(dgate32 * xhat, axis=(0, 1)).astype(gln.dtype)
        dbln = dbias.astype(bln.dtype)
        dxhatx = dgate32 * glnx.astype(jnp.float32)
        m1x = jnp.mean(dxhatx, axis=-1, keepdims=True)
        m2x = jnp.mean(dxhatx * xhatx, axis=-1, keepdims=True)
        dgxp = (rstdx * (dxhatx - m1x - xhatx * m2x)).astype(gxp.dtype)
        dglnx = jnp.sum(dgate32 * xhatx, axis=(0, 1)).astype(glnx.dtype)
        dblnx = dbias.astype(blnx.dtype)
    else:
        dgxp = dgate
        dgln = jnp.zeros_like(gln)
        dbln = jnp.zeros_like(bln)
        dglnx = jnp.zeros_like(glnx)
        dblnx = jnp.zeros_like(blnx)
    return dgxp, dwh, dglnx, dblnx, dgln, dbln, dbias, dh0, dc0


lstm_layer_fused.defvjp(_layer_fwd, _layer_bwd)


def supports(S: int, B: int, H: int, dtype) -> bool:
    """Fused-layer dispatch gate: TPU (or interpret mode), f32 or bf16
    streams (gate math is always f32 in-kernel), H a lane multiple, Wh
    resident in VMEM."""
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    itemsize = jnp.dtype(dtype).itemsize
    return ((on_tpu or _ls.INTERPRET)
            and dtype in (jnp.float32, jnp.bfloat16)
            and H % 128 == 0
            and H * 4 * H * itemsize <= _WH_VMEM_BUDGET
            and S >= 8)
