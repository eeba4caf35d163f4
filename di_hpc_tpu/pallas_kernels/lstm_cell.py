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
reverse `lax.scan` over per-step `jax.vjp` pullbacks of the (pure-jnp) cell,
reading the stashed h/c sequences — the TPU analogue of the reference's
hand-derived LstmBackward (lstm.cu:188-379) that re-uses stashed ifog
activations instead of re-running the forward.
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


def _ln(x, gamma, beta):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + LAYERNORM_EPS) * gamma + beta


def _gates(gate, c, H):
    i = jax.nn.sigmoid(gate[:, :H])
    f = jax.nn.sigmoid(gate[:, H:2 * H])
    o = jax.nn.sigmoid(gate[:, 2 * H:3 * H])
    u = jnp.tanh(gate[:, 3 * H:])
    c_new = f * c + i * u
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def _layer_kernel(gx_ref, wh_ref, gln_ref, bln_ref, h0_ref, c0_ref,
                  y_ref, c_seq_ref, hn_ref, cn_ref, h_scr, c_scr,
                  *, H: int, norm: bool):
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    h = h_scr[:]                                   # (blkB, H)
    c = c_scr[:]
    gh = jax.lax.dot_general(
        h, wh_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=None)                            # (blkB, 4H) on the MXU
    if norm:
        gh = _ln(gh, gln_ref[:], bln_ref[:])
    gate = gx_ref[0] + gh
    h_new, c_new = _gates(gate, c, H)
    h_scr[:] = h_new
    c_scr[:] = c_new
    y_ref[0] = h_new
    c_seq_ref[0] = c_new
    # Constant block index over s: stays in VMEM, flushed once per B-block
    # with the final step's value.
    hn_ref[:] = h_new
    cn_ref[:] = c_new


def _pick_blk_b(B: int, H: int) -> int:
    # live VMEM ~ wh + blkB*(4H io + scratch) * 4B * ~6 buffers
    blk = min(B, 512)
    while blk > 8 and (H * 4 * H + 10 * blk * 4 * H) * 4 > 14 * 1024 * 1024:
        blk //= 2
    return max(blk, 8)


@functools.partial(jax.jit, static_argnames=("norm",))
def _layer_impl(gx, wh, gln, bln, h0, c0, norm: bool):
    S, B, H4 = gx.shape
    H = H4 // 4
    blk = _pick_blk_b(B, H)
    kernel = functools.partial(_layer_kernel, H=H, norm=norm)
    sb = lambda b, s: (s, b, 0)
    const_b = lambda b, s: (b, 0)
    seq_spec = pl.BlockSpec((1, blk, H4), sb, memory_space=pltpu.VMEM)
    out_seq = pl.BlockSpec((1, blk, H), sb, memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((blk, H), const_b, memory_space=pltpu.VMEM)
    full = lambda b, s: (0, 0)
    y, c_seq, hn, cn = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((S, B, H), gx.dtype),
                   jax.ShapeDtypeStruct((S, B, H), gx.dtype),
                   jax.ShapeDtypeStruct((B, H), gx.dtype),
                   jax.ShapeDtypeStruct((B, H), gx.dtype)),
        grid=(pl.cdiv(B, blk), S),
        in_specs=[
            seq_spec,
            pl.BlockSpec((H, H4), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H4), full, memory_space=pltpu.VMEM),
            state_spec, state_spec,
        ],
        out_specs=(out_seq, out_seq, state_spec, state_spec),
        scratch_shapes=[pltpu.VMEM((blk, H), jnp.float32),
                        pltpu.VMEM((blk, H), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * S * B * H * H4,
            bytes_accessed=(S * B * H4 + 2 * S * B * H + H * H4) * 4,
            transcendentals=4 * S * B * H,
        ),
        interpret=_ls.INTERPRET,
    )(gx, wh, gln.reshape(1, H4), bln.reshape(1, H4), h0, c0)
    return y, c_seq, hn, cn


def _cell_jnp(h, c, gx_t, wh, gln, bln, norm: bool):
    """Pure-jnp single step (identical math to the kernel) for the VJP."""
    gh = h @ wh
    if norm:
        gh = _ln(gh, gln, bln)
    gate = gx_t + gh
    H = h.shape[-1]
    return _gates(gate, c, H)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def lstm_layer_fused(gx, wh, gln, bln, h0, c0, norm: bool = True):
    """One LSTM layer over a full sequence, time loop fused on-chip.

    Args:
      gx:  (S, B, 4H) pre-computed input gates LN_x(x @ Wx) + bias.
      wh:  (H, 4H) recurrent weights (resident in VMEM for all S steps).
      gln, bln: (4H,) LayerNorm params for the h-projection (pass ones/zeros
        when norm=False; they are ignored).
      h0, c0: (B, H) initial state.

    Returns (y (S, B, H), h_n (B, H), c_n (B, H)).
    """
    y, _, hn, cn = _layer_impl(gx, wh, gln, bln, h0, c0, norm)
    return y, hn, cn


def _layer_fwd(gx, wh, gln, bln, h0, c0, norm: bool):
    y, c_seq, hn, cn = _layer_impl(gx, wh, gln, bln, h0, c0, norm)
    return (y, hn, cn), (gx, wh, gln, bln, h0, c0, y, c_seq)


def _layer_bwd(norm: bool, res, ct):
    gx, wh, gln, bln, h0, c0, y, c_seq = res
    dy, dhn, dcn = ct
    S = gx.shape[0]
    # h_prev/c_prev per step: state BEFORE step t.
    h_prev = jnp.concatenate([h0[None], y[:-1]], axis=0)
    c_prev = jnp.concatenate([c0[None], c_seq[:-1]], axis=0)

    def rstep(carry, xs):
        dh, dc, dwh, dgln, dbln = carry
        gx_t, hp, cp, dy_t = xs
        dh = dh + dy_t
        _, pull = jax.vjp(
            lambda hp_, cp_, g_, w_, ga_, be_: _cell_jnp(hp_, cp_, g_, w_, ga_, be_, norm),
            hp, cp, gx_t, wh, gln, bln)
        dhp, dcp, dgx_t, dwh_t, dgln_t, dbln_t = pull((dh, dc))
        return (dhp, dcp, dwh + dwh_t, dgln + dgln_t, dbln + dbln_t), dgx_t

    zeros = (jnp.zeros_like(wh), jnp.zeros_like(gln), jnp.zeros_like(bln))
    (dh0, dc0, dwh, dgln, dbln), dgx = jax.lax.scan(
        rstep, (dhn, dcn) + zeros, (gx, h_prev, c_prev, dy), reverse=True)
    if not norm:
        dgln = jnp.zeros_like(gln)
        dbln = jnp.zeros_like(bln)
    return dgx, dwh, dgln, dbln, dh0, dc0


lstm_layer_fused.defvjp(_layer_fwd, _layer_bwd)


def supports(S: int, B: int, H: int, dtype) -> bool:
    """Fused-layer dispatch gate: TPU (or interpret mode), f32, H a lane
    multiple, Wh resident in VMEM."""
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    return ((on_tpu or _ls.INTERPRET)
            and dtype == jnp.float32
            and H % 128 == 0
            and H * 4 * H * 4 <= _WH_VMEM_BUDGET
            and S >= 8)
