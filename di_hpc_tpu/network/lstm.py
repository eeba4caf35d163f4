"""Fused LayerNorm-LSTM (TPU-native).

The reference implements this as cuBLAS GEMMs + hand-written LN/activation/
dropout kernels with a host-side time loop (src/torch_utils/network/lstm.cu:
29-186) and a fully hand-derived backward (lstm.cu:188-379).  The TPU design:

 - hoist the input projection x @ Wx for the WHOLE sequence into one large
   MXU GEMM per layer (the reference does the same hoist, lstm.cu:121-123),
   and apply its LayerNorm sequence-wide in the same fused pass;
 - run the inherently sequential part (h @ Wh + LN + gate activations) under
   `jax.lax.scan`, which XLA compiles to a single fused loop body — the
   per-step kernel-launch overhead that dominates the CUDA version (S*L
   launches) does not exist;
 - gradients (x, wx, wh, bias, LN gamma/beta, h0, c0) come from JAX autodiff
   through the scan, replacing ~190 lines of hand-derived CUDA backward;
 - inter-layer dropout uses stateless jax.random (replaces cuRAND +
   /dev/urandom seeding, lstm.cu:10-27).

Parameter pytree and gate order (i, f, o, u) are shared with the oracle
(di_hpc_tpu.origin.rnn.LSTMParams).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from di_hpc_tpu.origin.rnn import (
    LSTMParams,
    init_lstm_params,
    layer_norm,
)
from di_hpc_tpu.pallas_kernels import lstm_cell as _lstm_cell

__all__ = [
    "lstm_fused", "LSTM", "LSTMParams", "init_lstm_params",
    "flatten_lstm_params", "unflatten_lstm_params",
]


def flatten_lstm_params(params: LSTMParams):
    """Export params to the reference's flattened layout
    (hpc_rll/torch_utils/network/rnn.py:93-115): wx/wh/bias are flat 1-D
    concatenations over layers; LN params are (L, 8H) packing [x-norm 4H |
    h-norm 4H].  Returns (wx, wh, bias, ln_gamma, ln_beta); LN entries are
    None for no-norm params."""
    wx = jnp.concatenate([w.reshape(-1) for w in params.wx])
    wh = jnp.concatenate([w.reshape(-1) for w in params.wh])
    bias = params.bias.reshape(-1)
    if params.ln_gamma_x is None:
        return wx, wh, bias, None, None
    ln_gamma = jnp.concatenate([params.ln_gamma_x, params.ln_gamma_h], axis=1)
    ln_beta = jnp.concatenate([params.ln_beta_x, params.ln_beta_h], axis=1)
    return wx, wh, bias, ln_gamma, ln_beta


def unflatten_lstm_params(wx, wh, bias, ln_gamma, ln_beta,
                          input_size: int, hidden_size: int,
                          num_layers: int) -> LSTMParams:
    """Import params from the reference's flattened layout (inverse of
    flatten_lstm_params) — lets reference users carry weights over."""
    H = hidden_size
    dims = [input_size] + [H] * num_layers
    wx_l, off = [], 0
    for l in range(num_layers):
        n = dims[l] * 4 * H
        wx_l.append(jnp.asarray(wx)[off:off + n].reshape(dims[l], 4 * H))
        off += n
    wh_l = [jnp.asarray(wh)[l * H * 4 * H:(l + 1) * H * 4 * H].reshape(H, 4 * H)
            for l in range(num_layers)]
    bias_a = jnp.asarray(bias).reshape(num_layers, 4 * H)
    if ln_gamma is None:
        return LSTMParams(tuple(wx_l), tuple(wh_l), bias_a, None, None, None, None)
    lg = jnp.asarray(ln_gamma)
    lb = jnp.asarray(ln_beta)
    return LSTMParams(tuple(wx_l), tuple(wh_l), bias_a,
                      lg[:, :4 * H], lb[:, :4 * H],
                      lg[:, 4 * H:], lb[:, 4 * H:])


@functools.partial(jax.jit, static_argnames=("norm_type", "dropout", "remat"))
def lstm_fused(
    params: LSTMParams,
    inputs: jax.Array,                                        # (S, B, input_size)
    prev_state: Optional[Tuple[jax.Array, jax.Array]] = None, # each (L, B, H)
    norm_type: Optional[str] = "LN",
    dropout: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
    remat: bool = False,
):
    """Returns (output (S, B, H), (h (L, B, H), c (L, B, H)))."""
    from di_hpc_tpu.ops._validate import _fail
    if inputs.ndim != 3:
        _fail("lstm_fused",
              f"inputs must be (S, B, input_size); got {inputs.shape}")
    S, B = inputs.shape[:2]
    L = len(params.wx)
    H = params.wh[0].shape[0]
    if inputs.shape[2] != params.wx[0].shape[0]:
        _fail("lstm_fused",
              f"inputs feature dim {inputs.shape[2]} != layer-0 wx input dim "
              f"{params.wx[0].shape[0]}")
    if prev_state is None:
        zeros = jnp.zeros((L, B, H), inputs.dtype)
        prev_state = (zeros, zeros)
    H0, C0 = prev_state
    if H0.shape != (L, B, H) or C0.shape != (L, B, H):
        _fail("lstm_fused",
              f"prev_state arrays must have shape (L, B, H) = {(L, B, H)}; "
              f"got {H0.shape} and {C0.shape}")

    x = inputs
    hs, cs = [], []
    for l in range(L):
        wx_l, wh_l = params.wx[l], params.wh[l]
        bias_l = params.bias[l]

        # Sequence-wide input projection: one (S*B, in) @ (in, 4H) MXU GEMM.
        # The x-side LayerNorm + bias are folded INTO the fused kernel
        # (round 2): the raw projection feeds it directly, so XLA never
        # pays LN_x's forward/backward passes over the (S, B, 4H) stream.
        gxp = jnp.einsum("sbi,ih->sbh", x, wx_l,
                         preferred_element_type=x.dtype)

        if norm_type == "LN":
            g_x, b_x = params.ln_gamma_x[l], params.ln_beta_x[l]
            g_h, b_h = params.ln_gamma_h[l], params.ln_beta_h[l]
        else:
            g_x = b_x = g_h = b_h = None

        if (not remat and wh_l.dtype == gxp.dtype
                and _lstm_cell.supports(S, B, H, gxp.dtype)):
            # Whole-layer Pallas kernel: Wh + hidden state resident in VMEM
            # across all S steps (custom VJP; on-chip reverse-loop backward
            # reads the stashed h/c sequences, mirroring the reference's
            # stashed-ifog LstmBackward, lstm.cu:188-379).  bf16 inputs take
            # this path natively (bf16 streams, f32 gate math + f32 h/c
            # carry in scratch); mixed param/stream dtypes fall back to the
            # scan so custom-VJP cotangent dtypes stay consistent.
            ones4h = jnp.ones((4 * H,), gxp.dtype)
            zeros4h = jnp.zeros((4 * H,), gxp.dtype)
            x, h_l, c_l = _lstm_cell.lstm_layer_fused(
                gxp, wh_l,
                g_x if g_x is not None else ones4h,
                b_x if b_x is not None else zeros4h,
                g_h if g_h is not None else ones4h,
                b_h if b_h is not None else zeros4h,
                bias_l,
                H0[l].astype(gxp.dtype), C0[l].astype(gxp.dtype),
                norm_type == "LN")
        else:
            gx = gxp
            if norm_type == "LN":
                gx = layer_norm(gx, g_x, b_x)
            gx = gx + bias_l
            def step(carry, gx_t, wh_l=wh_l, g_h=g_h, b_h=b_h):
                h, c = carry
                gh = h @ wh_l
                if g_h is not None:
                    gh = layer_norm(gh, g_h, b_h)
                gate = gx_t + gh
                i, f, o, u = jnp.split(gate, 4, axis=-1)
                i = jax.nn.sigmoid(i)
                f = jax.nn.sigmoid(f)
                o = jax.nn.sigmoid(o)
                u = jnp.tanh(u)
                c_new = f * c + i * u
                h_new = o * jnp.tanh(c_new)
                return (h_new, c_new), h_new

            if remat:
                # Trade FLOPs for HBM: recompute cell activations in the
                # backward instead of stashing them (the reference stashes
                # ifog per step, torch_utils/network/rnn.py:124-127).
                step = jax.checkpoint(step)
            (h_l, c_l), x = jax.lax.scan(step, (H0[l], C0[l]), gx)

        hs.append(h_l)
        cs.append(c_l)

        if dropout > 0.0 and l != L - 1:
            assert dropout_key is not None, "dropout requires a PRNG key"
            dropout_key, sub = jax.random.split(dropout_key)
            keep = jax.random.bernoulli(sub, 1.0 - dropout, x.shape)
            x = jnp.where(keep, x / (1.0 - dropout), 0.0)

    return x, (jnp.stack(hs), jnp.stack(cs))


class LSTM:
    """Shape-static wrapper mirroring the reference module API
    (hpc_rll/torch_utils/network/rnn.py:52-141): constructed with
    (seq_len, batch_size, input_size, hidden_size, num_layers).

    Unlike the reference it is stateless w.r.t. parameters — params are an
    explicit pytree (init via .init(key)), which is what makes the module
    jit/grad/shard-transparent.
    """

    def __init__(self, seq_len: int, batch_size: int, input_size: int,
                 hidden_size: int, num_layers: int,
                 norm_type: Optional[str] = "LN", dropout: float = 0.0):
        self.seq_len = seq_len
        self.batch_size = batch_size
        self.input_size = input_size
        self.hidden_size = hidden_size
        self.num_layers = num_layers
        self.norm_type = norm_type
        self.dropout = dropout

    def init(self, key: jax.Array) -> LSTMParams:
        return init_lstm_params(key, self.input_size, self.hidden_size,
                                self.num_layers, self.norm_type)

    def __call__(self, params: LSTMParams, inputs: jax.Array,
                 prev_state=None, dropout_key=None):
        assert inputs.shape == (self.seq_len, self.batch_size, self.input_size), inputs.shape
        return lstm_fused(params, inputs, prev_state, self.norm_type,
                          self.dropout, dropout_key)

    forward = __call__
