"""LayerNorm-LSTM oracle (pure jnp, naive per-step formulation).

Port of the reference origin LSTM semantics (hpc_rll/origin/rnn.py:115-248):
multi-layer LSTM where each step computes

    gate = LN_x(x_t @ Wx) + LN_h(h @ Wh) + bias
    i, f, o, u = split(gate, 4); i,f,o = sigmoid; u = tanh
    c = f*c + i*u;  h = o*tanh(c)

with optional inter-layer dropout.  Gate order is i, f, o, u — note this
differs from the torch.nn.LSTM i, f, g, o order used by
models.lstm_activation (reference src/models/actor_critic.cu:32-55).

This module owns the parameter pytree shared with the fused implementation in
di_hpc_tpu.network.lstm.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from di_hpc_tpu.utils.constants import LAYERNORM_EPS


class LSTMParams(NamedTuple):
    """Per-layer weight tuples; LN params are None when norm_type is None."""
    wx: Tuple[jax.Array, ...]        # layer l: (dims[l], 4H)
    wh: Tuple[jax.Array, ...]        # layer l: (H, 4H)
    bias: jax.Array                  # (L, 4H)
    ln_gamma_x: Optional[jax.Array]  # (L, 4H)
    ln_beta_x: Optional[jax.Array]   # (L, 4H)
    ln_gamma_h: Optional[jax.Array]  # (L, 4H)
    ln_beta_h: Optional[jax.Array]   # (L, 4H)


def init_lstm_params(
    key: jax.Array,
    input_size: int,
    hidden_size: int,
    num_layers: int,
    norm_type: Optional[str] = "LN",
    dtype=jnp.float32,
) -> LSTMParams:
    """uniform(-g, g) init with g = sqrt(1/hidden_size), LN at identity
    (reference origin/rnn.py:161-167)."""
    assert norm_type in (None, "LN")
    gain = math.sqrt(1.0 / hidden_size)
    dims = [input_size] + [hidden_size] * num_layers
    keys = jax.random.split(key, 2 * num_layers + 1)
    wx = tuple(
        jax.random.uniform(keys[l], (dims[l], 4 * hidden_size), dtype, -gain, gain)
        for l in range(num_layers)
    )
    wh = tuple(
        jax.random.uniform(keys[num_layers + l], (hidden_size, 4 * hidden_size), dtype, -gain, gain)
        for l in range(num_layers)
    )
    bias = jax.random.uniform(keys[-1], (num_layers, 4 * hidden_size), dtype, -gain, gain)
    if norm_type == "LN":
        # Distinct buffers per field (aliased leaves break argument donation).
        def ones():
            return jnp.ones((num_layers, 4 * hidden_size), dtype)

        def zeros():
            return jnp.zeros((num_layers, 4 * hidden_size), dtype)

        return LSTMParams(wx, wh, bias, ones(), zeros(), ones(), zeros())
    return LSTMParams(wx, wh, bias, None, None, None, None)


def layer_norm(x: jax.Array, gamma: jax.Array, beta: jax.Array,
               eps: float = LAYERNORM_EPS) -> jax.Array:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * gamma + beta


def _cell_activation(gate: jax.Array, c: jax.Array, hidden_size: int):
    """Gate order i, f, o, u (reference origin/rnn.py:224-236)."""
    i, f, o, u = jnp.split(gate, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    o = jax.nn.sigmoid(o)
    u = jnp.tanh(u)
    c_new = f * c + i * u
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm(
    params: LSTMParams,
    inputs: jax.Array,                      # (S, B, input_size)
    prev_state: Optional[Tuple[jax.Array, jax.Array]] = None,  # (h0, c0), each (L, B, H)
    norm_type: Optional[str] = "LN",
    dropout: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
):
    """Naive oracle forward: python loop over layers, lax.scan over time with
    per-step matmuls (mirrors the reference's eager loop).

    Returns (output (S, B, H), (h (L, B, H), c (L, B, H))).
    """
    S, B = inputs.shape[:2]
    L = len(params.wx)
    H = params.wh[0].shape[0]
    if prev_state is None:
        zeros = jnp.zeros((L, B, H), inputs.dtype)
        prev_state = (zeros, zeros)
    H0, C0 = prev_state

    x = inputs
    hs, cs = [], []
    for l in range(L):
        wx_l, wh_l, bias_l = params.wx[l], params.wh[l], params.bias[l]

        def step(carry, x_t, wx_l=wx_l, wh_l=wh_l, bias_l=bias_l, l=l):
            h, c = carry
            gx = x_t @ wx_l
            gh = h @ wh_l
            if norm_type == "LN":
                gx = layer_norm(gx, params.ln_gamma_x[l], params.ln_beta_x[l])
                gh = layer_norm(gh, params.ln_gamma_h[l], params.ln_beta_h[l])
            gate = gx + gh + bias_l
            h_new, c_new = _cell_activation(gate, c, H)
            return (h_new, c_new), h_new

        (h_l, c_l), x = jax.lax.scan(step, (H0[l], C0[l]), x)
        hs.append(h_l)
        cs.append(c_l)
        if dropout > 0.0 and l != L - 1:
            assert dropout_key is not None, "dropout requires a PRNG key"
            dropout_key, sub = jax.random.split(dropout_key)
            keep = jax.random.bernoulli(sub, 1.0 - dropout, x.shape)
            x = jnp.where(keep, x / (1.0 - dropout), 0.0)

    return x, (jnp.stack(hs), jnp.stack(cs))


def get_lstm(lstm_type: str, input_size: int, hidden_size: int, num_layers: int = 1,
             norm_type: Optional[str] = "LN", dropout: float = 0.0):
    """Factory mirroring reference get_lstm (origin/rnn.py:298-316).

    Returns (init_fn(key) -> params, apply_fn(params, inputs, prev_state, key))
    where 'normal' is this naive oracle and 'pytorch' a plain (no-LN) LSTM.
    """
    assert lstm_type in ("normal", "pytorch")
    nt = norm_type if lstm_type == "normal" else None

    def init_fn(key):
        return init_lstm_params(key, input_size, hidden_size, num_layers, nt)

    def apply_fn(params, inputs, prev_state=None, dropout_key=None):
        return lstm(params, inputs, prev_state, nt, dropout, dropout_key)

    return init_fn, apply_fn


def sequence_mask(lengths: jax.Array, max_len: Optional[int] = None) -> jax.Array:
    """(B,) lengths -> (B, max_len) bool mask (reference origin/rnn.py:17-35)."""
    lengths = lengths.reshape(-1)
    if max_len is None:
        max_len = int(lengths.max())
    return jnp.arange(max_len)[None, :] < lengths[:, None]
