"""LN-LSTM: fused vs oracle, full gradient parity, dropout, factory
(reference config seq=64, B=3, in=1792, hid=384, L=3, tests/test_lstm.py:10-16
— shrunk for CPU CI; full size runs in bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from di_hpc_tpu import network, origin


@pytest.mark.parametrize("norm_type", ["LN", None])
def test_fused_matches_oracle(norm_type, key):
    S, B, I, H, L = 9, 4, 12, 8, 3
    k1, k2, k3 = jax.random.split(key, 3)
    params = origin.init_lstm_params(k1, I, H, L, norm_type)
    x = jax.random.normal(k2, (S, B, I))
    h0 = jax.random.normal(k3, (L, B, H)) * 0.1
    state = (h0, jnp.zeros_like(h0))
    y0, (ho, co) = origin.lstm(params, x, state, norm_type)
    y1, (hf, cf) = network.lstm_fused(params, x, state, norm_type)
    np.testing.assert_allclose(y1, y0, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(hf, ho, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(cf, co, rtol=1e-4, atol=1e-5)


def test_full_gradient_parity(key):
    """All parameter gradients (wx, wh, bias, LN gamma/beta) match between
    fused and oracle — the parity the reference could only check manually
    (tests/test_lstm.py:49-89)."""
    S, B, I, H, L = 6, 3, 7, 5, 2
    k1, k2 = jax.random.split(key)
    params = origin.init_lstm_params(k1, I, H, L, "LN")
    x = jax.random.normal(k2, (S, B, I))

    def loss_o(p, x_):
        y, (h, c) = origin.lstm(p, x_, None, "LN")
        return jnp.sum(y ** 2) + jnp.sum(h * c)

    def loss_f(p, x_):
        y, (h, c) = network.lstm_fused(p, x_, None, "LN")
        return jnp.sum(y ** 2) + jnp.sum(h * c)

    go = jax.grad(loss_o, argnums=(0, 1))(params, x)
    gf = jax.grad(loss_f, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(go), jax.tree.leaves(gf)):
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=1e-5)


def test_zero_init_state_default(key):
    S, B, I, H, L = 4, 2, 5, 6, 1
    k1, k2 = jax.random.split(key)
    params = origin.init_lstm_params(k1, I, H, L, "LN")
    x = jax.random.normal(k2, (S, B, I))
    y_none, _ = network.lstm_fused(params, x, None, "LN")
    zeros = jnp.zeros((L, B, H))
    y_zero, _ = network.lstm_fused(params, x, (zeros, zeros), "LN")
    np.testing.assert_allclose(y_none, y_zero, rtol=1e-6)


def test_dropout_deterministic_under_key(key):
    S, B, I, H, L = 5, 2, 4, 4, 2
    k1, k2, kd = jax.random.split(key, 3)
    params = origin.init_lstm_params(k1, I, H, L, "LN")
    x = jax.random.normal(k2, (S, B, I))
    y1, _ = network.lstm_fused(params, x, None, "LN", 0.5, kd)
    y2, _ = network.lstm_fused(params, x, None, "LN", 0.5, kd)
    np.testing.assert_allclose(y1, y2)  # same key -> bitwise identical
    y3, _ = network.lstm_fused(params, x, None, "LN", 0.5, jax.random.split(kd)[0])
    assert not np.allclose(y1, y3)


def test_get_lstm_factory(key):
    init_fn, apply_fn = origin.get_lstm("pytorch", 6, 5, num_layers=2)
    params = init_fn(key)
    assert params.ln_gamma_x is None  # 'pytorch' type has no LN
    x = jax.random.normal(key, (3, 2, 6))
    y, (h, c) = apply_fn(params, x)
    assert y.shape == (3, 2, 5) and h.shape == (2, 2, 5)


def test_module_wrapper(key):
    S, B, I, H, L = 4, 2, 5, 6, 2
    mod = network.LSTM(S, B, I, H, L)
    params = mod.init(key)
    x = jax.random.normal(key, (S, B, I))
    y, (h, c) = mod(params, x)
    assert y.shape == (S, B, H)
    with pytest.raises(AssertionError):
        mod(params, x[:, :1])


def test_flatten_roundtrip(key):
    from di_hpc_tpu.network.lstm import flatten_lstm_params, unflatten_lstm_params
    I, H, L = 7, 5, 3
    params = origin.init_lstm_params(key, I, H, L, "LN")
    flat = flatten_lstm_params(params)
    assert flat[0].shape == (I * 4 * H + (L - 1) * H * 4 * H,)
    assert flat[3].shape == (L, 8 * H)
    back = unflatten_lstm_params(*flat, input_size=I, hidden_size=H, num_layers=L)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # no-LN variant
    p2 = origin.init_lstm_params(key, I, H, L, None)
    f2 = flatten_lstm_params(p2)
    assert f2[3] is None
    back2 = unflatten_lstm_params(*f2, input_size=I, hidden_size=H, num_layers=L)
    assert back2.ln_gamma_x is None


def test_remat_matches(key):
    S, B, I, H, L = 6, 3, 7, 5, 2
    k1, k2 = jax.random.split(key)
    params = origin.init_lstm_params(k1, I, H, L, "LN")
    x = jax.random.normal(k2, (S, B, I))

    def loss(p, remat):
        y, _ = network.lstm_fused(p, x, None, "LN", remat=remat)
        return jnp.sum(y ** 2)

    np.testing.assert_allclose(loss(params, False), loss(params, True), rtol=1e-6)
    g0 = jax.grad(lambda p: loss(p, False))(params)
    g1 = jax.grad(lambda p: loss(p, True))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_bf16_lstm(key):
    """bf16 params + inputs run end to end (2x MXU throughput path) and stay
    within bf16 tolerance of the f32 computation."""
    S, B, I, H, L = 6, 4, 8, 8, 2
    k1, k2 = jax.random.split(key)
    params32 = origin.init_lstm_params(k1, I, H, L, "LN")
    params16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params32)
    x32 = jax.random.normal(k2, (S, B, I))
    x16 = x32.astype(jnp.bfloat16)
    y32, _ = network.lstm_fused(params32, x32, None, "LN")
    y16, (h16, c16) = network.lstm_fused(params16, x16, None, "LN")
    assert y16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(y16, np.float32), np.asarray(y32),
                               rtol=0.1, atol=0.1)
    # grads exist in bf16
    g = jax.grad(lambda p: jnp.sum(
        network.lstm_fused(p, x16, None, "LN")[0].astype(jnp.float32)))(params16)
    assert g.bias.dtype == jnp.bfloat16


def test_sequence_mask():
    m = origin.sequence_mask(jnp.array([1, 3, 0]), max_len=4)
    want = np.array([[1, 0, 0, 0], [1, 1, 1, 0], [0, 0, 0, 0]], bool)
    np.testing.assert_array_equal(np.asarray(m), want)


def test_lane_multiple_h_matches_oracle_f32(key):
    """H=128 (lane multiple): on a real TPU this routes through the
    whole-layer Pallas kernel (pallas_kernels/lstm_cell.py); on CPU it takes
    the scan path — either way it must match the oracle under one matmul
    precision (the recurrence is chaotic, so bf16-vs-f32 comparisons
    diverge; see CLAUDE.md)."""
    S, B, I, H, L = 16, 4, 24, 128, 2
    k1, k2, k3 = jax.random.split(key, 3)
    params = origin.init_lstm_params(k1, I, H, L, "LN")
    x = jax.random.normal(k2, (S, B, I))
    h0 = jax.random.normal(k3, (L, B, H)) * 0.1
    state = (h0, jnp.zeros_like(h0))

    with jax.default_matmul_precision("float32"):
        y0, (ho, co) = jax.jit(
            lambda p, xx: origin.lstm(p, xx, state, "LN"))(params, x)
        y1, (hf, cf) = jax.jit(
            lambda p, xx: network.lstm_fused(p, xx, state, "LN"))(params, x)

        def loss_f(p):
            y, (h, c) = network.lstm_fused(p, x, state, "LN")
            return jnp.sum(y ** 2) + jnp.sum(h * c)

        def loss_o(p):
            y, (h, c) = origin.lstm(p, x, state, "LN")
            return jnp.sum(y ** 2) + jnp.sum(h * c)

        gf = jax.jit(jax.grad(loss_f))(params)
        go = jax.jit(jax.grad(loss_o))(params)

    np.testing.assert_allclose(y1, y0, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(hf, ho, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(cf, co, rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(go)):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)
