"""Actor-critic helper ops (reference hpc_models extension,
tests/test_actor_critic.py configs B=8, entities=182, dim=1024 — shrunk)."""

import jax
import jax.numpy as jnp
import numpy as np

from di_hpc_tpu import models


def test_update_ae(key):
    B, M, D = 5, 12, 8
    k1, k2 = jax.random.split(key)
    ke = jax.random.normal(k1, (B, M, D))
    ae = jax.random.normal(k2, (B, D))
    sample = jnp.array([0, 11, 12, 5, 3])
    entity_num = jnp.array([12, 12, 12, 12, 3])
    out = models.update_ae(ae, ke, sample, entity_num)
    want = np.asarray(ae).copy()
    for b in range(B):
        if int(sample[b]) != int(entity_num[b]):
            want[b] += np.asarray(ke)[b, int(sample[b])]
    np.testing.assert_allclose(out, want, rtol=1e-6)


def test_lstm_activation_matches_manual(key):
    """Gate order i, f, g, o (torch.nn.LSTM layout — differs from the network
    LSTM's i, f, o, u; reference actor_critic_kernel.h:45-48)."""
    B, H = 4, 6
    ks = jax.random.split(key, 4)
    in_x = jax.random.normal(ks[0], (B, 4 * H))
    in_h = jax.random.normal(ks[1], (B, 4 * H))
    bias = jax.random.normal(ks[2], (4 * H,))
    c = jax.random.normal(ks[3], (B, H))
    h_new, c_new = models.lstm_activation(in_x, in_h, bias, jnp.zeros((B, H)), c)

    g = np.asarray(in_x) + np.asarray(in_h) + np.asarray(bias)
    sig = lambda v: 1 / (1 + np.exp(-v))
    i, f, gg, o = np.split(g, 4, axis=1)
    cw = sig(f) * np.asarray(c) + sig(i) * np.tanh(gg)
    hw = sig(o) * np.tanh(cw)
    np.testing.assert_allclose(c_new, cw, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(h_new, hw, rtol=1e-3, atol=1e-4)


def test_lstm_activation_matches_torch_cell(key):
    """Cross-check against torch.nn.LSTM single step (the reference validates
    exactly this way, tests/test_actor_critic.py:120-160)."""
    torch = __import__("torch")
    B, I, H = 3, 5, 4
    lstm = torch.nn.LSTM(I, H, 1)
    x = torch.randn(1, B, I)
    h0 = torch.randn(1, B, H)
    c0 = torch.randn(1, B, H)
    out, (h1, c1) = lstm(x, (h0, c0))
    ih = (x[0] @ lstm.weight_ih_l0.T).detach().numpy()
    hh = (h0[0] @ lstm.weight_hh_l0.T).detach().numpy()
    bias = (lstm.bias_ih_l0 + lstm.bias_hh_l0).detach().numpy()
    h_got, c_got = models.lstm_activation(
        jnp.asarray(ih), jnp.asarray(hh), jnp.asarray(bias),
        jnp.zeros((B, H)), jnp.asarray(c0[0].detach().numpy()))
    np.testing.assert_allclose(h_got, h1[0].detach().numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(c_got, c1[0].detach().numpy(), rtol=1e-4, atol=1e-4)


def test_pre_sample(key):
    B, M, H = 3, 10, 7
    ks = jax.random.split(key, 3)
    mat = jax.random.normal(ks[0], (B, M, H))
    vec = jax.random.normal(ks[1], (B, H))
    mask = jax.random.uniform(ks[2], (B, M)) > 0.4
    out = models.pre_sample(mat, vec, mask)
    want = np.einsum("bmh,bh->bm", np.asarray(mat), np.asarray(vec)) / 0.8
    want = np.where(np.asarray(mask), want, -1e9 / 0.8)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)
