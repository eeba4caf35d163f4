"""GAE: fused vs oracle vs hand-rolled numpy (reference config T=1024, B=64,
tests/test_gae.py:10-11 — shrunk here for CPU CI; the full size runs in bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from di_hpc_tpu import ops, origin


def _np_gae(value, reward, gamma, lam):
    T = reward.shape[0]
    delta = reward + gamma * value[1:] - value[:-1]
    adv = np.zeros_like(reward)
    g, denom = 0.0, 0.0
    for t in reversed(range(T)):
        denom = 1 + lam * denom
        g = denom * delta[t] + gamma * lam * g
        adv[t] = g / denom
    return adv


@pytest.mark.parametrize("gamma,lam", [(0.99, 0.97), (0.9, 0.8), (1.0, 1.0), (0.95, 0.0)])
def test_gae_matches_numpy(gamma, lam, key):
    T, B = 57, 8
    k1, k2 = jax.random.split(key)
    value = jax.random.normal(k1, (T + 1, B))
    reward = jax.random.normal(k2, (T, B))
    want = _np_gae(np.asarray(value), np.asarray(reward), gamma, lam)
    got_oracle = origin.gae(origin.gae_data(value, reward), gamma, lam)
    got_fused = ops.gae(ops.gae_data(value, reward), gamma, lam, method="associative")
    np.testing.assert_allclose(got_oracle, want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got_fused, want, rtol=1e-4, atol=1e-5)


def test_gae_large_T(key):
    T, B = 1024, 16
    k1, k2 = jax.random.split(key)
    value = jax.random.normal(k1, (T + 1, B))
    reward = jax.random.normal(k2, (T, B))
    o = origin.gae(origin.gae_data(value, reward))
    f = ops.gae(ops.gae_data(value, reward), method="associative")
    np.testing.assert_allclose(o, f, rtol=2e-4, atol=2e-5)


def test_gae_wrapper_shape_check(key):
    mod = ops.GAE(16, 4)
    k1, k2 = jax.random.split(key)
    value = jax.random.normal(k1, (17, 4))
    reward = jax.random.normal(k2, (16, 4))
    out = mod(value, reward)
    assert out.shape == (16, 4)
    with pytest.raises(AssertionError):
        mod(value[:-1], reward)


def test_gae_is_stop_gradient(key):
    k1, k2 = jax.random.split(key)
    value = jax.random.normal(k1, (9, 3))
    reward = jax.random.normal(k2, (8, 3))
    g = jax.grad(lambda v: jnp.sum(ops.gae(ops.gae_data(v, reward))))(value)
    assert float(jnp.abs(g).max()) == 0.0
