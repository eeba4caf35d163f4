"""Property sweep: generalized lambda-returns across gamma/lambda/T grids and
per-element tensor coefficients (SURVEY.md §7 'hard parts' — the
associative-scan reformulation must hold on the full parameter domain)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from di_hpc_tpu import ops, origin


def _np_mfv(v_tp1, rewards, gammas, lambdas):
    T = rewards.shape[0]
    res = np.zeros_like(rewards)
    res[-1] = rewards[-1] + gammas[-1] * v_tp1[-1]
    for t in reversed(range(T - 1)):
        d = gammas[t] * lambdas[t]
        res[t] = rewards[t] + d * res[t + 1] + (gammas[t] - d) * v_tp1[t]
    return res


@pytest.mark.parametrize("T", [1, 2, 5, 33])
@pytest.mark.parametrize("gamma", [0.0, 0.5, 0.99, 1.0])
@pytest.mark.parametrize("lam", [0.0, 0.5, 1.0])
def test_scalar_sweep(T, gamma, lam, key):
    B = 4
    k1, k2 = jax.random.split(key)
    value = jax.random.normal(k1, (T + 1, B))
    reward = jax.random.normal(k2, (T, B))
    want = _np_mfv(np.asarray(value)[1:], np.asarray(reward),
                   np.full((T, B), gamma), np.full((T, B), lam))
    got_o = origin.generalized_lambda_returns(value, reward, gamma, lam)
    got_f = ops.generalized_lambda_returns(value, reward, gamma, lam,
                                           method="associative")
    np.testing.assert_allclose(got_o, want, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(got_f, want, rtol=2e-4, atol=1e-5)


def test_tensor_coefficients(key):
    """Per-element (T, B) gammas/lambdas (the UPGO case generalized)."""
    T, B = 21, 5
    ks = jax.random.split(key, 4)
    value = jax.random.normal(ks[0], (T + 1, B))
    reward = jax.random.normal(ks[1], (T, B))
    gammas = jax.random.uniform(ks[2], (T, B))
    lambdas = (jax.random.uniform(ks[3], (T, B)) > 0.5).astype(jnp.float32)
    want = _np_mfv(np.asarray(value)[1:], np.asarray(reward),
                   np.asarray(gammas), np.asarray(lambdas))
    got_o = origin.generalized_lambda_returns(value, reward, gammas, lambdas)
    got_f = ops.generalized_lambda_returns(value, reward, gammas, lambdas,
                                           method="associative")
    np.testing.assert_allclose(got_o, want, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(got_f, want, rtol=2e-4, atol=1e-5)
