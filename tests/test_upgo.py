"""UPGO: fused vs oracle vs numpy (reference config T=B=N=256,
tests/test_upgo.py:10-12)."""

import jax
import jax.numpy as jnp
import numpy as np

from di_hpc_tpu import ops, origin


def _np_log_softmax(x):
    x = x - x.max(-1, keepdims=True)
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


def _np_upgo(to, rhos, act, rew, value):
    T, B, N = to.shape
    lam = ((rew + value[1:]) >= value[:-1]).astype(np.float64)
    lam = np.concatenate([lam[1:], np.ones_like(lam[-1:])], 0)
    # generalized lambda returns with gamma = 1
    res = np.zeros_like(rew)
    res[-1] = rew[-1] + value[-1]
    for t in reversed(range(T - 1)):
        res[t] = rew[t] + lam[t] * res[t + 1] + (1 - lam[t]) * value[t + 1]
    adv = rhos * (res - value[:-1])
    lp = np.take_along_axis(_np_log_softmax(to), act[..., None], -1)[..., 0]
    return -(adv * lp).mean()


def test_upgo_matches_numpy(key):
    T, B, N = 23, 5, 7
    ks = jax.random.split(key, 5)
    to = jax.random.normal(ks[0], (T, B, N))
    rhos = jnp.exp(jax.random.normal(ks[1], (T, B)) * 0.2)
    act = jax.random.randint(ks[2], (T, B), 0, N)
    rew = jax.random.normal(ks[3], (T, B))
    value = jax.random.normal(ks[4], (T + 1, B))
    want = _np_upgo(np.asarray(to, np.float64), np.asarray(rhos, np.float64),
                    np.asarray(act), np.asarray(rew, np.float64),
                    np.asarray(value, np.float64))
    got_o = origin.upgo_loss(to, rhos, act, rew, value)
    got_f = ops.upgo_loss(to, rhos, act, rew, value)
    np.testing.assert_allclose(float(got_o), want, rtol=1e-4)
    np.testing.assert_allclose(float(got_f), want, rtol=1e-4)


def test_upgo_gradients_match_oracle(key):
    T, B, N = 9, 4, 5
    ks = jax.random.split(key, 5)
    to = jax.random.normal(ks[0], (T, B, N))
    rhos = jnp.exp(jax.random.normal(ks[1], (T, B)) * 0.2)
    act = jax.random.randint(ks[2], (T, B), 0, N)
    rew = jax.random.normal(ks[3], (T, B))
    value = jax.random.normal(ks[4], (T + 1, B))
    go = jax.grad(lambda t_: origin.upgo_loss(t_, rhos, act, rew, value))(to)
    gf = jax.grad(lambda t_: ops.upgo_loss(t_, rhos, act, rew, value))(to)
    np.testing.assert_allclose(gf, go, rtol=1e-4, atol=1e-6)
    # values/rewards/rhos are advantage inputs only -> no grad through fused op
    gv = jax.grad(lambda v_: ops.upgo_loss(to, rhos, act, rew, v_))(value)
    assert float(jnp.abs(gv).max()) == 0.0


def test_upgo_binary_lambda_extremes(key):
    """All-continue and all-cut traces agree with closed forms."""
    T, B, N = 6, 2, 3
    ks = jax.random.split(key, 3)
    to = jax.random.normal(ks[0], (T, B, N))
    act = jax.random.randint(ks[1], (T, B), 0, N)
    rhos = jnp.ones((T, B))
    # big positive rewards -> trace always continues (lambda = 1): MC returns
    rew = jnp.full((T, B), 10.0)
    value = jnp.zeros((T + 1, B))
    ret = np.asarray(ops.upgo_returns(rew, value))
    mc = np.array([10.0 * (T - t) for t in range(T)])
    np.testing.assert_allclose(ret[:, 0], mc, rtol=1e-5)
