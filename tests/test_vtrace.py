"""V-trace: fused vs oracle vs numpy; stop-gradient boundary checks
(reference config T=B=N=128, tests/test_vtrace.py:11-13)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from di_hpc_tpu import ops, origin


def _np_log_softmax(x):
    x = x - x.max(-1, keepdims=True)
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


def _np_vtrace(to, bo, act, value, reward, gamma, lam, rho_c, c_c, rho_pg):
    T, B, N = to.shape
    lp_t = np.take_along_axis(_np_log_softmax(to), act[..., None], -1)[..., 0]
    lp_b = np.take_along_axis(_np_log_softmax(bo), act[..., None], -1)[..., 0]
    IS = np.exp(lp_t - lp_b)
    rhos = np.minimum(IS, rho_c); cs = np.minimum(IS, c_c); pg = np.minimum(IS, rho_pg)
    deltas = rhos * (reward + gamma * value[1:] - value[:-1])
    item = np.zeros(B)
    ret = value[:-1].copy()
    for t in reversed(range(T)):
        item = deltas[t] + gamma * lam * cs[t] * item
        ret[t] += item
    ret_tp1 = np.concatenate([ret[1:], value[-1:]], 0)
    adv = pg * (reward + gamma * ret_tp1 - value[:-1])
    p = np.exp(_np_log_softmax(to))
    ent = -(p * _np_log_softmax(to)).sum(-1)
    return (-(lp_t * adv).mean(), ((value[:-1] - ret) ** 2).mean(), ent.mean())


@pytest.mark.parametrize("clips", [(1.0, 1.0, 1.0), (0.9, 0.8, 1.2)])
def test_vtrace_matches_numpy(clips, key):
    T, B, N = 19, 6, 8
    gamma, lam = 0.99, 0.95
    ks = jax.random.split(key, 5)
    to = jax.random.normal(ks[0], (T, B, N)); bo = jax.random.normal(ks[1], (T, B, N))
    act = jax.random.randint(ks[2], (T, B), 0, N)
    value = jax.random.normal(ks[3], (T + 1, B)); reward = jax.random.normal(ks[4], (T, B))
    want = _np_vtrace(*(np.asarray(x, np.float64) if np.asarray(x).dtype != np.int32
                        else np.asarray(x) for x in (to, bo, act, value, reward)),
                      gamma, lam, *clips)
    got_o = origin.vtrace_error(origin.vtrace_data(to, bo, act, value, reward, None),
                                gamma, lam, *clips)
    got_f = ops.vtrace_error(ops.vtrace_data(to, bo, act, value, reward, None),
                             gamma, lam, *clips)
    np.testing.assert_allclose([float(x) for x in got_o], want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose([float(x) for x in got_f], want, rtol=1e-4, atol=1e-5)


def test_vtrace_gradients_match_oracle(key):
    T, B, N = 11, 4, 5
    ks = jax.random.split(key, 5)
    to = jax.random.normal(ks[0], (T, B, N)); bo = jax.random.normal(ks[1], (T, B, N))
    act = jax.random.randint(ks[2], (T, B), 0, N)
    value = jax.random.normal(ks[3], (T + 1, B)); reward = jax.random.normal(ks[4], (T, B))

    def total_o(to_, v_):
        l = origin.vtrace_error(origin.vtrace_data(to_, bo, act, v_, reward, None))
        return l.policy_loss + 0.5 * l.value_loss - 0.01 * l.entropy_loss

    def total_f(to_, v_):
        l = ops.vtrace_error(ops.vtrace_data(to_, bo, act, v_, reward, None))
        return l.policy_loss + 0.5 * l.value_loss - 0.01 * l.entropy_loss

    go = jax.grad(total_o, argnums=(0, 1))(to, value)
    gf = jax.grad(total_f, argnums=(0, 1))(to, value)
    np.testing.assert_allclose(gf[0], go[0], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(gf[1], go[1], rtol=1e-4, atol=1e-6)
    # behaviour logits must receive no gradient
    gb = jax.grad(lambda b_: ops.vtrace_error(
        ops.vtrace_data(to, b_, act, value, reward, None)).policy_loss)(bo)
    assert float(jnp.abs(gb).max()) == 0.0


def test_vtrace_weighted(key):
    """Per-element (T, B) weights flow through all three losses."""
    T, B, N = 9, 4, 5
    ks = jax.random.split(key, 6)
    to = jax.random.normal(ks[0], (T, B, N)); bo = jax.random.normal(ks[1], (T, B, N))
    act = jax.random.randint(ks[2], (T, B), 0, N)
    value = jax.random.normal(ks[3], (T + 1, B)); reward = jax.random.normal(ks[4], (T, B))
    w = jax.random.uniform(ks[5], (T, B), minval=0.1, maxval=2.0)
    got = ops.vtrace_error(ops.vtrace_data(to, bo, act, value, reward, w))
    want = origin.vtrace_error(origin.vtrace_data(to, bo, act, value, reward, w))
    np.testing.assert_allclose([float(x) for x in got],
                               [float(x) for x in want], rtol=1e-4, atol=1e-5)
    # weighting changes the losses
    unw = ops.vtrace_error(ops.vtrace_data(to, bo, act, value, reward, None))
    assert abs(float(got.policy_loss) - float(unw.policy_loss)) > 1e-6


def test_vtrace_wrapper(key):
    T, B, N = 8, 3, 4
    ks = jax.random.split(key, 5)
    to = jax.random.normal(ks[0], (T, B, N)); bo = jax.random.normal(ks[1], (T, B, N))
    act = jax.random.randint(ks[2], (T, B), 0, N)
    value = jax.random.normal(ks[3], (T + 1, B)); reward = jax.random.normal(ks[4], (T, B))
    losses = ops.VTrace(T, B, N)(to, bo, act, value, reward)
    assert len(losses) == 3
