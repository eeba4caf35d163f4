"""Fully-fused Pallas kernels (rl_scans, categorical) via interpret mode,
including custom-VJP parity with jnp autodiff and end-to-end fused-op routing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import di_hpc_tpu.pallas_kernels.linear_scan as ls
from di_hpc_tpu import ops, origin


@pytest.fixture
def interpret():
    ls.INTERPRET = True
    yield
    ls.INTERPRET = False


def test_gae_fused_kernel(interpret, key):
    from di_hpc_tpu.pallas_kernels.rl_scans import gae_fused_pallas
    T, B = 48, 160
    k1, k2 = jax.random.split(key)
    value = jax.random.normal(k1, (T + 1, B))
    reward = jax.random.normal(k2, (T, B))
    want = origin.gae(origin.gae_data(value, reward), 0.99, 0.97)
    got = gae_fused_pallas(value, reward, 0.99, 0.97)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_lambda_returns_kernel(interpret, key):
    from di_hpc_tpu.pallas_kernels.rl_scans import lambda_returns_pallas
    T, B = 40, 144
    k1, k2 = jax.random.split(key)
    value = jax.random.normal(k1, (T + 1, B))
    reward = jax.random.normal(k2, (T, B))
    want = origin.generalized_lambda_returns(value, reward, 0.9, 0.8)
    got = lambda_returns_pallas(value, reward, 0.9, 0.8)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_vtrace_returns_adv_kernel(interpret, key):
    from di_hpc_tpu.pallas_kernels.rl_scans import vtrace_returns_adv_pallas
    T, B = 36, 136
    ks = jax.random.split(key, 5)
    value = jax.random.normal(ks[0], (T + 1, B))
    reward = jax.random.normal(ks[1], (T, B))
    IS = jnp.exp(jax.random.normal(ks[2], (T, B)) * 0.3)
    rhos = jnp.minimum(IS, 1.0); cs = jnp.minimum(IS, 1.0); pg = jnp.minimum(IS, 1.0)
    want_ret = origin.vtrace_nstep_return(rhos, cs, reward, value, 0.99, 0.95)
    want_adv = origin.vtrace_advantage(
        pg, reward, jnp.concatenate([want_ret[1:], value[-1:]], 0), value[:-1], 0.99)
    got_ret, got_adv = vtrace_returns_adv_pallas(rhos, cs, pg, reward, value, 0.99, 0.95)
    np.testing.assert_allclose(got_ret, want_ret, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got_adv, want_adv, rtol=1e-4, atol=1e-5)


def test_categorical_kernel_forward(interpret, key):
    from di_hpc_tpu.pallas_kernels.categorical import logp_entropy_pallas
    from di_hpc_tpu.origin.ppo import categorical_entropy, categorical_log_prob
    T, B, N = 6, 24, 17
    k1, k2 = jax.random.split(key)
    logits = jax.random.normal(k1, (T, B, N)) * 3
    act = jax.random.randint(k2, (T, B), 0, N)
    lp, ent = logp_entropy_pallas(logits, act)
    np.testing.assert_allclose(lp, categorical_log_prob(logits, act),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ent, categorical_entropy(logits),
                               rtol=1e-4, atol=1e-5)


def test_categorical_kernel_vjp(interpret, key):
    from di_hpc_tpu.pallas_kernels.categorical import logp_entropy_pallas
    from di_hpc_tpu.origin.ppo import categorical_entropy, categorical_log_prob
    B, N = 40, 13
    k1, k2, k3, k4 = jax.random.split(key, 4)
    logits = jax.random.normal(k1, (B, N)) * 2
    act = jax.random.randint(k2, (B,), 0, N)
    wl = jax.random.normal(k3, (B,))
    we = jax.random.normal(k4, (B,))

    def f_pallas(x):
        lp, ent = logp_entropy_pallas(x, act)
        return jnp.sum(lp * wl) + jnp.sum(ent * we)

    def f_jnp(x):
        return (jnp.sum(categorical_log_prob(x, act) * wl)
                + jnp.sum(categorical_entropy(x) * we))

    np.testing.assert_allclose(f_pallas(logits), f_jnp(logits), rtol=1e-4)
    g_p = jax.grad(f_pallas)(logits)
    g_j = jax.grad(f_jnp)(logits)
    np.testing.assert_allclose(g_p, g_j, rtol=1e-4, atol=1e-5)


def test_categorical_kernel_bf16(interpret, key):
    """bf16 logits: f32 math in VMEM, f32 logp/entropy, bf16 gradient."""
    from di_hpc_tpu.pallas_kernels.categorical import logp_entropy_pallas
    from di_hpc_tpu.origin.ppo import categorical_entropy, categorical_log_prob
    B, N = 32, 21
    k1, k2 = jax.random.split(key)
    logits = jax.random.normal(k1, (B, N), jnp.bfloat16)
    act = jax.random.randint(k2, (B,), 0, N)
    lp, ent = logp_entropy_pallas(logits, act)
    assert lp.dtype == jnp.float32
    ref_lp = categorical_log_prob(logits.astype(jnp.float32), act)
    ref_ent = categorical_entropy(logits.astype(jnp.float32))
    np.testing.assert_allclose(lp, ref_lp, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(ent, ref_ent, rtol=2e-2, atol=2e-2)
    g = jax.grad(lambda x: jnp.sum(logp_entropy_pallas(x, act)[0]))(logits)
    assert g.dtype == jnp.bfloat16
    g_ref = jax.grad(lambda x: jnp.sum(
        categorical_log_prob(x.astype(jnp.float32), act)))(logits)
    np.testing.assert_allclose(np.asarray(g, np.float32),
                               np.asarray(g_ref, np.float32),
                               rtol=5e-2, atol=2e-2)


def test_fused_ops_route_through_kernels(interpret, key):
    """End-to-end: ops.* with interpret-forced Pallas backends match oracles
    (fresh shapes to avoid earlier jit cache entries from the non-fused path)."""
    T, B, N = 44, 152, 11
    ks = jax.random.split(key, 5)
    value = jax.random.normal(ks[0], (T + 1, B))
    reward = jax.random.normal(ks[1], (T, B))
    np.testing.assert_allclose(
        ops.gae(ops.gae_data(value, reward)),
        origin.gae(origin.gae_data(value, reward)), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        float(ops.td_lambda_error(ops.td_lambda_data(value, reward, None))),
        float(origin.td_lambda_error(origin.td_lambda_data(value, reward, None))),
        rtol=1e-4)
    to = jax.random.normal(ks[2], (T, B, N)); bo = jax.random.normal(ks[3], (T, B, N))
    act = jax.random.randint(ks[4], (T, B), 0, N)
    got = ops.vtrace_error(ops.vtrace_data(to, bo, act, value, reward, None))
    want = origin.vtrace_error(origin.vtrace_data(to, bo, act, value, reward, None))
    np.testing.assert_allclose([float(x) for x in got],
                               [float(x) for x in want], rtol=1e-4, atol=1e-5)
    # grads through the fused categorical head
    g_f = jax.grad(lambda t: ops.vtrace_error(
        ops.vtrace_data(t, bo, act, value, reward, None)).policy_loss)(to)
    g_o = jax.grad(lambda t: origin.vtrace_error(
        origin.vtrace_data(t, bo, act, value, reward, None)).policy_loss)(to)
    np.testing.assert_allclose(g_f, g_o, rtol=1e-4, atol=1e-5)


def test_fused_ppo_routes(interpret, key):
    B, N = 48, 19
    ks = jax.random.split(key, 7)
    ln = jax.random.normal(ks[0], (B, N)); lo = jax.random.normal(ks[1], (B, N))
    act = jax.random.randint(ks[2], (B,), 0, N)
    vn = jax.random.normal(ks[3], (B,)); vo = jax.random.normal(ks[4], (B,))
    adv = jax.random.normal(ks[5], (B,)); ret = jax.random.normal(ks[6], (B,))
    got_l, got_i = ops.ppo_error(ops.ppo_data(ln, lo, act, vn, vo, adv, ret, None))
    want_l, want_i = origin.ppo_error(origin.ppo_data(ln, lo, act, vn, vo, adv, ret, None))
    np.testing.assert_allclose([float(x) for x in got_l],
                               [float(x) for x in want_l], rtol=1e-4, atol=1e-5)
    g_f = jax.grad(lambda x: ops.ppo_error(
        ops.ppo_data(x, lo, act, vn, vo, adv, ret, None))[0].policy_loss)(ln)
    g_o = jax.grad(lambda x: origin.ppo_error(
        origin.ppo_data(x, lo, act, vn, vo, adv, ret, None))[0].policy_loss)(ln)
    np.testing.assert_allclose(g_f, g_o, rtol=1e-4, atol=1e-5)
