"""Multi-device tests on an 8-virtual-device CPU mesh: batch-sharded losses
equal single-device results; time-sharded scans equal unsharded (the
capability the reference never had — SURVEY.md §2.5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from di_hpc_tpu import ops, origin, parallel

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


@needs_8
def test_mesh_construction():
    m = parallel.make_mesh()
    assert m.shape == {"data": 8}
    m2 = parallel.make_mesh({"time": 4, "data": -1})
    assert m2.shape == {"time": 4, "data": 2}


@needs_8
@pytest.mark.parametrize("tshards", [2, 4, 8])
@pytest.mark.slow
def test_time_sharded_scan_splits(tshards, key):
    mesh = parallel.make_mesh({"time": tshards, "data": 8 // tshards})
    T, B = 48, 16
    k1, k2 = jax.random.split(key)
    a = jax.random.normal(k1, (T, B))
    b = jax.random.uniform(k2, (T, B), minval=-0.99, maxval=0.99)
    ref = ops.linear_recurrence_reverse(a, b, method="scan")
    got = parallel.linear_recurrence_reverse_sharded(
        a, b, mesh, time_axis="time",
        batch_axis="data" if tshards < 8 else None)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@needs_8
@pytest.mark.parametrize("direction", ["rev", "fwd"])
@pytest.mark.slow
def test_time_sharded_scan(direction, key):
    mesh = parallel.make_mesh({"time": 4, "data": 2})
    T, B = 64, 16
    k1, k2 = jax.random.split(key)
    a = jax.random.normal(k1, (T, B))
    b = jax.random.uniform(k2, (T, B), minval=-0.99, maxval=0.99)
    if direction == "rev":
        ref = ops.linear_recurrence_reverse(a, b, method="scan")
        got = parallel.linear_recurrence_reverse_sharded(
            a, b, mesh, time_axis="time", batch_axis="data")
    else:
        ref = ops.linear_recurrence_forward(a, b, method="scan")
        got = parallel.linear_recurrence_forward_sharded(
            a, b, mesh, time_axis="time", batch_axis="data")
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@needs_8
@pytest.mark.slow
def test_gae_time_sharded(key):
    mesh = parallel.make_mesh({"time": 8})
    T, B = 128, 8
    k1, k2 = jax.random.split(key)
    value = jax.random.normal(k1, (T + 1, B))
    reward = jax.random.normal(k2, (T, B))
    ref = origin.gae(origin.gae_data(value, reward))
    got = parallel.gae_time_sharded(value, reward, mesh)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@needs_8
@pytest.mark.slow
def test_td_lambda_time_sharded(key):
    mesh = parallel.make_mesh({"time": 4, "data": 2})
    T, B = 64, 16
    k1, k2, k3 = jax.random.split(key, 3)
    value = jax.random.normal(k1, (T + 1, B))
    reward = jax.random.normal(k2, (T, B))
    weight = jax.random.uniform(k3, (B,), minval=0.3, maxval=2.0)
    ref = origin.td_lambda_error(origin.td_lambda_data(value, reward, weight), 0.9, 0.8)
    got = parallel.td_lambda_error_time_sharded(
        value, reward, weight, mesh, 0.9, 0.8, batch_axis="data")
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


@needs_8
@pytest.mark.slow
def test_vtrace_time_sharded(key):
    mesh = parallel.make_mesh({"time": 4, "data": 2})
    T, B, N = 32, 8, 6
    ks = jax.random.split(key, 5)
    to = jax.random.normal(ks[0], (T, B, N)); bo = jax.random.normal(ks[1], (T, B, N))
    act = jax.random.randint(ks[2], (T, B), 0, N)
    value = jax.random.normal(ks[3], (T + 1, B)); reward = jax.random.normal(ks[4], (T, B))
    data = ops.vtrace_data(to, bo, act, value, reward, None)
    ref = origin.vtrace_error(data)
    got = parallel.vtrace_error_time_sharded(data, mesh, batch_axis="data")
    for r, g in zip(ref, got):
        np.testing.assert_allclose(float(g), float(r), rtol=1e-4)
    # gradient path survives the distributed scan (targets are stop-grad)
    g_to = jax.grad(lambda t: parallel.vtrace_error_time_sharded(
        ops.vtrace_data(t, bo, act, value, reward, None), mesh).policy_loss)(to)
    g_ref = jax.grad(lambda t: origin.vtrace_error(
        ops.vtrace_data(t, bo, act, value, reward, None)).policy_loss)(to)
    np.testing.assert_allclose(g_to, g_ref, rtol=1e-4, atol=1e-6)


@needs_8
@pytest.mark.slow
def test_upgo_time_sharded(key):
    mesh = parallel.make_mesh({"time": 8})
    T, B, N = 40, 6, 5
    ks = jax.random.split(key, 5)
    to = jax.random.normal(ks[0], (T, B, N))
    rhos = jnp.exp(jax.random.normal(ks[1], (T, B)) * 0.2)
    act = jax.random.randint(ks[2], (T, B), 0, N)
    rew = jax.random.normal(ks[3], (T, B))
    value = jax.random.normal(ks[4], (T + 1, B))
    ref = origin.upgo_loss(to, rhos, act, rew, value)
    got = parallel.upgo_loss_time_sharded(to, rhos, act, rew, value, mesh)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-4)


@needs_8
def test_data_parallel_vtrace_global_mean(key):
    mesh = parallel.make_mesh({"data": 8})
    T, B, N = 16, 32, 6
    ks = jax.random.split(key, 5)
    to = jax.random.normal(ks[0], (T, B, N)); bo = jax.random.normal(ks[1], (T, B, N))
    act = jax.random.randint(ks[2], (T, B), 0, N)
    value = jax.random.normal(ks[3], (T + 1, B)); reward = jax.random.normal(ks[4], (T, B))
    data = ops.vtrace_data(to, bo, act, value, reward, None)
    ref = ops.vtrace_error(data)
    dp = parallel.data_parallel(
        ops.vtrace_error, mesh, ops.vtrace_data(1, 1, 1, 1, 1, None))
    got = dp(data)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(float(g), float(r), rtol=1e-5)


@needs_8
def test_data_parallel_ppo_and_td(key):
    mesh = parallel.make_mesh({"data": 8})
    B, N, nstep = 64, 10, 3
    ks = jax.random.split(key, 8)
    ln = jax.random.normal(ks[0], (B, N)); lo = jax.random.normal(ks[1], (B, N))
    act = jax.random.randint(ks[2], (B,), 0, N)
    vn = jax.random.normal(ks[3], (B,)); vo = jax.random.normal(ks[4], (B,))
    adv = jax.random.normal(ks[5], (B,)); ret = jax.random.normal(ks[6], (B,))
    data = ops.ppo_data(ln, lo, act, vn, vo, adv, ret, None)
    ref_l, ref_i = ops.ppo_error(data)
    dp = parallel.data_parallel(ops.ppo_error, mesh,
                                ops.ppo_data(0, 0, 0, 0, 0, 0, 0, None))
    got_l, got_i = dp(data)
    np.testing.assert_allclose([float(x) for x in got_l],
                               [float(x) for x in ref_l], rtol=1e-5)

    q = jax.random.normal(ks[0], (B, N)); nq = jax.random.normal(ks[1], (B, N))
    rew = jax.random.normal(ks[5], (nstep, B))
    done = (jax.random.uniform(ks[6], (B,)) > 0.5).astype(jnp.float32)
    tdata = ops.q_nstep_td_data(q, nq, act, act, rew, done, None)
    ref = ops.q_nstep_td_error(tdata, 0.95, nstep)
    dp_td = parallel.data_parallel(
        ops.q_nstep_td_error, mesh, ops.q_nstep_td_data(0, 0, 0, 0, 1, 0, None))
    got = dp_td(tdata, 0.95, nstep)
    np.testing.assert_allclose(float(got[0]), float(ref[0]), rtol=1e-5)
    np.testing.assert_allclose(got[1], ref[1], rtol=1e-5)


@needs_8
def test_sharded_grad_matches(key):
    """Gradients through a batch-sharded vtrace equal single-device grads."""
    mesh = parallel.make_mesh({"data": 8})
    T, B, N = 8, 16, 5
    ks = jax.random.split(key, 5)
    to = jax.random.normal(ks[0], (T, B, N)); bo = jax.random.normal(ks[1], (T, B, N))
    act = jax.random.randint(ks[2], (T, B), 0, N)
    value = jax.random.normal(ks[3], (T + 1, B)); reward = jax.random.normal(ks[4], (T, B))

    def total(to_):
        l = ops.vtrace_error(ops.vtrace_data(to_, bo, act, value, reward, None))
        return l.policy_loss + l.value_loss

    g_ref = jax.grad(total)(to)
    to_sharded = parallel.shard_batch_pytree(mesh, to, 1)
    g_sh = jax.grad(total)(to_sharded)
    np.testing.assert_allclose(g_sh, g_ref, rtol=1e-5, atol=1e-7)
