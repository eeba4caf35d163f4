"""TD family: fused vs oracle vs hand-rolled numpy references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from di_hpc_tpu import ops, origin


# ---------------------------------------------------------------------------
# td_lambda
# ---------------------------------------------------------------------------

def _np_lambda_returns(value, reward, gamma, lam):
    T = reward.shape[0]
    res = np.zeros_like(reward)
    res[-1] = reward[-1] + gamma * value[-1]
    for t in reversed(range(T - 1)):
        res[t] = reward[t] + gamma * lam * res[t + 1] + gamma * (1 - lam) * value[t + 1]
    return res


@pytest.mark.parametrize("gamma,lam", [(0.9, 0.8), (0.99, 1.0), (1.0, 0.5)])
def test_td_lambda_matches_numpy(gamma, lam, key):
    T, B = 33, 6
    k1, k2, k3 = jax.random.split(key, 3)
    value = jax.random.normal(k1, (T + 1, B))
    reward = jax.random.normal(k2, (T, B))
    weight = jax.random.uniform(k3, (B,), minval=0.1, maxval=2.0)
    ret = _np_lambda_returns(np.asarray(value), np.asarray(reward), gamma, lam)
    want = 0.5 * np.mean((ret - np.asarray(value)[:-1]) ** 2 * np.asarray(weight))
    got_o = origin.td_lambda_error(origin.td_lambda_data(value, reward, weight), gamma, lam)
    got_f = ops.td_lambda_error(ops.td_lambda_data(value, reward, weight), gamma, lam)
    np.testing.assert_allclose(float(got_o), want, rtol=1e-5)
    np.testing.assert_allclose(float(got_f), want, rtol=1e-5)


def test_td_lambda_gradient_zeroes_last_value(key):
    """Returns are stop-grad; value[T] must receive no gradient (reference
    zeroes it explicitly, td_lambda_kernel.h:49)."""
    T, B = 12, 4
    k1, k2 = jax.random.split(key)
    value = jax.random.normal(k1, (T + 1, B))
    reward = jax.random.normal(k2, (T, B))

    def loss(v):
        return ops.td_lambda_error(ops.td_lambda_data(v, reward, None))

    g = jax.grad(loss)(value)
    assert float(jnp.abs(g[-1]).max()) == 0.0
    assert float(jnp.abs(g[:-1]).max()) > 0.0
    g_o = jax.grad(lambda v: origin.td_lambda_error(origin.td_lambda_data(v, reward, None)))(value)
    np.testing.assert_allclose(g, g_o, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# q_nstep (+rescale)
# ---------------------------------------------------------------------------

def _np_nstep_return(reward, next_v, done, gamma):
    nstep = reward.shape[0]
    fac = gamma ** np.arange(nstep)
    return fac @ reward + gamma ** nstep * next_v * (1 - done)


def test_q_nstep_matches_numpy(key):
    B, N, nstep, gamma = 9, 5, 3, 0.95
    ks = jax.random.split(key, 7)
    q = jax.random.normal(ks[0], (B, N))
    nq = jax.random.normal(ks[1], (B, N))
    act = jax.random.randint(ks[2], (B,), 0, N)
    nact = jax.random.randint(ks[3], (B,), 0, N)
    rew = jax.random.normal(ks[4], (nstep, B))
    done = (jax.random.uniform(ks[5], (B,)) > 0.5).astype(jnp.float32)
    w = jax.random.uniform(ks[6], (B,), minval=0.5, maxval=1.5)

    qn, nqn = np.asarray(q), np.asarray(nq)
    qsa = qn[np.arange(B), np.asarray(act)]
    tgt = _np_nstep_return(np.asarray(rew), nqn[np.arange(B), np.asarray(nact)],
                           np.asarray(done), gamma)
    per = (qsa - tgt) ** 2
    want = np.mean(per * np.asarray(w))

    loss, per_got = ops.q_nstep_td_error(
        ops.q_nstep_td_data(q, nq, act, nact, rew, done, w), gamma, nstep)
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)
    np.testing.assert_allclose(per_got, per, rtol=1e-4, atol=1e-5)

    # Gradient only reaches the taken action of q.
    g = jax.grad(lambda qq: ops.q_nstep_td_error(
        ops.q_nstep_td_data(qq, nq, act, nact, rew, done, w), gamma, nstep)[0])(q)
    mask = np.zeros((B, N)); mask[np.arange(B), np.asarray(act)] = 1
    assert float(jnp.abs(jnp.asarray(g) * (1 - mask)).max()) == 0.0


def test_value_rescale_inverse_pair(key):
    x = jax.random.normal(key, (256,)) * 20
    rt = origin.value_inv_transform(origin.value_transform(x))
    np.testing.assert_allclose(rt, x, rtol=1e-3, atol=1e-3)


def test_q_nstep_rescale_matches_numpy(key):
    B, N, nstep, gamma, eps = 7, 4, 2, 0.9, 1e-2
    ks = jax.random.split(key, 6)
    q = jax.random.normal(ks[0], (B, N))
    nq = jax.random.normal(ks[1], (B, N))
    act = jax.random.randint(ks[2], (B,), 0, N)
    nact = jax.random.randint(ks[3], (B,), 0, N)
    rew = jax.random.normal(ks[4], (nstep, B))
    done = (jax.random.uniform(ks[5], (B,)) > 0.5).astype(jnp.float32)

    def h(x):
        return np.sign(x) * (np.sqrt(np.abs(x) + 1) - 1) + eps * x

    def h_inv(x):
        return np.sign(x) * (((np.sqrt(1 + 4 * eps * (np.abs(x) + 1 + eps)) - 1) / (2 * eps)) ** 2 - 1)

    qn, nqn = np.asarray(q), np.asarray(nq)
    qsa = qn[np.arange(B), np.asarray(act)]
    tgt = h(_np_nstep_return(np.asarray(rew), h_inv(nqn[np.arange(B), np.asarray(nact)]),
                             np.asarray(done), gamma))
    want = np.mean((qsa - tgt) ** 2)
    loss, _ = ops.q_nstep_td_error_with_rescale(
        ops.q_nstep_td_data(q, nq, act, nact, rew, done, None), gamma, nstep)
    np.testing.assert_allclose(float(loss), want, rtol=1e-4)


# ---------------------------------------------------------------------------
# C51
# ---------------------------------------------------------------------------

def test_dist_nstep_matches_numpy(key):
    B, N, n_atom, nstep, gamma = 6, 4, 11, 2, 0.95
    v_min, v_max = -5.0, 5.0
    ks = jax.random.split(key, 6)
    dist = jax.nn.softmax(jax.random.normal(ks[0], (B, N, n_atom)), -1)
    ndist = jax.nn.softmax(jax.random.normal(ks[1], (B, N, n_atom)), -1)
    act = jax.random.randint(ks[2], (B,), 0, N)
    nact = jax.random.randint(ks[3], (B,), 0, N)
    rew = jax.random.normal(ks[4], (nstep, B))
    done = (jax.random.uniform(ks[5], (B,)) > 0.5).astype(jnp.float32)

    # Hand-rolled projection.
    d, nd = np.asarray(dist, np.float64), np.asarray(ndist, np.float64)
    r = (gamma ** np.arange(nstep)) @ np.asarray(rew, np.float64)
    support = np.linspace(v_min, v_max, n_atom)
    delta_z = (v_max - v_min) / (n_atom - 1)
    proj = np.zeros((B, n_atom))
    for i in range(B):
        nd_i = nd[i, int(nact[i])]
        tz = np.clip(r[i] + (1 - float(done[i])) * gamma ** nstep * support, v_min, v_max)
        bb = (tz - v_min) / delta_z
        l, u = np.floor(bb).astype(int), np.ceil(bb).astype(int)
        for j in range(n_atom):
            proj[i, l[j]] += nd_i[j] * (u[j] - bb[j])
            proj[i, u[j]] += nd_i[j] * (bb[j] - l[j])
    logp = np.log(d[np.arange(B), np.asarray(act)])
    per_want = -(logp * proj).sum(-1)
    want = per_want.mean()

    loss, per = ops.dist_nstep_td_error(
        ops.dist_nstep_td_data(dist, ndist, act, nact, rew, done, None),
        gamma, v_min, v_max, n_atom, nstep)
    np.testing.assert_allclose(float(loss), want, rtol=1e-4)
    np.testing.assert_allclose(per, per_want, rtol=1e-4, atol=1e-5)


def test_dist_nstep_integer_landing_drops_mass():
    """Replicates the reference's projection edge case: when the target lands
    exactly on a support atom (l == u), both weights are zero (origin/
    td.py:115-116)."""
    B, N, n_atom = 1, 1, 5
    dist = jnp.full((B, N, n_atom), 0.2)
    ndist = jnp.zeros((B, N, n_atom)).at[0, 0, 2].set(1.0)
    act = jnp.zeros((B,), jnp.int32)
    nact = jnp.zeros((B,), jnp.int32)
    rew = jnp.zeros((1, B))
    done = jnp.ones((B,))  # target_z = reward = 0 -> exactly atom 2 of [-2,2]
    loss, per = ops.dist_nstep_td_error(
        ops.dist_nstep_td_data(dist, ndist, act, nact, rew, done, None),
        0.9, -2.0, 2.0, n_atom, 1)
    assert float(per[0]) == 0.0  # all mass dropped -> zero cross-entropy


# ---------------------------------------------------------------------------
# QR-DQN / IQN
# ---------------------------------------------------------------------------

def test_qrdqn_matches_numpy(key):
    B, N, tau, nstep, gamma = 5, 3, 7, 2, 0.95
    ks = jax.random.split(key, 7)
    q = jax.random.normal(ks[0], (B, N, tau))
    nq = jax.random.normal(ks[1], (B, N, tau))
    act = jax.random.randint(ks[2], (B,), 0, N)
    nact = jax.random.randint(ks[3], (B,), 0, N)
    rew = jax.random.normal(ks[4], (nstep, B))
    done = (jax.random.uniform(ks[5], (B,)) > 0.5).astype(jnp.float32)
    vg = jax.random.uniform(ks[6], (B,), minval=0.5, maxval=1.0)
    tau_hat = (np.arange(tau) + 0.5) / tau

    qn, nqn = np.asarray(q, np.float64), np.asarray(nq, np.float64)
    qsa = qn[np.arange(B), np.asarray(act)][:, :, None]             # (B, tau, 1)
    tq = nqn[np.arange(B), np.asarray(nact)][:, None, :]            # (B, 1, tau)
    r = (gamma ** np.arange(nstep)) @ np.asarray(rew, np.float64)
    tq = r[:, None, None] + np.asarray(vg)[:, None, None] * tq * (1 - np.asarray(done))[:, None, None]
    diff = tq - qsa
    hub = np.where(np.abs(diff) < 1, 0.5 * diff ** 2, np.abs(diff) - 0.5)
    per_want = (hub * np.abs(tau_hat[None, :, None] - (diff <= 0))).sum(-1).mean(1)

    loss, per = ops.qrdqn_nstep_td_error(
        ops.qrdqn_nstep_td_data(q, nq, act, nact, rew, done,
                                jnp.asarray(tau_hat, jnp.float32)[None, :, None], None),
        gamma, nstep, vg)
    np.testing.assert_allclose(per, per_want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(loss), per_want.mean(), rtol=1e-4)


def test_iqn_matches_numpy(key):
    tau, tp, B, N, nstep, gamma, kappa = 5, 6, 4, 3, 2, 0.95, 0.9
    ks = jax.random.split(key, 8)
    q = jax.random.normal(ks[0], (tau, B, N))
    nq = jax.random.normal(ks[1], (tp, B, N))
    act = jax.random.randint(ks[2], (B,), 0, N)
    nact = jax.random.randint(ks[3], (B,), 0, N)
    rew = jax.random.normal(ks[4], (nstep, B))
    done = (jax.random.uniform(ks[5], (B,)) > 0.5).astype(jnp.float32)
    rq = jax.random.uniform(ks[6], (tau, B))
    w = jax.random.uniform(ks[7], (B,), minval=0.5, maxval=1.5)

    qn = np.asarray(q, np.float64); nqn = np.asarray(nq, np.float64)
    per_want = np.zeros(B)
    r = (gamma ** np.arange(nstep)) @ np.asarray(rew, np.float64)
    for i in range(B):
        qs = qn[:, i, int(act[i])]                    # (tau,)
        ts = nqn[:, i, int(nact[i])]                  # (tp,)
        tgt = r[i] + gamma ** nstep * ts * (1 - float(done[i]))
        be = tgt[:, None] - qs[None, :]               # (tp, tau)
        hub = np.where(np.abs(be) <= kappa, 0.5 * be ** 2, kappa * (np.abs(be) - 0.5 * kappa))
        quant = np.abs(np.asarray(rq, np.float64)[:, i][None, :] - (be < 0)) * hub / kappa
        per_want[i] = quant.sum(1).mean(0)
    want = (per_want * np.asarray(w)).mean()

    loss, per = ops.iqn_nstep_td_error(
        ops.iqn_nstep_td_data(q, nq, act, nact, rew, done, rq, w),
        gamma, nstep, kappa)
    np.testing.assert_allclose(per, per_want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(loss), want, rtol=1e-4)


def test_qrdqn_iqn_grads_match_origin(key):
    """The r5 hybrid gathers (take_along_axis fwd + iota-compare custom-VJP
    bwd) must give exactly the oracle's gradients w.r.t. BOTH q tensors."""
    B, N, tau, tp, nstep, gamma = 6, 4, 5, 7, 2, 0.95
    ks = jax.random.split(key, 8)
    act = jax.random.randint(ks[2], (B,), 0, N)
    nact = jax.random.randint(ks[3], (B,), 0, N)
    rew = jax.random.normal(ks[4], (nstep, B))
    done = (jax.random.uniform(ks[5], (B,)) > 0.5).astype(jnp.float32)

    q = jax.random.normal(ks[0], (B, N, tau))
    nq = jax.random.normal(ks[1], (B, N, tau))
    tau_hat = jnp.asarray((np.arange(tau) + 0.5) / tau, jnp.float32)

    def loss_ops(q_, nq_):
        return ops.qrdqn_nstep_td_error(ops.qrdqn_nstep_td_data(
            q_, nq_, act, nact, rew, done, tau_hat, None), gamma, nstep)[0]

    def loss_org(q_, nq_):
        return origin.qrdqn_nstep_td_error(origin.qrdqn_nstep_td_data(
            q_, nq_, act, nact, rew, done, tau_hat, None), gamma, nstep)[0]

    g_ops = jax.grad(loss_ops, argnums=(0, 1))(q, nq)
    g_org = jax.grad(loss_org, argnums=(0, 1))(q, nq)
    for a, b in zip(g_ops, g_org):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    qi = jax.random.normal(ks[0], (tau, B, N))
    nqi = jax.random.normal(ks[1], (tp, B, N))
    rq = jax.random.uniform(ks[6], (tau, B))

    def iloss_ops(q_, nq_):
        return ops.iqn_nstep_td_error(ops.iqn_nstep_td_data(
            q_, nq_, act, nact, rew, done, rq, None), gamma, nstep)[0]

    def iloss_org(q_, nq_):
        return origin.iqn_nstep_td_error(origin.iqn_nstep_td_data(
            q_, nq_, act, nact, rew, done, rq, None), gamma, nstep)[0]

    g_ops = jax.grad(iloss_ops, argnums=(0, 1))(qi, nqi)
    g_org = jax.grad(iloss_org, argnums=(0, 1))(qi, nqi)
    for a, b in zip(g_ops, g_org):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_td_wrapper_classes(key):
    """Reference-style module wrappers run and validate shapes."""
    ks = jax.random.split(key, 6)
    B, N, nstep, tau = 8, 4, 3, 5
    q = jax.random.normal(ks[0], (B, N)); nq = jax.random.normal(ks[1], (B, N))
    act = jax.random.randint(ks[2], (B,), 0, N); nact = jax.random.randint(ks[3], (B,), 0, N)
    rew = jax.random.normal(ks[4], (nstep, B))
    done = (jax.random.uniform(ks[5], (B,)) > 0.5).astype(jnp.float32)
    loss, per = ops.QNStepTD(nstep, B, N)(q, nq, act, nact, rew, done, gamma=0.95)
    assert per.shape == (B,)
    loss2, _ = ops.QNStepTDRescale(nstep, B, N)(q, nq, act, nact, rew, done, gamma=0.95)
    qq = jax.random.normal(ks[0], (B, N, tau))
    nqq = jax.random.normal(ks[1], (B, N, tau))
    l3, p3 = ops.QRDQNNStepTDError(tau, nstep, B, N)(qq, nqq, act, nact, rew, done, gamma=0.95)
    assert p3.shape == (B,)
    iq = jax.random.normal(ks[0], (tau, B, N)); inq = jax.random.normal(ks[1], (tau + 1, B, N))
    rquant = jax.random.uniform(ks[2], (tau, B))
    l4, p4 = ops.IQNNStepTDError(tau, tau + 1, nstep, B, N)(iq, inq, act, nact, rew, done, rquant, gamma=0.95)
    assert p4.shape == (B,)


@pytest.mark.slow
def test_dist_nstep_fuzz_matches_oracle(key):
    """Scatter-free C51 projection (ops) vs the scatter-based oracle across
    random configs: shapes, support ranges, nstep, weights, done patterns."""
    import numpy as np
    from di_hpc_tpu import ops, origin

    for i in range(8):
        cfg_key = jax.random.fold_in(key, i)
        ks = jax.random.split(cfg_key, 8)
        B = int(jax.random.randint(ks[0], (), 2, 33))
        N = int(jax.random.randint(ks[1], (), 2, 17))
        n_atom = int(jax.random.randint(ks[2], (), 2, 61))
        nstep = int(jax.random.randint(ks[3], (), 1, 6))
        v_min, v_max = -float(3 + i), float(2 + i)
        dist = jax.nn.softmax(jax.random.normal(ks[4], (B, N, n_atom)), -1)
        next_dist = jax.nn.softmax(jax.random.normal(ks[5], (B, N, n_atom)), -1)
        act = jax.random.randint(ks[6], (B,), 0, N)
        nact = jax.random.randint(ks[7], (B,), 0, N)
        rew = jax.random.normal(jax.random.fold_in(cfg_key, 101), (nstep, B))
        done = jax.random.uniform(jax.random.fold_in(cfg_key, 102), (B,)) > 0.7
        weight = (None if i % 2 == 0 else
                  jax.random.uniform(jax.random.fold_in(cfg_key, 103), (B,)))
        data = origin.dist_nstep_td_data(dist, next_dist, act, nact, rew, done, weight)
        lf, tdf = ops.dist_nstep_td_error(data, 0.9, v_min, v_max, n_atom, nstep)
        lo, tdo = origin.dist_nstep_td_error(data, 0.9, v_min, v_max, n_atom, nstep)
        np.testing.assert_allclose(lf, lo, rtol=1e-5, atol=1e-6, err_msg=str(i))
        np.testing.assert_allclose(tdf, tdo, rtol=1e-5, atol=1e-5, err_msg=str(i))
        gf = jax.grad(lambda d: ops.dist_nstep_td_error(
            data._replace(dist=d), 0.9, v_min, v_max, n_atom, nstep)[0])(dist)
        go = jax.grad(lambda d: origin.dist_nstep_td_error(
            data._replace(dist=d), 0.9, v_min, v_max, n_atom, nstep)[0])(dist)
        np.testing.assert_allclose(gf, go, rtol=1e-4, atol=1e-5, err_msg=str(i))
