"""Cross-validation against the upstream reference oracles (torch CPU).

Runs only when the reference tree is mounted at /root/reference: imports the
reference's pure-torch origin implementations (no CUDA needed) and asserts
our jnp oracles reproduce them numerically.  This is the strongest available
parity anchor; downstream, the fused ops are separately tested against our
oracles, closing the chain reference -> origin -> ops.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "hpc_rll")), reason="reference tree absent")

if os.path.isdir(os.path.join(REF, "hpc_rll")):
    sys.path.insert(0, REF)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from di_hpc_tpu import origin as jorigin  # noqa: E402


def _t(x):
    import torch
    return torch.tensor(np.ascontiguousarray(np.asarray(x)))


def test_gae_parity(key):
    from hpc_rll.origin.gae import gae, gae_data
    k1, k2 = jax.random.split(key)
    value = jax.random.normal(k1, (40, 7))
    reward = jax.random.normal(k2, (39, 7))
    want = gae(gae_data(_t(value), _t(reward)), 0.99, 0.95).numpy()
    got = jorigin.gae(jorigin.gae_data(value, reward), 0.99, 0.95)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_td_lambda_parity(key):
    from hpc_rll.origin.td import td_lambda_error, td_lambda_data
    k1, k2, k3 = jax.random.split(key, 3)
    value = jax.random.normal(k1, (21, 5))
    reward = jax.random.normal(k2, (20, 5))
    weight = jax.random.uniform(k3, (5,), minval=0.2, maxval=2.0)
    want = td_lambda_error(td_lambda_data(_t(value), _t(reward), _t(weight)), 0.9, 0.8).item()
    got = float(jorigin.td_lambda_error(jorigin.td_lambda_data(value, reward, weight), 0.9, 0.8))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_q_nstep_parity(key):
    from hpc_rll.origin.td import q_nstep_td_error, q_nstep_td_data
    ks = jax.random.split(key, 7)
    B, N, nstep = 13, 6, 4
    q = jax.random.normal(ks[0], (B, N)); nq = jax.random.normal(ks[1], (B, N))
    act = jax.random.randint(ks[2], (B,), 0, N); nact = jax.random.randint(ks[3], (B,), 0, N)
    rew = jax.random.normal(ks[4], (nstep, B))
    done = (jax.random.uniform(ks[5], (B,)) > 0.5).astype(jnp.float32)
    w = jax.random.uniform(ks[6], (B,), minval=0.2, maxval=2.0)
    import torch
    want, want_per = q_nstep_td_error(
        q_nstep_td_data(_t(q), _t(nq), _t(act).long(), _t(nact).long(),
                        _t(rew), _t(done), _t(w)), 0.95, nstep)
    got, got_per = jorigin.q_nstep_td_error(
        jorigin.q_nstep_td_data(q, nq, act, nact, rew, done, w), 0.95, nstep)
    np.testing.assert_allclose(float(got), want.item(), rtol=1e-5)
    np.testing.assert_allclose(got_per, want_per.numpy(), rtol=1e-4, atol=1e-5)


def test_q_nstep_rescale_parity(key):
    from hpc_rll.origin.td import q_nstep_td_error_with_rescale, q_nstep_td_data
    ks = jax.random.split(key, 6)
    B, N, nstep = 9, 5, 3
    q = jax.random.normal(ks[0], (B, N)); nq = jax.random.normal(ks[1], (B, N))
    act = jax.random.randint(ks[2], (B,), 0, N); nact = jax.random.randint(ks[3], (B,), 0, N)
    rew = jax.random.normal(ks[4], (nstep, B))
    done = (jax.random.uniform(ks[5], (B,)) > 0.5).astype(jnp.float32)
    want, _ = q_nstep_td_error_with_rescale(
        q_nstep_td_data(_t(q), _t(nq), _t(act).long(), _t(nact).long(),
                        _t(rew), _t(done), None), 0.95, nstep)
    got, _ = jorigin.q_nstep_td_error_with_rescale(
        jorigin.q_nstep_td_data(q, nq, act, nact, rew, done, None), 0.95, nstep)
    np.testing.assert_allclose(float(got), want.item(), rtol=1e-4)


def test_dist_nstep_parity(key):
    from hpc_rll.origin.td import dist_nstep_td_error, dist_nstep_td_data
    ks = jax.random.split(key, 6)
    B, N, n_atom, nstep = 8, 4, 51, 3
    dist = jax.nn.softmax(jax.random.normal(ks[0], (B, N, n_atom)), -1)
    ndist = jax.nn.softmax(jax.random.normal(ks[1], (B, N, n_atom)), -1)
    act = jax.random.randint(ks[2], (B,), 0, N); nact = jax.random.randint(ks[3], (B,), 0, N)
    rew = jax.random.normal(ks[4], (nstep, B))
    done = (jax.random.uniform(ks[5], (B,)) > 0.5).astype(jnp.float32)
    want, want_per = dist_nstep_td_error(
        dist_nstep_td_data(_t(dist), _t(ndist), _t(act).long(), _t(nact).long(),
                           _t(rew), _t(done), None), 0.95, -10.0, 10.0, n_atom, nstep)
    got, got_per = jorigin.dist_nstep_td_error(
        jorigin.dist_nstep_td_data(dist, ndist, act, nact, rew, done, None),
        0.95, -10.0, 10.0, n_atom, nstep)
    np.testing.assert_allclose(float(got), want.item(), rtol=1e-4)
    np.testing.assert_allclose(got_per, want_per.numpy(), rtol=1e-4, atol=1e-5)


def test_qrdqn_parity(key):
    from hpc_rll.origin.td import qrdqn_nstep_td_error, qrdqn_nstep_td_data
    ks = jax.random.split(key, 8)
    B, N, tau, nstep = 9, 7, 6, 3
    q = jax.random.normal(ks[0], (B, N, tau)); nq = jax.random.normal(ks[1], (B, N, tau))
    act = jax.random.randint(ks[2], (B,), 0, N); nact = jax.random.randint(ks[3], (B,), 0, N)
    rew = jax.random.normal(ks[4], (nstep, B))
    done = (jax.random.uniform(ks[5], (B,)) > 0.5).astype(jnp.float32)
    w = jax.random.uniform(ks[6], (B,), minval=0.2, maxval=2.0)
    vg = jax.random.uniform(ks[7], (B,), minval=0.5, maxval=1.0)
    # Reference passes scalar tau through to the loss formula
    want, want_per = qrdqn_nstep_td_error(
        qrdqn_nstep_td_data(_t(q), _t(nq), _t(act).long(), _t(nact).long(),
                            _t(rew), _t(done), tau, _t(w)), 0.95, nstep, _t(vg))
    got, got_per = jorigin.qrdqn_nstep_td_error(
        jorigin.qrdqn_nstep_td_data(q, nq, act, nact, rew, done, float(tau), w),
        0.95, nstep, vg)
    np.testing.assert_allclose(float(got), want.item(), rtol=1e-4)
    np.testing.assert_allclose(got_per, want_per.numpy(), rtol=1e-4, atol=1e-4)


def test_iqn_parity(key):
    from hpc_rll.origin.td import iqn_nstep_td_error, iqn_nstep_td_data
    ks = jax.random.split(key, 8)
    tau, tp, B, N, nstep, kappa = 7, 8, 6, 5, 3, 0.9
    q = jax.random.normal(ks[0], (tau, B, N)); nq = jax.random.normal(ks[1], (tp, B, N))
    act = jax.random.randint(ks[2], (B,), 0, N); nact = jax.random.randint(ks[3], (B,), 0, N)
    rew = jax.random.normal(ks[4], (nstep, B))
    done = (jax.random.uniform(ks[5], (B,)) > 0.5).astype(jnp.float32)
    rq = jax.random.uniform(ks[6], (tau, B))
    vg = jax.random.uniform(ks[7], (B,), minval=0.5, maxval=1.0)
    want, want_per = iqn_nstep_td_error(
        iqn_nstep_td_data(_t(q), _t(nq), _t(act).long(), _t(nact).long(),
                          _t(rew), _t(done), _t(rq), None), 0.95, nstep, kappa, _t(vg))
    got, got_per = jorigin.iqn_nstep_td_error(
        jorigin.iqn_nstep_td_data(q, nq, act, nact, rew, done, rq, None),
        0.95, nstep, kappa, vg)
    np.testing.assert_allclose(float(got), want.item(), rtol=1e-4)
    np.testing.assert_allclose(got_per, want_per.numpy(), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("dual", [None, 3.0])
def test_ppo_parity(dual, key):
    from hpc_rll.origin.ppo import ppo_error, ppo_data
    ks = jax.random.split(key, 8)
    B, N = 17, 9
    ln = jax.random.normal(ks[0], (B, N)); lo = jax.random.normal(ks[1], (B, N))
    act = jax.random.randint(ks[2], (B,), 0, N)
    vn = jax.random.normal(ks[3], (B,)); vo = jax.random.normal(ks[4], (B,))
    adv = jax.random.normal(ks[5], (B,)); ret = jax.random.normal(ks[6], (B,))
    want_l, want_i = ppo_error(
        ppo_data(_t(ln), _t(lo), _t(act).long(), _t(vn), _t(vo), _t(adv), _t(ret), None),
        0.2, True, dual)
    got_l, got_i = jorigin.ppo_error(
        jorigin.ppo_data(ln, lo, act, vn, vo, adv, ret, None), 0.2, True, dual)
    np.testing.assert_allclose([float(x) for x in got_l],
                               [x.item() for x in want_l], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose([float(x) for x in got_i],
                               [float(x) for x in want_i], rtol=1e-4, atol=1e-5)


def test_vtrace_parity(key):
    from hpc_rll.origin.vtrace import vtrace_error, vtrace_data
    ks = jax.random.split(key, 5)
    T, B, N = 14, 6, 7
    to = jax.random.normal(ks[0], (T, B, N)); bo = jax.random.normal(ks[1], (T, B, N))
    act = jax.random.randint(ks[2], (T, B), 0, N)
    value = jax.random.normal(ks[3], (T + 1, B)); reward = jax.random.normal(ks[4], (T, B))
    want = vtrace_error(vtrace_data(_t(to), _t(bo), _t(act).long(), _t(value),
                                    _t(reward), None), 0.99, 0.95, 1.0, 1.0, 1.0)
    got = jorigin.vtrace_error(jorigin.vtrace_data(to, bo, act, value, reward, None),
                               0.99, 0.95, 1.0, 1.0, 1.0)
    np.testing.assert_allclose([float(x) for x in got],
                               [x.item() for x in want], rtol=1e-4, atol=1e-5)


def test_upgo_parity(key):
    from hpc_rll.origin.upgo import upgo_loss
    ks = jax.random.split(key, 5)
    T, B, N = 13, 5, 6
    to = jax.random.normal(ks[0], (T, B, N))
    rhos = jnp.exp(jax.random.normal(ks[1], (T, B)) * 0.2)
    act = jax.random.randint(ks[2], (T, B), 0, N)
    rew = jax.random.normal(ks[3], (T, B))
    value = jax.random.normal(ks[4], (T + 1, B))
    want = upgo_loss(_t(to), _t(rhos), _t(act).long(), _t(rew), _t(value)).item()
    got = float(jorigin.upgo_loss(to, rhos, act, rew, value))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_lstm_parity(key):
    """Same parameters loaded into both implementations -> same outputs (the
    check the reference left manual/disabled, tests/test_lstm.py:118-125)."""
    import torch
    from hpc_rll.origin.rnn import get_lstm
    S, B, I, H, L = 6, 3, 8, 5, 2
    ref = get_lstm("normal", I, H, L, norm_type="LN")
    params = jorigin.init_lstm_params(key, I, H, L, "LN")
    with torch.no_grad():
        for l in range(L):
            ref.wx[l].copy_(_t(params.wx[l]))
            ref.wh[l].copy_(_t(params.wh[l]))
        ref.bias.copy_(_t(params.bias))
    x = jax.random.normal(jax.random.split(key)[0], (S, B, I))
    want_y, want_state = ref(_t(x), None, list_next_state=False)
    # full-f32 matmuls: the TPU MXU defaults to bf16 inputs, which drifts
    # ~5e-3 from torch f32 over stacked timesteps
    with jax.default_matmul_precision("float32"):
        got_y, (got_h, got_c) = jorigin.lstm(params, x, None, "LN")
    np.testing.assert_allclose(got_y, want_y.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got_h, want_state[0].detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got_c, want_state[1].detach().numpy(), rtol=1e-4, atol=1e-5)


def test_scatter_parity_cpu(key):
    from hpc_rll.origin.scatter_connection import ScatterConnection
    ks = jax.random.split(key, 3)
    B, M, N, H, W = 3, 20, 4, 5, 5
    x = jax.random.normal(ks[0], (B, M, N))
    loc = jnp.stack([jax.random.randint(ks[1], (B, M), 0, H),
                     jax.random.randint(ks[2], (B, M), 0, W)], -1)
    for mode in ["add", "cover"]:
        ref = ScatterConnection(mode)
        want = ref(_t(x), (H, W), _t(loc).long()).numpy()
        got = jorigin.scatter_connection(x, (H, W), loc, mode)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_padding_oracle_dp_parity():
    from hpc_rll.origin.padding import oracle_split_group as ref_dp
    import torch
    rng = np.random.default_rng(7)
    data_t = [torch.randn(int(n)) for n in sorted(rng.integers(8, 80, size=18))]
    data_j = [jnp.asarray(t.numpy()) for t in data_t]
    want_shapes, want_pos = ref_dp(data_t, 4)
    got_shapes, got_pos = jorigin.oracle_split_group(data_j, 4)
    assert [tuple(s) for s in want_shapes] == [tuple(s) for s in got_shapes]
    assert list(want_pos) == list(got_pos)
