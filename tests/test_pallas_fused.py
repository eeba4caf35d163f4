"""Fully-fused Pallas kernels (rl_scans) via interpret mode, including
end-to-end fused-op routing.  (The categorical head is plain jnp — see
tests/test_categorical.py.)"""

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


@pytest.mark.parametrize("T,B", [(40, 144), (37, 9)])
def test_td_lambda_loss_kernel(interpret, key, T, B):
    """Fully-fused td_lambda loss (returns + squared error in one kernel):
    value/grad parity with origin, zero reward grad, ragged last B-block
    masked (uninitialized padding lanes must not reach the reduction)."""
    from di_hpc_tpu.pallas_kernels.rl_scans import td_lambda_loss_pallas
    k1, k2 = jax.random.split(key)
    value = jax.random.normal(k1, (T + 1, B))
    reward = jax.random.normal(k2, (T, B))
    want = origin.td_lambda_error(origin.td_lambda_data(value, reward, None),
                                  0.9, 0.8)
    got = td_lambda_loss_pallas(value, reward, 0.9, 0.8)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    g_f = jax.grad(td_lambda_loss_pallas)(value, reward, 0.9, 0.8)
    g_o = jax.grad(lambda v: origin.td_lambda_error(
        origin.td_lambda_data(v, reward, None), 0.9, 0.8))(value)
    np.testing.assert_allclose(g_f, g_o, rtol=1e-5, atol=1e-6)
    g_r = jax.grad(td_lambda_loss_pallas, argnums=1)(value, reward, 0.9, 0.8)
    assert float(jnp.abs(g_r).max()) == 0.0


def test_vtrace_returns_adv_kernel(interpret, key):
    from di_hpc_tpu.pallas_kernels.rl_scans import vtrace_returns_adv_pallas
    T, B = 36, 136
    ks = jax.random.split(key, 5)
    value = jax.random.normal(ks[0], (T + 1, B))
    reward = jax.random.normal(ks[1], (T, B))
    IS = jnp.exp(jax.random.normal(ks[2], (T, B)) * 0.3)
    # Distinct clip ratios exercise the in-kernel min(IS, clip) folds.
    rhos = jnp.minimum(IS, 1.0); cs = jnp.minimum(IS, 0.9); pg = jnp.minimum(IS, 1.2)
    want_ret = origin.vtrace_nstep_return(rhos, cs, reward, value, 0.99, 0.95)
    want_adv = origin.vtrace_advantage(
        pg, reward, jnp.concatenate([want_ret[1:], value[-1:]], 0), value[:-1], 0.99)
    got_ret, got_adv = vtrace_returns_adv_pallas(IS, reward, value, 0.99, 0.95,
                                                 1.0, 0.9, 1.2)
    np.testing.assert_allclose(got_ret, want_ret, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got_adv, want_adv, rtol=1e-4, atol=1e-5)


def test_vtrace_kernel_chunked_scan_path(interpret, key):
    """T=128 (a multiple of the 64-row chunk) exercises the two-level
    chunked suffix scan inside the vtrace kernel; T=36 above exercises the
    flat-scan fallback."""
    from di_hpc_tpu.pallas_kernels.rl_scans import vtrace_returns_adv_pallas
    T, B = 128, 136
    ks = jax.random.split(key, 5)
    value = jax.random.normal(ks[0], (T + 1, B))
    reward = jax.random.normal(ks[1], (T, B))
    IS = jnp.exp(jax.random.normal(ks[2], (T, B)) * 0.3)
    rhos = jnp.minimum(IS, 1.0)
    want_ret = origin.vtrace_nstep_return(rhos, rhos, reward, value, 0.99, 0.95)
    want_adv = origin.vtrace_advantage(
        rhos, reward, jnp.concatenate([want_ret[1:], value[-1:]], 0),
        value[:-1], 0.99)
    got_ret, got_adv = vtrace_returns_adv_pallas(IS, reward, value, 0.99, 0.95,
                                                 1.0, 1.0, 1.0)
    np.testing.assert_allclose(got_ret, want_ret, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got_adv, want_adv, rtol=1e-4, atol=1e-5)


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
    rhos = jnp.exp(jax.random.normal(ks[4], (T, B)) * 0.3)
    np.testing.assert_allclose(
        float(ops.upgo_loss(to, rhos, act, reward, value)),
        float(origin.upgo_loss(to, rhos, act, reward, value)),
        rtol=1e-4, atol=1e-6)
    # grads through the fused categorical head
    g_f = jax.grad(lambda t: ops.vtrace_error(
        ops.vtrace_data(t, bo, act, value, reward, None)).policy_loss)(to)
    g_o = jax.grad(lambda t: origin.vtrace_error(
        origin.vtrace_data(t, bo, act, value, reward, None)).policy_loss)(to)
    np.testing.assert_allclose(g_f, g_o, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("T,B", [(36, 136), (128, 96)])
def test_upgo_loss_kernel(interpret, key, T, B):
    """The loss-fused upgo kernel (r5): -mean(adv * lp) straight from
    partial sums; lp grad matches -adv/(T*B), scan inputs get zeros."""
    from di_hpc_tpu.pallas_kernels.rl_scans import upgo_loss_pallas
    ks = jax.random.split(key, 4)
    value = jax.random.normal(ks[0], (T + 1, B))
    reward = jax.random.normal(ks[1], (T, B))
    rhos = jnp.exp(jax.random.normal(ks[2], (T, B)) * 0.3)
    lp = -jnp.abs(jax.random.normal(ks[3], (T, B)))
    adv_want = rhos * (origin.upgo_returns(reward, value) - value[:-1])
    want = -jnp.mean(adv_want * lp)
    got = upgo_loss_pallas(rhos, lp, reward, value)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4, atol=1e-6)
    g_lp = jax.grad(lambda l_: upgo_loss_pallas(rhos, l_, reward, value))(lp)
    np.testing.assert_allclose(g_lp, -adv_want / (T * B), rtol=1e-4, atol=1e-7)
    g_v = jax.grad(lambda v_: upgo_loss_pallas(rhos, lp, reward, v_))(value)
    assert float(jnp.abs(g_v).max()) == 0.0


@pytest.mark.parametrize("T,B", [(36, 136), (128, 96)])
def test_vtrace_losses_kernel(interpret, key, T, B):
    """The loss-fused vtrace kernel (r5): pg/value losses straight from
    partial sums, nothing materialized; value grad + detached-returns
    contract checked against the oracle."""
    from di_hpc_tpu.pallas_kernels.rl_scans import vtrace_losses_pallas
    ks = jax.random.split(key, 4)
    value = jax.random.normal(ks[0], (T + 1, B))
    reward = jax.random.normal(ks[1], (T, B))
    IS = jnp.exp(jax.random.normal(ks[2], (T, B)) * 0.3)
    lp = -jnp.abs(jax.random.normal(ks[3], (T, B)))

    def want(v_):
        rhos = jnp.minimum(IS, 1.0); cs = jnp.minimum(IS, 0.9)
        pg_r = jnp.minimum(IS, 1.2)
        ret = origin.vtrace_nstep_return(rhos, cs, reward,
                                         jax.lax.stop_gradient(v_), 0.99, 0.95)
        adv = origin.vtrace_advantage(
            pg_r, reward, jnp.concatenate([ret[1:],
                                           jax.lax.stop_gradient(v_)[-1:]], 0),
            jax.lax.stop_gradient(v_)[:-1], 0.99)
        return (-jnp.mean(lp * adv), jnp.mean((v_[:-1] - ret) ** 2))

    got = vtrace_losses_pallas(IS, lp, reward, value, 0.99, 0.95, 1.0, 0.9, 1.2)
    wpg, wvl = want(value)
    np.testing.assert_allclose(float(got[0]), float(wpg), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(got[1]), float(wvl), rtol=1e-4, atol=1e-5)
    # gradient contract: d vl/d value matches the detached-returns oracle;
    # lp grad = -adv/(T*B); IS and reward grads are zero
    g_v = jax.grad(lambda v_: vtrace_losses_pallas(
        IS, lp, reward, v_, 0.99, 0.95, 1.0, 0.9, 1.2)[1])(value)
    g_v_want = jax.grad(lambda v_: want(v_)[1])(value)
    np.testing.assert_allclose(g_v, g_v_want, rtol=1e-4, atol=1e-5)
    g_lp = jax.grad(lambda l_: vtrace_losses_pallas(
        IS, l_, reward, value, 0.99, 0.95, 1.0, 0.9, 1.2)[0])(lp)
    # lp grad is -adv/(T*B) with adv from the oracle recurrence
    rhos = jnp.minimum(IS, 1.0); cs = jnp.minimum(IS, 0.9)
    ret = origin.vtrace_nstep_return(rhos, cs, reward, value, 0.99, 0.95)
    adv = origin.vtrace_advantage(
        jnp.minimum(IS, 1.2), reward,
        jnp.concatenate([ret[1:], value[-1:]], 0), value[:-1], 0.99)
    np.testing.assert_allclose(g_lp, -adv / (T * B), rtol=1e-4, atol=1e-6)
    g_is = jax.grad(lambda i_: vtrace_losses_pallas(
        i_, lp, reward, value, 0.99, 0.95, 1.0, 0.9, 1.2)[0])(IS)
    assert float(jnp.abs(g_is).max()) == 0.0


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


@pytest.fixture
def f32_matmuls():
    # Kernel/oracle comparisons through a multi-step recurrence need exact
    # f32 GEMMs on both sides: on real TPU the ambient default is bf16 and
    # the two sides accumulate in different orders (see CLAUDE.md).
    with jax.default_matmul_precision("float32"):
        yield


def test_lstm_layer_kernel_routing(interpret, f32_matmuls, key):
    """lstm_fused routes through the whole-layer Pallas kernel (H a lane
    multiple) and matches the origin oracle, forward and gradients."""
    from di_hpc_tpu.network.lstm import lstm_fused
    from di_hpc_tpu.origin.rnn import init_lstm_params, lstm
    from di_hpc_tpu.pallas_kernels import lstm_cell

    S, B, I, H, L = 8, 4, 24, 128, 2
    assert lstm_cell.supports(S, B, H, jnp.float32)
    params = init_lstm_params(key, I, H, L, "LN")
    ks = jax.random.split(key, 3)
    x = jax.random.normal(ks[0], (S, B, I))
    h0 = jax.random.normal(ks[1], (L, B, H))
    c0 = jax.random.normal(ks[2], (L, B, H))

    y_ref, (hn_ref, cn_ref) = lstm(params, x, (h0, c0), "LN")
    y, (hn, cn) = lstm_fused(params, x, (h0, c0), "LN")
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(hn, hn_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(cn, cn_ref, rtol=1e-4, atol=1e-5)

    def loss_fused(p):
        out, (h, c) = lstm_fused(p, x, (h0, c0), "LN")
        return jnp.sum(out ** 2) + jnp.sum(h) + jnp.sum(c * 0.5)

    def loss_ref(p):
        out, (h, c) = lstm(p, x, (h0, c0), "LN")
        return jnp.sum(out ** 2) + jnp.sum(h) + jnp.sum(c * 0.5)

    g_f = jax.grad(loss_fused)(params)
    g_r = jax.grad(loss_ref)(params)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-4)


@pytest.mark.parametrize("B,force_blk", [
    (24, 16), (40, 32), (12, 8),
    # odd/unaligned block: the halves gate must fall back to the single
    # path (an unconditional split DROPPED row blk-1 — caught in review,
    # reproduced as a NaN row at B=17)
    (17, 17), (24, 24),
])
def test_lstm_layer_fwd_ragged_blocks(interpret, f32_matmuls, key,
                                      monkeypatch, B, force_blk):
    """Forward kernel with a forced B-block: exercises ragged last-block
    handling (B % blk != 0, where Pallas bounds-clips the stream outputs)
    across odd/unaligned block sizes, under the U=2 time-unrolled kernel."""
    from di_hpc_tpu.network.lstm import lstm_fused
    from di_hpc_tpu.origin.rnn import init_lstm_params, lstm
    from di_hpc_tpu.pallas_kernels import lstm_cell

    monkeypatch.setattr(lstm_cell, "_pick_blk_b", lambda *a, **k: force_blk)
    assert B % force_blk != 0 or B == force_blk
    S, I, H, L = 8, 16, 128, 1
    params = init_lstm_params(key, I, H, L, "LN")
    ks = jax.random.split(key, 3)
    x = jax.random.normal(ks[0], (S, B, I))
    h0 = jax.random.normal(ks[1], (L, B, H))
    c0 = jax.random.normal(ks[2], (L, B, H))

    y_ref, (hn_ref, cn_ref) = lstm(params, x, (h0, c0), "LN")
    y, (hn, cn) = lstm_fused(params, x, (h0, c0), "LN")
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(hn, hn_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(cn, cn_ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("S,B,H,force_blk", [
    (8, 64, 128, None),    # V2 path, single block
    (3, 88, 128, 16),      # V2 path, ragged blocks (88 % 16 = 8)
])
def test_lstm_layer_bwd_v2(interpret, f32_matmuls, key, monkeypatch,
                           S, B, H, force_blk):
    """The V2 backward kernel (on-chip gh_pre/c recompute + in-VMEM LN-param
    accumulation) matches autodiff through the scan oracle — including with
    blk < B and a ragged last block, whose padding rows must not leak into
    the dWh/dgamma/dbeta reductions."""
    from di_hpc_tpu.pallas_kernels import lstm_cell

    assert lstm_cell._bwd_fits_v2(B, H)
    if force_blk is not None:
        monkeypatch.setattr(lstm_cell, "_pick_blk_b_v2",
                            lambda *a, **k: force_blk)
        assert B % force_blk != 0   # genuinely ragged

    ks = jax.random.split(key, 9)
    gxp = jax.random.normal(ks[0], (S, B, 4 * H))
    wh = jax.random.normal(ks[1], (H, 4 * H)) * 0.1
    gln = 1.0 + 0.1 * jax.random.normal(ks[2], (4 * H,))
    bln = 0.1 * jax.random.normal(ks[3], (4 * H,))
    h0 = jax.random.normal(ks[4], (B, H))
    c0 = jax.random.normal(ks[5], (B, H))
    glnx = 1.0 + 0.1 * jax.random.normal(ks[6], (4 * H,))
    blnx = 0.1 * jax.random.normal(ks[7], (4 * H,))
    bias = 0.1 * jax.random.normal(ks[8], (4 * H,))

    def oracle(gxp, wh, glnx, blnx, gln, bln, bias, h0, c0):
        from di_hpc_tpu.origin.rnn import layer_norm

        gx = layer_norm(gxp, glnx, blnx) + bias   # x-side LN folded in-kernel

        def step(carry, gx_t):
            h, c = carry
            gh = layer_norm(h @ wh, gln, bln)
            g = gx_t + gh
            i, f, o, u = jnp.split(g, 4, -1)
            c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(u)
            h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
            return (h2, c2), h2

        (hn, cn), y = jax.lax.scan(step, (h0, c0), gx)
        return y, hn, cn

    def loss(f):
        def g(args):
            y, hn, cn = f(*args)
            return jnp.sum(y * jnp.cos(y)) + jnp.sum(hn ** 2) + jnp.sum(jnp.sin(cn))
        return g

    args = (gxp, wh, glnx, blnx, gln, bln, bias, h0, c0)
    g_f = jax.grad(loss(lambda *a: __import__("di_hpc_tpu.pallas_kernels.lstm_cell",
                                              fromlist=["x"]).lstm_layer_fused(*a, True)))(args)
    g_r = jax.grad(loss(oracle))(args)
    for name, a, b in zip(["dgxp", "dwh", "dglnx", "dblnx", "dgln", "dbln",
                           "dbias", "dh0", "dc0"], g_f, g_r):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4, err_msg=name)


def test_lstm_layer_kernel_bf16(interpret, key):
    """bf16 streams route through the whole-layer kernel natively (bf16
    HBM traffic + MXU, f32 gate math and h/c carry in scratch) and track
    the f32 computation within bf16 tolerance, forward and grads."""
    from di_hpc_tpu.network.lstm import lstm_fused
    from di_hpc_tpu.origin.rnn import init_lstm_params, lstm
    from di_hpc_tpu.pallas_kernels import lstm_cell

    S, B, I, H, L = 8, 64, 32, 128, 2
    assert lstm_cell.supports(S, B, H, jnp.bfloat16)
    params32 = init_lstm_params(key, I, H, L, "LN")
    params16 = jax.tree.map(lambda v: v.astype(jnp.bfloat16), params32)
    x32 = jax.random.normal(jax.random.split(key)[0], (S, B, I))
    x16 = x32.astype(jnp.bfloat16)

    y32, _ = lstm(params32, x32, None, "LN")
    y16, (h16, c16) = lstm_fused(params16, x16, None, "LN")
    assert y16.dtype == jnp.bfloat16 and h16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(y16, np.float32), np.asarray(y32),
                               rtol=0.15, atol=0.15)

    def loss16(p):
        y, (h, c) = lstm_fused(p, x16, None, "LN")
        return jnp.sum(y.astype(jnp.float32) ** 2) + jnp.sum(
            (h * c).astype(jnp.float32))

    def loss32(p):
        y, (h, c) = lstm(p, x32, None, "LN")
        return jnp.sum(y ** 2) + jnp.sum(h * c)

    g16 = jax.grad(loss16)(params16)
    g32 = jax.grad(loss32)(params32)
    for a, b in zip(jax.tree.leaves(g16), jax.tree.leaves(g32)):
        assert a.dtype == jnp.bfloat16
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        assert np.all(np.isfinite(a))
        # bf16 grads through an 8-step recurrence: loose agreement only.
        denom = max(1e-3, float(np.max(np.abs(b))))
        assert float(np.max(np.abs(a - b))) / denom < 0.25
