"""PPO: fused vs hand-rolled numpy (reference config B=128, N=128,
tests/test_ppo.py:11-15)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from di_hpc_tpu import ops


def _np_log_softmax(x):
    x = x - x.max(-1, keepdims=True)
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


def _np_ppo(ln, lo, act, vn, vo, adv, ret, w, clip, use_vclip, dual):
    B = ln.shape[0]
    lp_n = _np_log_softmax(ln)[np.arange(B), act]
    lp_o = _np_log_softmax(lo)[np.arange(B), act]
    p = np.exp(_np_log_softmax(ln))
    ent = -(p * _np_log_softmax(ln)).sum(-1)
    ratio = np.exp(lp_n - lp_o)
    s1 = ratio * adv
    s2 = np.clip(ratio, 1 - clip, 1 + clip) * adv
    if dual is not None:
        pol = (-np.maximum(np.minimum(s1, s2), dual * adv) * w).mean()
    else:
        pol = (-np.minimum(s1, s2) * w).mean()
    kl = (lp_o - lp_n).mean()
    cf = ((ratio > 1 + clip) | (ratio < 1 - clip)).mean()
    if use_vclip:
        vc = vo + np.clip(vn - vo, -clip, clip)
        vl = 0.5 * (np.maximum((ret - vn) ** 2, (ret - vc) ** 2) * w).mean()
    else:
        vl = 0.5 * ((ret - vn) ** 2 * w).mean()
    el = (ent * w).mean()
    return (pol, vl, el), (kl, cf)


@pytest.mark.parametrize("use_vclip", [True, False])
@pytest.mark.parametrize("dual", [None, 5.0])
def test_ppo_matches_numpy(use_vclip, dual, key):
    B, N, clip = 32, 12, 0.2
    ks = jax.random.split(key, 8)
    ln = jax.random.normal(ks[0], (B, N)); lo = jax.random.normal(ks[1], (B, N))
    act = jax.random.randint(ks[2], (B,), 0, N)
    vn = jax.random.normal(ks[3], (B,)); vo = jax.random.normal(ks[4], (B,))
    adv = jax.random.normal(ks[5], (B,)); ret = jax.random.normal(ks[6], (B,))
    w = jax.random.uniform(ks[7], (B,), minval=0.5, maxval=1.5)

    (pol, vl, el), (kl, cf) = ops.ppo_error(
        ops.ppo_data(ln, lo, act, vn, vo, adv, ret, w), clip, use_vclip, dual)
    want_losses, want_info = _np_ppo(
        *(np.asarray(x) for x in (ln, lo, act, vn, vo, adv, ret, w)),
        clip, use_vclip, dual)
    np.testing.assert_allclose(
        [float(pol), float(vl), float(el)], want_losses, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose([float(kl), float(cf)], want_info, rtol=1e-4, atol=1e-5)


def test_ppo_grads_flow_and_monitors_do_not(key):
    B, N = 16, 6
    ks = jax.random.split(key, 7)
    ln = jax.random.normal(ks[0], (B, N)); lo = jax.random.normal(ks[1], (B, N))
    act = jax.random.randint(ks[2], (B,), 0, N)
    vn = jax.random.normal(ks[3], (B,)); vo = jax.random.normal(ks[4], (B,))
    adv = jax.random.normal(ks[5], (B,)); ret = jax.random.normal(ks[6], (B,))

    def total(ln_, vn_):
        (pol, vl, el), _ = ops.ppo_error(
            ops.ppo_data(ln_, lo, act, vn_, vo, adv, ret, None), 0.2, True, None)
        return pol + 0.5 * vl - 0.01 * el

    g_ln, g_vn = jax.grad(total, argnums=(0, 1))(ln, vn)
    assert float(jnp.abs(g_ln).max()) > 0
    assert float(jnp.abs(g_vn).max()) > 0
    # analytic parity with the oracle implementation (an fd check is fragile
    # here: the clipped surrogate is only piecewise differentiable)
    from di_hpc_tpu import origin

    def total_o(ln_, vn_):
        (pol, vl, el), _ = origin.ppo_error(
            origin.ppo_data(ln_, lo, act, vn_, vo, adv, ret, None), 0.2, True, None)
        return pol + 0.5 * vl - 0.01 * el

    go_ln, go_vn = jax.grad(total_o, argnums=(0, 1))(ln, vn)
    # rtol 3e-4: fused head vs oracle use different logsumexp formulations,
    # and TPU transcendentals differ at the ~1e-5 level between them
    # (observed 2.0e-4 rel on 1/96 elements under DIHPC_TEST_TPU=1).
    np.testing.assert_allclose(g_ln, go_ln, rtol=3e-4, atol=2e-6)
    np.testing.assert_allclose(g_vn, go_vn, rtol=3e-4, atol=2e-6)


def test_ppo_dual_clip_validation(key):
    B, N = 4, 3
    ks = jax.random.split(key, 7)
    args = [jax.random.normal(ks[i], (B, N)) for i in range(2)]
    act = jnp.zeros((B,), jnp.int32)
    vec = [jax.random.normal(ks[i + 3], (B,)) for i in range(4)]
    with pytest.raises(AssertionError):
        ops.ppo_error(ops.ppo_data(args[0], args[1], act, *vec, None),
                      0.2, True, 0.5)


def test_ppo_wrapper(key):
    B, N = 8, 5
    ks = jax.random.split(key, 7)
    ln = jax.random.normal(ks[0], (B, N)); lo = jax.random.normal(ks[1], (B, N))
    act = jax.random.randint(ks[2], (B,), 0, N)
    vec = [jax.random.normal(ks[i + 3], (B,)) for i in range(4)]
    losses, info = ops.PPO(B, N)(ln, lo, act, *vec)
    assert len(losses) == 3 and len(info) == 2


@pytest.mark.parametrize("use_vclip", [True, False])
@pytest.mark.parametrize("dual", [None, 5.0])
def test_ppo_fast_path_matches_parity_api(use_vclip, dual, key):
    """ppo_error_with_logp_old(logp(logit_old, a)) == ppo_error(logit_old),
    losses, monitors AND logit_new gradients (the fast path skips only the
    old-logits head, which is stop-gradient in both)."""
    B, N, clip = 48, 17, 0.2
    ks = jax.random.split(key, 8)
    ln = jax.random.normal(ks[0], (B, N)); lo = jax.random.normal(ks[1], (B, N))
    act = jax.random.randint(ks[2], (B,), 0, N)
    vn = jax.random.normal(ks[3], (B,)); vo = jax.random.normal(ks[4], (B,))
    adv = jax.random.normal(ks[5], (B,)); ret = jax.random.normal(ks[6], (B,))
    w = jax.random.uniform(ks[7], (B,), minval=0.5, maxval=1.5)

    def slow(ln_):
        (pol, vl, el), info = ops.ppo_error(
            ops.ppo_data(ln_, lo, act, vn, vo, adv, ret, w),
            clip, use_vclip, dual)
        return pol + vl + el, (pol, vl, el, *info)

    lp_old = ops.logp(lo, act)

    def fast(ln_):
        (pol, vl, el), info = ops.ppo_error_with_logp_old(
            ops.ppo_fast_data(ln_, lp_old, act, vn, vo, adv, ret, w),
            clip, use_vclip, dual)
        return pol + vl + el, (pol, vl, el, *info)

    (ts, outs_s), gs = jax.value_and_grad(slow, has_aux=True)(ln)
    (tf, outs_f), gf = jax.value_and_grad(fast, has_aux=True)(ln)
    np.testing.assert_allclose(np.asarray(ts), np.asarray(tf), rtol=1e-6)
    for a, b in zip(outs_s, outs_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gf),
                               rtol=1e-6, atol=1e-7)


def test_ppo_fast_path_logp_old_not_differentiated(key):
    """No gradient flows into logp_old even if the caller forgot to detach."""
    B, N = 16, 8
    ks = jax.random.split(key, 4)
    ln = jax.random.normal(ks[0], (B, N))
    act = jax.random.randint(ks[1], (B,), 0, N)
    v = jax.random.normal(ks[2], (B,))
    lp_old = jax.random.normal(ks[3], (B,)) * 0.1 - 1.0

    def f(lp):
        (pol, vl, el), _ = ops.ppo_error_with_logp_old(
            ops.ppo_fast_data(ln, lp, act, v, v, v, v, None))
        return pol + vl + el

    g = jax.grad(f)(lp_old)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_ppo_fast_path_validation(key):
    ln = jnp.zeros((8, 4))
    act = jnp.zeros((8,), jnp.int32)
    v = jnp.zeros((8,))
    with pytest.raises(ValueError, match="ppo_error_with_logp_old"):
        ops.ppo_error_with_logp_old(
            ops.ppo_fast_data(ln, jnp.zeros((7,)), act, v, v, v, v, None))
