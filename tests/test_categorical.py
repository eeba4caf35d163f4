"""Fused categorical head (ops/categorical.py): forward parity with the
origin log_softmax oracles and custom-VJP gradient parity with jnp autodiff,
including bf16 logits."""

import jax
import jax.numpy as jnp
import numpy as np

from di_hpc_tpu.ops.categorical import logp, logp_entropy
from di_hpc_tpu.origin.ppo import categorical_entropy, categorical_log_prob


def test_forward_parity(key):
    T, B, N = 6, 24, 17
    k1, k2 = jax.random.split(key)
    logits = jax.random.normal(k1, (T, B, N)) * 3
    act = jax.random.randint(k2, (T, B), 0, N)
    lp, ent = logp_entropy(logits, act)
    np.testing.assert_allclose(lp, categorical_log_prob(logits, act),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ent, categorical_entropy(logits),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(logp(logits, act),
                               categorical_log_prob(logits, act),
                               rtol=1e-4, atol=1e-5)


def test_custom_vjp_matches_autodiff(key):
    B, N = 40, 13
    k1, k2, k3, k4 = jax.random.split(key, 4)
    logits = jax.random.normal(k1, (B, N)) * 2
    act = jax.random.randint(k2, (B,), 0, N)
    wl = jax.random.normal(k3, (B,))
    we = jax.random.normal(k4, (B,))

    def f_fused(x):
        lp, ent = logp_entropy(x, act)
        return jnp.sum(lp * wl) + jnp.sum(ent * we)

    def f_auto(x):
        return (jnp.sum(categorical_log_prob(x, act) * wl)
                + jnp.sum(categorical_entropy(x) * we))

    np.testing.assert_allclose(f_fused(logits), f_auto(logits), rtol=1e-4)
    np.testing.assert_allclose(jax.grad(f_fused)(logits),
                               jax.grad(f_auto)(logits), rtol=1e-4, atol=1e-5)

    def g_fused(x):
        return jnp.sum(logp(x, act) * wl)

    def g_auto(x):
        return jnp.sum(categorical_log_prob(x, act) * wl)

    np.testing.assert_allclose(jax.grad(g_fused)(logits),
                               jax.grad(g_auto)(logits), rtol=1e-4, atol=1e-5)


def test_bf16_logits(key):
    """bf16 logits: f32 math internally, f32 outputs, bf16 gradient."""
    B, N = 32, 21
    k1, k2 = jax.random.split(key)
    logits = jax.random.normal(k1, (B, N), jnp.bfloat16)
    act = jax.random.randint(k2, (B,), 0, N)
    lp, ent = logp_entropy(logits, act)
    assert lp.dtype == jnp.float32
    ref_lp = categorical_log_prob(logits.astype(jnp.float32), act)
    ref_ent = categorical_entropy(logits.astype(jnp.float32))
    np.testing.assert_allclose(lp, ref_lp, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(ent, ref_ent, rtol=2e-2, atol=2e-2)
    g = jax.grad(lambda x: jnp.sum(logp_entropy(x, act)[0]))(logits)
    assert g.dtype == jnp.bfloat16
    g_ref = jax.grad(lambda x: jnp.sum(
        categorical_log_prob(x.astype(jnp.float32), act)))(logits)
    np.testing.assert_allclose(np.asarray(g, np.float32),
                               np.asarray(g_ref, np.float32),
                               rtol=5e-2, atol=2e-2)


def test_extreme_and_degenerate_inputs(key):
    """The variadic-reduce forward must stay finite at +-1e4 logits (the
    online combiner's exp(m - M) saturates to 0, never overflows) and
    handle N=1 (logp == 0, entropy == 0)."""
    xe = jnp.array([[1e4, -1e4, 0.0], [-1e4, -1e4, -1e4]])
    act = jnp.array([0, 2])
    lp, ent = logp_entropy(xe, act)
    assert bool(jnp.all(jnp.isfinite(lp))) and bool(jnp.all(jnp.isfinite(ent)))
    np.testing.assert_allclose(lp[0], 0.0, atol=1e-6)       # argmax action
    # uniform row at magnitude 1e4: ent = lse - sx/s cancels two 1e4-sized
    # terms, so f32 leaves ~|m|*eps ~ 2e-5 of residual — loose tolerance.
    np.testing.assert_allclose(ent[1], np.log(3.0), rtol=1e-3)
    np.testing.assert_allclose(logp(xe, jnp.array([1, 0]))[0], -2e4, rtol=1e-6)

    x1 = jax.random.normal(key, (5, 1))
    lp1, ent1 = logp_entropy(x1, jnp.zeros((5,), jnp.int32))
    np.testing.assert_allclose(lp1, 0.0, atol=1e-6)
    np.testing.assert_allclose(ent1, 0.0, atol=1e-6)


def test_masked_minus_inf_logits():
    """The standard invalid-action mask (-inf logits) must not poison the
    online-softmax monoid: two -inf DATA elements combining in the TPU tree
    reduce would give exp(-inf - (-inf)) = nan without the finite clamp."""
    xm = jnp.array([[1.0, -jnp.inf, -jnp.inf, 0.0],
                    [-jnp.inf, 2.0, -jnp.inf, -jnp.inf]])
    act = jnp.array([0, 1])
    lp, ent = logp_entropy(xm, act)
    ref = jnp.log(jax.nn.softmax(jnp.array([[1.0, -1e30, -1e30, 0.0],
                                            [-1e30, 2.0, -1e30, -1e30]]),
                                 axis=-1))
    assert bool(jnp.all(jnp.isfinite(lp))) and bool(jnp.all(jnp.isfinite(ent)))
    # atol covers the TPU tree-reduce's in-combiner exp accuracy (~1.6e-4
    # abs vs the max-then-sum form; ops/categorical.py module docstring).
    np.testing.assert_allclose(lp, jnp.array([ref[0, 0], ref[1, 1]]),
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(ent[1], 0.0, atol=2e-4)  # one valid action
    # a MASKED action's log-prob is astronomically negative (exp == 0)
    lp_masked = logp(xm, jnp.array([1, 0]))
    assert bool(jnp.all(jnp.isfinite(lp_masked)))
    assert float(jnp.max(lp_masked)) < -1e8
    assert float(jnp.max(jnp.exp(lp_masked))) == 0.0
    g = jax.grad(lambda x: jnp.sum(logp_entropy(x, act)[0]))(xm)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_masked_taken_action_zero_grad():
    """Gradient w.r.t. a MASKED taken action's logit is 0: the forward
    clamps masked logits via maximum(x, -1e9), whose derivative is 0 below
    the clamp (r4 advisor finding — the onehot term used to emit glp
    there)."""
    xm = jnp.array([[1.0, -jnp.inf, 0.5, 0.0],
                    [-1e12, 2.0, -jnp.inf, 1.0]])
    act_masked = jnp.array([1, 0])  # both point at masked logits
    for fn in (lambda x: jnp.sum(logp_entropy(x, act_masked)[0]),
               lambda x: jnp.sum(logp(x, act_masked))):
        g = jax.grad(fn)(xm)
        assert bool(jnp.all(jnp.isfinite(g)))
        # masked taken positions: exactly zero (onehot zeroed AND p == 0)
        assert float(g[0, 1]) == 0.0 and float(g[1, 0]) == 0.0
        # other masked positions stay zero too (p == 0)
        assert float(g[1, 2]) == 0.0
    # an UNMASKED taken action still gets the onehot term
    g = jax.grad(lambda x: jnp.sum(logp(x, jnp.array([0, 1]))))(xm)
    assert float(g[0, 0]) > 0.4  # 1 - p_0 with p_0 ~ 0.51


def test_jit_vmap_composability(key):
    B, N = 16, 9
    k1, k2 = jax.random.split(key)
    logits = jax.random.normal(k1, (B, N))
    act = jax.random.randint(k2, (B,), 0, N)
    lp1, _ = jax.jit(logp_entropy)(logits, act)
    lp2 = jax.vmap(lambda x, a: logp_entropy(x, a))(logits, act)[0]
    np.testing.assert_allclose(lp1, lp2, rtol=1e-5, atol=1e-6)
