"""bfloat16 input coverage for the loss/advantage ops.

Mixed-precision training feeds bf16 model outputs (logits, values, q) into
the losses; every op must (a) accept bf16 float inputs, (b) return finite
values, (c) produce cotangents in the INPUT's dtype (so optimizer pipelines
see consistent pytrees), and (d) agree with the f32 op at bf16-level
tolerance.  The network/kernel bf16 paths are covered in test_lstm /
test_pallas_fused / test_categorical; this file sweeps the ops/ surface.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from di_hpc_tpu import ops, origin

BF16 = jnp.bfloat16
# bf16 has ~8 mantissa bits; losses are means of O(1) terms.
TOL = dict(rtol=5e-2, atol=5e-2)


def _cast(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if isinstance(x, jnp.ndarray) and jnp.issubdtype(x.dtype, jnp.floating)
        else x, tree)


def _check(loss_fn, f32_args, grad_wrt=0):
    """loss_fn(*args) -> scalar; compares f32 vs bf16 value + grad dtype."""
    bf_args = _cast(f32_args, BF16)
    v32 = loss_fn(*f32_args)
    vbf = loss_fn(*bf_args)
    assert jnp.isfinite(vbf), vbf
    np.testing.assert_allclose(float(vbf), float(v32), **TOL)
    if grad_wrt is not None:
        g = jax.grad(loss_fn, argnums=grad_wrt)(*bf_args)
        for leaf in jax.tree.leaves(g):
            assert leaf.dtype == BF16, leaf.dtype
            assert bool(jnp.isfinite(leaf.astype(jnp.float32)).all())


@pytest.fixture
def k():
    return jax.random.split(jax.random.PRNGKey(7), 8)


def test_gae_bf16(k):
    T, B = 16, 8
    value = jax.random.normal(k[0], (T + 1, B))
    reward = jax.random.normal(k[1], (T, B))

    def f(value, reward):
        return jnp.sum(ops.gae(ops.gae_data(value, reward)).astype(jnp.float32))

    _check(f, (value, reward), grad_wrt=None)  # gae is forward-only


def test_td_lambda_bf16(k):
    T, B = 16, 8
    value = jax.random.normal(k[0], (T + 1, B))
    reward = jax.random.normal(k[1], (T, B))

    def f(value, reward):
        return ops.td_lambda_error(
            ops.td_lambda_data(value, reward, None)).astype(jnp.float32)

    _check(f, (value, reward), grad_wrt=0)


def test_vtrace_bf16(k):
    T, B, N = 8, 4, 6
    to = jax.random.normal(k[0], (T, B, N))
    bo = jax.random.normal(k[1], (T, B, N))
    act = jax.random.randint(k[2], (T, B), 0, N)
    value = jax.random.normal(k[3], (T + 1, B))
    reward = jax.random.normal(k[4], (T, B))

    def f(to, value):
        l = ops.vtrace_error(ops.vtrace_data(
            to, bo.astype(to.dtype), act, value, reward.astype(to.dtype), None))
        return (l.policy_loss + 0.5 * l.value_loss
                - 0.01 * l.entropy_loss).astype(jnp.float32)

    _check(f, (to, value), grad_wrt=(0, 1))


def test_ppo_bf16(k):
    B, N = 32, 6
    ln = jax.random.normal(k[0], (B, N))
    lo = jax.random.normal(k[1], (B, N))
    act = jax.random.randint(k[2], (B,), 0, N)
    vn = jax.random.normal(k[3], (B,))
    vo = jax.random.normal(k[4], (B,))
    adv = jax.random.normal(k[5], (B,))
    ret = jax.random.normal(k[6], (B,))

    def f(ln, vn):
        (pol, vl, el), _ = ops.ppo_error(
            ops.ppo_data(ln, lo.astype(ln.dtype), act, vn,
                         vo.astype(ln.dtype), adv.astype(ln.dtype),
                         ret.astype(ln.dtype), None), 0.2, True, None)
        return (pol + 0.5 * vl - 0.01 * el).astype(jnp.float32)

    _check(f, (ln, vn), grad_wrt=(0, 1))


def test_upgo_bf16(k):
    T, B, N = 8, 4, 6
    to = jax.random.normal(k[0], (T, B, N))
    rhos = jax.random.uniform(k[1], (T, B))
    act = jax.random.randint(k[2], (T, B), 0, N)
    reward = jax.random.normal(k[3], (T, B))
    value = jax.random.normal(k[4], (T + 1, B))

    def f(to):
        return ops.upgo_loss(to, rhos.astype(to.dtype), act,
                             reward.astype(to.dtype),
                             value.astype(to.dtype)).astype(jnp.float32)

    _check(f, (to,), grad_wrt=0)


def test_q_nstep_bf16(k):
    B, N, nstep = 16, 6, 3
    q = jax.random.normal(k[0], (B, N))
    nq = jax.random.normal(k[1], (B, N))
    act = jax.random.randint(k[2], (B,), 0, N)
    nact = jax.random.randint(k[3], (B,), 0, N)
    reward = jax.random.normal(k[4], (nstep, B))
    done = jax.random.uniform(k[5], (B,)) > 0.9

    for op in (ops.q_nstep_td_error, ops.q_nstep_td_error_with_rescale):
        def f(q, op=op):
            loss, _ = op(
                origin.q_nstep_td_data(q, nq.astype(q.dtype), act, nact,
                                       reward.astype(q.dtype), done, None),
                gamma=0.99, nstep=nstep)
            return loss.astype(jnp.float32)

        _check(f, (q,), grad_wrt=0)


def test_dist_nstep_bf16(k):
    B, N, n_atom, nstep = 8, 4, 11, 3
    dist = jax.nn.softmax(jax.random.normal(k[0], (B, N, n_atom)), -1)
    ndist = jax.nn.softmax(jax.random.normal(k[1], (B, N, n_atom)), -1)
    act = jax.random.randint(k[2], (B,), 0, N)
    nact = jax.random.randint(k[3], (B,), 0, N)
    reward = jax.random.normal(k[4], (nstep, B))
    done = jax.random.uniform(k[5], (B,)) > 0.9

    def f(dist):
        loss, _ = ops.dist_nstep_td_error(
            origin.dist_nstep_td_data(dist, ndist.astype(dist.dtype), act,
                                      nact, reward.astype(dist.dtype), done,
                                      None),
            gamma=0.99, v_min=-5.0, v_max=5.0, n_atom=n_atom, nstep=nstep)
        return loss.astype(jnp.float32)

    _check(f, (dist,), grad_wrt=0)


def test_qrdqn_iqn_bf16(k):
    B, N, tau, nstep = 8, 4, 5, 2
    act = jax.random.randint(k[2], (B,), 0, N)
    nact = jax.random.randint(k[3], (B,), 0, N)
    reward = jax.random.normal(k[4], (nstep, B))
    done = jax.random.uniform(k[5], (B,)) > 0.9

    q = jax.random.normal(k[0], (B, N, tau))
    nq = jax.random.normal(k[1], (B, N, tau))
    tau_hat = (jnp.arange(tau) + 0.5) / tau

    def f_qr(q):
        loss, _ = ops.qrdqn_nstep_td_error(
            origin.qrdqn_nstep_td_data(q, nq.astype(q.dtype), act, nact,
                                       reward.astype(q.dtype), done,
                                       tau_hat.astype(q.dtype), None),
            gamma=0.99, nstep=nstep)
        return loss.astype(jnp.float32)

    _check(f_qr, (q,), grad_wrt=0)

    qi = jax.random.normal(k[0], (tau, B, N))
    nqi = jax.random.normal(k[1], (tau + 1, B, N))
    levels = jax.random.uniform(k[6], (tau, B))

    def f_iqn(qi):
        loss, _ = ops.iqn_nstep_td_error(
            origin.iqn_nstep_td_data(qi, nqi.astype(qi.dtype), act, nact,
                                     reward.astype(qi.dtype), done,
                                     levels.astype(qi.dtype), None),
            gamma=0.99, nstep=nstep, kappa=1.0)
        return loss.astype(jnp.float32)

    _check(f_iqn, (qi,), grad_wrt=0)


def test_scatter_connection_bf16(k):
    from di_hpc_tpu import network
    B, M, N, H, W = 4, 10, 6, 5, 5
    x = jax.random.normal(k[0], (B, M, N))
    loc = jnp.stack([jax.random.randint(k[1], (B, M), 0, H),
                     jax.random.randint(k[2], (B, M), 0, W)], axis=-1)

    def f(x):
        return jnp.sum(network.scatter_connection(
            x, (H, W), loc, "add").astype(jnp.float32) ** 2)

    _check(f, (x,), grad_wrt=0)
