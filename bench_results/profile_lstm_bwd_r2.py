"""Decompose the LSTM fwd+grad train-path time (S=32, B=256, H=512, L=2,
f32): per-layer Pallas kernels vs the XLA x-side work (x@Wx GEMM, LN_x
fwd+bwd, dWx/dx GEMMs, dWh GEMM).  Decides whether folding LN_x into the
kernels is worth the plumbing (round-2 VERDICT task 5 follow-up).

Usage: PYTHONPATH=/root/repo python bench_results/profile_lstm_bwd_r2.py
"""

import jax
import jax.numpy as jnp

from di_hpc_tpu import network, origin
from di_hpc_tpu.origin.rnn import layer_norm
from di_hpc_tpu.pallas_kernels import lstm_cell as lc
from di_hpc_tpu.utils.profiling import bench_fn


def p(name, t):
    print(f"{name:<38} {t*1e6:9.1f} us", flush=True)


S, B, H, L = 32, 256, 512, 2
ks = jax.random.split(jax.random.PRNGKey(0), 8)
params = origin.init_lstm_params(ks[0], H, H, L, "LN")
x = jax.random.normal(ks[1], (S, B, H))
gx = jax.random.normal(ks[2], (S, B, 4 * H)) * 0.5
wh = jax.random.normal(ks[3], (H, 4 * H)) / jnp.sqrt(H)
gln = jnp.abs(jax.random.normal(ks[4], (4 * H,))) + 0.5
bln = jax.random.normal(ks[5], (4 * H,)) * 0.1
h0 = jax.random.normal(ks[6], (B, H))
c0 = jnp.zeros((B, H))

# full path
p("lstm fwd (L=2)", bench_fn(
    lambda xx: network.lstm_fused(params, xx, None, "LN")[0], x))


def loss(p_, xx):
    y, _ = network.lstm_fused(p_, xx, None, "LN")
    return jnp.sum(y ** 2)


p("lstm fwd+grad (L=2)", bench_fn(
    lambda xx: jax.grad(loss, argnums=(0, 1))(params, xx)[1], x))

# per-layer kernels in isolation (post LN_x fold: gx here is the RAW x@Wx
# projection and the kernel also applies LN_x + bias in-kernel)
glnx = jnp.abs(jax.random.normal(ks[7], (4 * H,))) + 0.5
blnx = jax.random.normal(ks[7], (4 * H,)) * 0.1
bias = jax.random.normal(ks[7], (4 * H,)) * 0.1
p("fwd kernel stash=True (1 layer)", bench_fn(
    lambda g: lc._layer_impl(g, wh, glnx, blnx, gln, bln, bias, h0, c0,
                             True, stash=True)[0], gx))
p("fwd kernel stash=False (1 layer)", bench_fn(
    lambda g: lc._layer_impl(g, wh, glnx, blnx, gln, bln, bias, h0, c0,
                             True, stash=False)[0], gx))

y_, c_seq, hn, cn = jax.jit(
    lambda g: lc._layer_impl(g, wh, glnx, blnx, gln, bln, bias, h0, c0,
                             True, stash=True))(gx)
dy = jnp.ones_like(y_)
dhn = jnp.zeros_like(hn)
dcn = jnp.zeros_like(cn)
p("bwd kernel v2 (1 layer)", bench_fn(
    lambda g: lc._bwd_impl_v2(g, y_, c_seq, dy, wh, glnx, blnx, gln, bln,
                              bias, h0, c0, dhn, dcn, True)[0], gx))

# XLA-side pieces
dg_pre = jnp.ones((S, B, 4 * H))
p("dWh einsum (1 layer)", bench_fn(
    lambda yy: jnp.einsum("sbh,sbg->hg", yy[:-1], dg_pre[1:]), y_))
wx = params.wx[0]
p("x@Wx GEMM (1 layer)", bench_fn(
    lambda xx: jnp.einsum("sbi,ih->sbh", xx, wx,
                          preferred_element_type=xx.dtype), x))
gxp = jax.jit(lambda xx: jnp.einsum("sbi,ih->sbh", xx, wx))(x)
gamma_x, beta_x = params.ln_gamma_x[0], params.ln_beta_x[0]
p("LN_x fwd (1 layer)", bench_fn(
    lambda g: layer_norm(g, gamma_x, beta_x), gxp))


def lnx_loss(g):
    return jnp.sum(layer_norm(g, gamma_x, beta_x) ** 2)


p("LN_x fwd+bwd (1 layer)", bench_fn(
    lambda g: jax.grad(lnx_loss)(g), gxp))

# full x-side: GEMM + LN + bias, fwd+grad wrt x and wx
def xside_loss(xx, w):
    g = jnp.einsum("sbi,ih->sbh", xx, w, preferred_element_type=xx.dtype)
    g = layer_norm(g, gamma_x, beta_x) + params.bias[0]
    return jnp.sum(g ** 2)


p("x-side GEMM+LN+bias fwd+grad (1 lyr)", bench_fn(
    lambda xx: jax.grad(xside_loss, argnums=(0, 1))(xx, wx)[0], x))
print("done", flush=True)
