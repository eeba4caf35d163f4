"""Round-3 categorical-head variants.

Round-2 result: MXU-dot reductions are WORSE (338us vs 208us) — a (blk,N)@
(N,1) dot uses 1/128th of the MXU's output tile, and HIGHEST precision
triples the passes.  Remaining candidates:
  xla fwd:   pure-jnp forward with iota-compare gather (is the pallas fwd
             kernel even needed?)
  hybrid:    current pallas fwd + pure-jnp backward via custom_vjp
"""
# HISTORICAL RECORD: measures the RETIRED Pallas categorical head (removed in
# commit 6e65b9e after these measurements showed XLA's fusion ties/beats it).
# No longer runnable — kept as the measurement record the docs cite.
raise SystemExit("historical measurement record; the Pallas categorical "
                 "head it profiles was retired (see docs/DESIGN.md §2)")


import jax
import jax.numpy as jnp

from di_hpc_tpu.utils.profiling import bench_fn, roofline
from di_hpc_tpu.pallas_kernels import categorical as cat

T, B, N = 128, 512, 128
R = T * B
key = jax.random.PRNGKey(0)
k1, k3 = jax.random.split(key, 2)
x2 = jax.random.normal(k1, (R, N), jnp.float32)
a2 = jax.random.randint(k3, (R, 1), 0, N)


def report(name, sec, nbytes):
    r = roofline(sec, nbytes)
    print(f"{name:<38} {sec*1e6:9.1f} us   {r.achieved_gbps/1e9:6.0f} GB/s "
          f"({r.sol_fraction*100:5.1f}% SoL)", flush=True)


@jax.jit
def xla_fwd(x, a):
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    sx = jnp.sum(e * x, axis=-1, keepdims=True)
    lse = m + jnp.log(s)
    ent = lse - sx / s
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    xa = jnp.sum(jnp.where(col == a, x, 0.0), axis=-1, keepdims=True)
    return xa - lse, ent, lse


# hybrid: current pallas fwd + jnp bwd
@jax.custom_vjp
def hybrid_head(x, a):
    lp, ent, lse = cat._call_fwd(x, a)
    return lp, ent


def _h_fwd(x, a):
    lp, ent, lse = cat._call_fwd(x, a)
    return (lp, ent), (x, a, lse, ent)


def _h_bwd(res, g):
    x, a, lse, ent = res
    glp, gent = g
    logp = x - lse
    p = jnp.exp(logp)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    dx = jnp.where(col == a, glp, 0.0) - p * (glp + gent * (logp + ent))
    return dx, None


hybrid_head.defvjp(_h_fwd, _h_bwd)


def hybrid_loss(x):
    lp, ent = hybrid_head(x, a2)
    return jnp.sum(lp) + 0.01 * jnp.sum(ent)


def cur_loss(x):
    lp, ent = cat.logp_entropy_pallas(x, a2)
    return jnp.sum(lp) + 0.01 * jnp.sum(ent)


# correctness
lp0, ent0, lse0 = cat._call_fwd(x2, a2)
lpx, entx, _ = xla_fwd(x2, a2)
assert jnp.allclose(lp0, lpx, atol=1e-4)
assert jnp.allclose(ent0, entx, atol=1e-4)
g_new = jax.grad(hybrid_loss)(x2)
g_old = jax.grad(cur_loss)(x2)
assert jnp.allclose(g_new, g_old, atol=1e-4), jnp.abs(g_new - g_old).max()
print("correctness ok", flush=True)

fwd_bytes = (R * N + 4 * R) * 4
grad_bytes = 3 * R * N * 4

report("fwd xla iota-gather", bench_fn(lambda x: xla_fwd(x, a2), x2), fwd_bytes)
report("grad hybrid (pallas fwd + xla bwd)", bench_fn(jax.grad(hybrid_loss), x2), grad_bytes)
report("grad current (all pallas)", bench_fn(jax.grad(cur_loss), x2), grad_bytes)
print("done", flush=True)
