"""Round-2 categorical-head variants: MXU-dot reductions + XLA backward.

Round-1 findings (profile_cat_variants.py): exp is memory-bound-free (98% SoL
probe); the cost is (a) VPU cross-lane reductions (~75us per reduction pass)
and (b) Mosaic's slow (blk,1)->(blk,N) broadcasts in the backward.  Here:
  fwd v4:  sums via (blk,N)@(N,1) MXU dots (overlap with VPU); only the
           row-max stays a VPU lane-reduction
  xla fwd: pure-jnp forward with iota-compare gather (no take_along_axis)
  grad:    pallas v4 forward + pure-jnp backward via custom_vjp
"""
# HISTORICAL RECORD: measures the RETIRED Pallas categorical head (removed in
# commit 6e65b9e after these measurements showed XLA's fusion ties/beats it).
# No longer runnable — kept as the measurement record the docs cite.
raise SystemExit("historical measurement record; the Pallas categorical "
                 "head it profiles was retired (see docs/DESIGN.md §2)")


import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


# ---- v4 forward: MXU reductions ----
def _fwd_v4(x_ref, a_ref, ones_ref, logp_ref, ent_ref, lse_ref):
    x = x_ref[:].astype(jnp.float32)               # (blk, N)
    a = a_ref[:]                                   # (blk, 1)
    ones = ones_ref[:]                             # (N, 1)
    m = jnp.max(x, axis=-1, keepdims=True)         # the one VPU lane-reduce
    e = jnp.exp(x - m)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    masked = jnp.where(col == a, x, 0.0)
    # Sum-reductions on the MXU (idle otherwise); VPU only does elementwise.
    s = jax.lax.dot_general(e, ones, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    sx = jax.lax.dot_general(e * x, ones, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    xa = jax.lax.dot_general(masked, ones, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    lse = m + jnp.log(s)
    ent = lse - sx / s
    logp_ref[:] = xa - lse
    ent_ref[:] = ent
    lse_ref[:] = lse


def call_fwd_v4(blk):
    row = lambda i: (i, 0)
    vec = pl.BlockSpec((blk, 1), row, memory_space=pltpu.VMEM)
    ones = jnp.ones((N, 1), jnp.float32)
    f = pl.pallas_call(
        _fwd_v4,
        out_shape=(jax.ShapeDtypeStruct((R, 1), jnp.float32),) * 3,
        grid=(pl.cdiv(R, blk),),
        in_specs=[pl.BlockSpec((blk, N), row, memory_space=pltpu.VMEM), vec,
                  pl.BlockSpec((N, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(vec, vec, vec),
        cost_estimate=pl.CostEstimate(flops=8 * R * N,
                                      bytes_accessed=(R * N + 4 * R) * 4,
                                      transcendentals=R * N),
    )
    return lambda x, a: f(x, a, ones)


# ---- pure-XLA forward with iota gather ----
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


# ---- composite grad: pallas v4 fwd + jnp bwd ----
def make_head(blk):
    fwd_call = call_fwd_v4(blk)

    @jax.custom_vjp
    def head(x, a):
        lp, ent, lse = fwd_call(x, a)
        return lp, ent

    def head_fwd(x, a):
        lp, ent, lse = fwd_call(x, a)
        return (lp, ent), (x, a, lse, ent)

    def head_bwd(res, g):
        x, a, lse, ent = res
        glp, gent = g
        logp = x - lse
        p = jnp.exp(logp)
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        dx = jnp.where(col == a, glp, 0.0) - p * (glp + gent * (logp + ent))
        return dx, None

    head.defvjp(head_fwd, head_bwd)
    return head


# correctness
lp0, ent0, lse0 = cat._call_fwd(x2, a2)
lp4, ent4, lse4 = call_fwd_v4(1024)(x2, a2)
assert jnp.allclose(lp0, lp4, atol=1e-4), (jnp.abs(lp0 - lp4).max())
assert jnp.allclose(ent0, ent4, atol=1e-4), (jnp.abs(ent0 - ent4).max())
lpx, entx, _ = xla_fwd(x2, a2)
assert jnp.allclose(lp0, lpx, atol=1e-4)
head = make_head(1024)


def head_loss(x):
    lp, ent = head(x, a2)
    return jnp.sum(lp) + 0.01 * jnp.sum(ent)


def cur_loss(x):
    lp, ent = cat.logp_entropy_pallas(x, a2)
    return jnp.sum(lp) + 0.01 * jnp.sum(ent)


g_new = jax.grad(head_loss)(x2)
g_old = jax.grad(cur_loss)(x2)
assert jnp.allclose(g_new, g_old, atol=1e-4), jnp.abs(g_new - g_old).max()
print("correctness ok", flush=True)

fwd_bytes = (R * N + 4 * R) * 4
grad_bytes = 3 * R * N * 4

report("fwd v4 blk1024", bench_fn(lambda x: call_fwd_v4(1024)(x, a2), x2), fwd_bytes)
report("fwd v4 blk4096", bench_fn(lambda x: call_fwd_v4(4096)(x, a2), x2), fwd_bytes)
report("fwd xla iota-gather", bench_fn(lambda x: xla_fwd(x, a2), x2), fwd_bytes)
report("grad v4+xla-bwd", bench_fn(jax.grad(head_loss), x2), grad_bytes)
report("grad current", bench_fn(jax.grad(cur_loss), x2), grad_bytes)
print("done", flush=True)
