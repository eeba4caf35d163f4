"""Benchmark optimized categorical-head kernel variants on the real TPU.

Findings from profile_vtrace.py head: current pallas fwd = 208us (20% SoL),
pallas fwd+bwd = 550us, while XLA autodiff fwd+bwd = 192us (64% SoL).
Variants tested here:
  v2 fwd:   division-free entropy (ent = lse - sum(e*x)/s), bigger row blocks
  logp:     logp-only kernel (no entropy work) for the behaviour head
  xla_bwd:  custom-vjp backward as plain jnp (recompute from stashed lse/ent)
  v3 bwd:   division-free pallas backward
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


# ---- v2 forward: division-free entropy ----
def _fwd_v2(x_ref, a_ref, logp_ref, ent_ref, lse_ref):
    x = x_ref[:].astype(jnp.float32)
    a = a_ref[:]
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    sx = jnp.sum(e * x, axis=-1, keepdims=True)
    lse = m + jnp.log(s)
    ent = lse - sx / s
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    xa = jnp.sum(jnp.where(col == a, x, 0.0), axis=-1, keepdims=True)
    logp_ref[:] = xa - lse
    ent_ref[:] = ent
    lse_ref[:] = lse


def call_fwd_v2(blk):
    row = lambda i: (i, 0)
    vec = pl.BlockSpec((blk, 1), row, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fwd_v2,
        out_shape=(jax.ShapeDtypeStruct((R, 1), jnp.float32),) * 3,
        grid=(pl.cdiv(R, blk),),
        in_specs=[pl.BlockSpec((blk, N), row, memory_space=pltpu.VMEM), vec],
        out_specs=(vec, vec, vec),
        cost_estimate=pl.CostEstimate(flops=8 * R * N,
                                      bytes_accessed=(R * N + 4 * R) * 4,
                                      transcendentals=R * N),
    )


# ---- logp-only forward ----
def _fwd_logp(x_ref, a_ref, logp_ref):
    x = x_ref[:].astype(jnp.float32)
    a = a_ref[:]
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    lse = m + jnp.log(s)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    xa = jnp.sum(jnp.where(col == a, x, 0.0), axis=-1, keepdims=True)
    logp_ref[:] = xa - lse


def call_fwd_logp(blk):
    row = lambda i: (i, 0)
    vec = pl.BlockSpec((blk, 1), row, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fwd_logp,
        out_shape=jax.ShapeDtypeStruct((R, 1), jnp.float32),
        grid=(pl.cdiv(R, blk),),
        in_specs=[pl.BlockSpec((blk, N), row, memory_space=pltpu.VMEM), vec],
        out_specs=vec,
        cost_estimate=pl.CostEstimate(flops=5 * R * N,
                                      bytes_accessed=(R * N + 2 * R) * 4,
                                      transcendentals=R * N),
    )


# ---- XLA backward (recompute from stashed lse/ent) ----
@jax.jit
def xla_bwd(x, a, lse, ent, glp, gent):
    logp = x - lse
    p = jnp.exp(logp)
    onehot = jax.nn.one_hot(a[:, 0], N, dtype=x.dtype)
    return glp * onehot - p * (glp + gent * (logp + ent))


# ---- v3 pallas backward: division-free, fused coefficient ----
def _bwd_v3(x_ref, a_ref, lse_ref, ent_ref, glp_ref, gent_ref, dx_ref):
    x = x_ref[:].astype(jnp.float32)
    a = a_ref[:]
    lse = lse_ref[:]
    ent = ent_ref[:]
    glp = glp_ref[:]
    gent = gent_ref[:]
    logp = x - lse
    p = jnp.exp(logp)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    dx = jnp.where(col == a, glp, 0.0) - p * (glp + gent * (logp + ent))
    dx_ref[:] = dx.astype(dx_ref.dtype)


def call_bwd_v3(blk):
    row = lambda i: (i, 0)
    vec = pl.BlockSpec((blk, 1), row, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bwd_v3,
        out_shape=jax.ShapeDtypeStruct((R, N), jnp.float32),
        grid=(pl.cdiv(R, blk),),
        in_specs=[pl.BlockSpec((blk, N), row, memory_space=pltpu.VMEM),
                  vec, vec, vec, vec, vec],
        out_specs=pl.BlockSpec((blk, N), row, memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(flops=8 * R * N,
                                      bytes_accessed=2 * R * N * 4,
                                      transcendentals=R * N),
    )


# ---- isolation probes ----
def _probe_exp(x_ref, o_ref):
    o_ref[:] = jnp.exp(x_ref[:])


def _probe_reduce(x_ref, o_ref):
    x = x_ref[:]
    m = jnp.max(x, axis=-1, keepdims=True)
    s = jnp.sum(x, axis=-1, keepdims=True)
    o_ref[:] = m + s


def call_probe(kern, out_cols, blk):
    row = lambda i: (i, 0)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((R, out_cols), jnp.float32),
        grid=(pl.cdiv(R, blk),),
        in_specs=[pl.BlockSpec((blk, N), row, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((blk, out_cols), row, memory_space=pltpu.VMEM),
    )


which = sys.argv[1] if len(sys.argv) > 1 else "all"

# correctness spot-check against current kernels (on-device, cheap)
lp0, ent0, lse0 = cat._call_fwd(x2, a2)
lp2, ent2, lse2 = call_fwd_v2(1024)(x2, a2)
assert jnp.allclose(lp0, lp2, atol=1e-5), "v2 logp mismatch"
assert jnp.allclose(ent0, ent2, atol=1e-4), "v2 entropy mismatch"
lpL = call_fwd_logp(1024)(x2, a2)
assert jnp.allclose(lp0, lpL, atol=1e-5), "logp-only mismatch"
glp = jnp.ones((R, 1), jnp.float32)
gent = jnp.full((R, 1), 0.01, jnp.float32)
dx0 = cat._call_bwd(x2, a2, lse0, ent0, glp, gent)
dx3 = call_bwd_v3(1024)(x2, a2, lse0, ent0, glp, gent)
dxx = xla_bwd(x2, a2, lse0, ent0, glp, gent)
assert jnp.allclose(dx0, dx3, atol=1e-5), "v3 bwd mismatch"
assert jnp.allclose(dx0, dxx, atol=1e-5), "xla bwd mismatch"
print("correctness ok", flush=True)

fwd_bytes = (R * N + 4 * R) * 4
bwd_bytes = 2 * R * N * 4

if which in ("all", "fwd"):
    report("fwd v2 blk1024", bench_fn(lambda x: call_fwd_v2(1024)(x, a2), x2), fwd_bytes)
    report("fwd v2 blk4096", bench_fn(lambda x: call_fwd_v2(4096)(x, a2), x2), fwd_bytes)
    report("fwd logp-only blk4096", bench_fn(lambda x: call_fwd_logp(4096)(x, a2), x2), fwd_bytes)

if which in ("all", "probe"):
    report("probe exp-only blk4096",
           bench_fn(lambda x: call_probe(_probe_exp, N, 4096)(x), x2),
           2 * R * N * 4)
    report("probe max+sum reduce blk4096",
           bench_fn(lambda x: call_probe(_probe_reduce, 1, 4096)(x), x2),
           R * N * 4)

if which in ("all", "bwd"):
    report("bwd v3 blk1024", bench_fn(lambda x: call_bwd_v3(1024)(x, a2, lse0, ent0, glp, gent), x2), bwd_bytes)
    report("bwd v3 blk2048", bench_fn(lambda x: call_bwd_v3(2048)(x, a2, lse0, ent0, glp, gent), x2), bwd_bytes)
    report("bwd xla", bench_fn(lambda x: xla_bwd(x, a2, lse0, ent0, glp, gent), x2), bwd_bytes)

print("done", flush=True)
