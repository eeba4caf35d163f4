"""Re-measure the two-level chunked suffix scan for FULL-PLANE coefficients
(diagnostic, not part of bench) — the VERDICT r3 lever (b).

The r2 retirement of the chunked scheme covered only row-constant-b gae and
predates the harness fixes (negative_results.json: chunked_two_level_scan
says so itself).  For full-plane b (vtrace's cs, upgo's binary lambdas) the
doubling scan shifts BOTH aa and bb every pass — log2(T)=10 passes at
T=1024 — while a chunked scheme does log2(L) in-chunk passes + a tiny
cross-chunk scan + one fix-up pass, ~30% less VMEM shift traffic.

This clones the vtrace kernel with the chunked scan and A/Bs it against the
shipping kernel at the north-star plane shape (T=1024, B=4096).

Usage: python bench_results/profile_chunked_scan_r4.py
"""
import functools
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import bench  # noqa: E402
from bench import _bench_loop, _dep, _HBM_GBS
from di_hpc_tpu.pallas_kernels import rl_scans
from di_hpc_tpu.pallas_kernels import linear_scan as _ls

T, B = 1024, 4096
ks = jax.random.split(jax.random.PRNGKey(0), 4)
value = jax.random.normal(ks[0], (T + 1, B))
reward = jax.random.normal(ks[1], (T, B))
IS = jnp.exp(jax.random.normal(ks[2], (T, B)) * 0.3)
PLANE_MB = T * B * 4 / 1e6


def _suffix_scan_chunked(aa, bb, L):
    """Two-level suffix composition: y[t] = a[t] + b[t]*y[t+1], y[T] = 0.

    Level 1: doubling scan WITHIN chunks of length L (vectorized over
    chunks).  Level 2: cross-chunk suffix scan of the (C,) chunk composites.
    Fix-up: y = y_local + suffix_prod_local * carry_in_from_right.
    """
    T_, blk = aa.shape
    C = T_ // L
    a = aa.reshape(C, L, blk)
    b = bb.reshape(C, L, blk)
    k = 1
    while k < L:
        zero_tail = jnp.zeros((C, k, blk), a.dtype)
        one_tail = jnp.ones((C, k, blk), b.dtype)
        a_sh = jnp.concatenate([a[:, k:], zero_tail], axis=1)
        b_sh = jnp.concatenate([b[:, k:], one_tail], axis=1)
        a = a + b * a_sh
        b = b * b_sh
        k *= 2
    # Chunk composites: row 0 now holds (A_c, B_c) for the whole chunk.
    A = a[:, 0]                       # (C, blk)
    Bc = b[:, 0]                      # (C, blk)
    # Cross-chunk suffix scan (small: C rows).
    carry = jnp.zeros((1, blk), aa.dtype)
    carries = [carry]
    for c in range(C - 1, 0, -1):
        carry = A[c][None] + Bc[c][None] * carry
        carries.append(carry)
    carry_in = jnp.concatenate(carries[::-1], axis=0)  # (C, blk), right-carry
    return (a + b * carry_in[:, None, :]).reshape(T_, blk)


def _vtrace_kernel_chunked(is_ref, reward_ref, value_ref, ret_ref, adv_ref,
                           *, gamma, lambda_, rho_clip, c_clip, pg_clip, T, L):
    IS_ = is_ref[:]
    r = reward_ref[:]
    v = value_ref[:]
    rhos = jnp.minimum(IS_, rho_clip)
    cs = jnp.minimum(IS_, c_clip)
    delta = rhos * (r + gamma * v[1:] - v[:-1])
    items = _suffix_scan_chunked(delta, gamma * lambda_ * cs, L)
    ret = v[:-1] + items
    ret_ref[:] = ret
    ret_tp1 = jnp.concatenate([ret[1:], v[-1:]], axis=0)
    adv_ref[:] = jnp.minimum(IS_, pg_clip) * (r + gamma * ret_tp1 - v[:-1])


@functools.partial(jax.jit, static_argnames=("L", "blk"))
def vtrace_chunked(is_w, rew, val, L, blk):
    T_, B_ = rew.shape
    kernel = functools.partial(
        _vtrace_kernel_chunked, gamma=0.99, lambda_=0.95, rho_clip=1.0,
        c_clip=1.0, pg_clip=1.0, T=T_, L=L)
    tb = lambda i: (0, i)
    spec = pl.BlockSpec((T_, blk), tb, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((T_, B_), rew.dtype),
                   jax.ShapeDtypeStruct((T_, B_), rew.dtype)),
        grid=(pl.cdiv(B_, blk),),
        in_specs=[spec, spec,
                  pl.BlockSpec((T_ + 1, blk), tb, memory_space=pltpu.VMEM)],
        out_specs=(spec, spec),
        interpret=_ls.INTERPRET,
    )(is_w, rew, val)


# correctness vs shipping kernel
want_ret, want_adv = rl_scans.vtrace_returns_adv_pallas(
    IS, reward, value, 0.99, 0.95, 1.0, 1.0, 1.0)
import numpy as np
for L in (64, 128, 256):
    got_ret, got_adv = vtrace_chunked(IS, reward, value, L, 128)
    print(f"L={L} max|ret diff| {float(jnp.max(jnp.abs(got_ret-want_ret))):.2e}"
          f" max|adv diff| {float(jnp.max(jnp.abs(got_adv-want_adv))):.2e}",
          flush=True)


def report(name, make_body, K, mb):
    sec, compile_s = _bench_loop(make_body, K, n=3,
                                 args=(IS, reward, value))
    floor = mb * 1e6 / (_HBM_GBS * 1e3)
    print(f"{name:<30} {sec*1e6:9.1f} us   floor {floor:8.1f} us "
          f"({100*floor/(sec*1e6):5.1f}% SoL, compile {compile_s:.1f}s)",
          flush=True)


def mk_ship(carry, a, init=False):
    i_, r_, v_ = _dep(None if init else carry, *a)
    ret, adv = rl_scans.vtrace_returns_adv_pallas(i_, r_, v_, 0.99, 0.95,
                                                  1.0, 1.0, 1.0)
    return (jnp.sum(ret) + jnp.sum(adv)) * 1e-12 + 1.0


report("shipping doubling scan", mk_ship, K=500, mb=5 * PLANE_MB)

for L in (64, 128, 256):
    def mk_ch(carry, a, init=False, L=L):
        i_, r_, v_ = _dep(None if init else carry, *a)
        ret, adv = vtrace_chunked(i_, r_, v_, L, 128)
        return (jnp.sum(ret) + jnp.sum(adv)) * 1e-12 + 1.0
    report(f"chunked L={L}", mk_ch, K=500, mb=5 * PLANE_MB)

print("done", flush=True)
