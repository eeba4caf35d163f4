"""Prototype: single-pass Pallas categorical-head stats at the north-star
vtrace shape (T=1024, B=4096, N=32) — diagnostic, not part of bench.

profile_vtrace_ns.py showed the heads are 5,501us of the 5,563us stage
(23.8% SoL): XLA lowers each of the head's reductions (max, sum e, sum e*x,
gather-sum, x2 for two heads) as a SEPARATE pass over the 537MB logits
arrays.  At the small reference shape (33MB) those re-reads are cache-
resident (the ~37us/pass lore) and the jnp head wins; at 1GB+ they are real
HBM traffic.  This kernel reads each logits element ONCE and emits per-row
stats (m, s, sx, xa) packed as dense (R/128, 128) planes; log/div/exp
epilogues run outside (in-kernel log is only ~1e-4 accurate).

Usage: python bench_results/profile_head_kernel.py [mem|read|stats|full]
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
from di_hpc_tpu import ops

T, B, N = 1024, 4096, 32
R = T * B
G = R // 128
kn = jax.random.split(jax.random.PRNGKey(7), 3)
to = jax.random.normal(kn[0], (T, B, N))
bo = jax.random.normal(kn[1], (T, B, N))
act = jax.random.randint(kn[2], (T, B), 0, N)

LOGITS_MB = R * N * 4 / 1e6
PLANE_MB = R * 4 / 1e6


def report(name, args, make_body, K, mb):
    sec, compile_s = _bench_loop(make_body, K, n=3, args=args)
    floor = mb * 1e6 / (_HBM_GBS * 1e3)
    print(f"{name:<30} {sec*1e6:9.1f} us   floor {floor:8.1f} us "
          f"({100*floor/(sec*1e6):5.1f}% SoL, compile {compile_s:.1f}s)",
          flush=True)
    return sec


which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "mem"):
    dev = jax.devices()[0]
    try:
        before = dev.memory_stats()["bytes_in_use"]
        probe = jnp.zeros((T, B, N), jnp.float32)
        probe.block_until_ready()
        after = dev.memory_stats()["bytes_in_use"]
        print(f"physical bytes for (1024,4096,32) f32: {(after-before)/1e6:.1f} MB "
              f"(logical {LOGITS_MB:.1f} MB)", flush=True)
        del probe
    except Exception as e:  # noqa: BLE001
        print(f"memory_stats unavailable: {e}", flush=True)


def _read_kernel(x_ref, o_ref):
    o_ref[:] = jnp.sum(x_ref[:], axis=-1)


def _stats_kernel(x_ref, act_ref, m_ref, s_ref, sx_ref, xa_ref):
    x = x_ref[:].astype(jnp.float32)            # (bG, 128, N)
    a = act_ref[:]                              # (bG, 128) int32
    m = jnp.max(x, axis=-1)
    e = jnp.exp(x - m[..., None])
    s = jnp.sum(e, axis=-1)
    sx = jnp.sum(e * x, axis=-1)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
    xa = jnp.sum(jnp.where(col == a[..., None], x, 0.0), axis=-1)
    m_ref[:] = m
    s_ref[:] = s
    sx_ref[:] = sx
    xa_ref[:] = xa


def _call_stats(x, a, bG):
    xg = x.reshape(G, 128, N)
    ag = a.reshape(G, 128).astype(jnp.int32)
    o_spec = pl.BlockSpec((bG, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _stats_kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((G, 128), jnp.float32)
                        for _ in range(4)),
        grid=(G // bG,),
        in_specs=[
            pl.BlockSpec((bG, 128, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bG, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(o_spec, o_spec, o_spec, o_spec),
        cost_estimate=pl.CostEstimate(
            flops=8 * R * N, bytes_accessed=R * N * 4 + 5 * R * 4,
            transcendentals=R * N),
    )(xg, ag)


if which in ("all", "read"):
    for bG in (8, 16, 32):
        def mk_read(carry, a, init=False, bG=bG):
            (x,) = _dep(None if init else carry, a[0])
            xg = x.reshape(G, 128, N)
            out = pl.pallas_call(
                _read_kernel,
                out_shape=jax.ShapeDtypeStruct((G, 128), jnp.float32),
                grid=(G // bG,),
                in_specs=[pl.BlockSpec((bG, 128, N), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((bG, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
            )(xg)
            return jnp.sum(out) * 1e-12 + 1.0
        report(f"pallas read bG={bG}", (to,), mk_read, K=100,
               mb=LOGITS_MB + PLANE_MB)

if which in ("all", "stats"):
    for bG in (8, 16, 32):
        def mk_stats(carry, a, init=False, bG=bG):
            x, = _dep(None if init else carry, a[0])
            m, s, sx, xa = _call_stats(x, act, bG)
            return (jnp.sum(m) + jnp.sum(s) + jnp.sum(sx) + jnp.sum(xa)) * 1e-12 + 1.0
        report(f"stats kernel bG={bG}", (to,), mk_stats, K=100,
               mb=LOGITS_MB + 5 * PLANE_MB)

if which in ("all", "vreduce"):
    # Variadic lax.reduce: ONE HLO Reduce computes (m, s, sx, xa) together
    # via the online-softmax monoid — all four operands are elementwise
    # functions of x, so XLA's fusion reads the logits ONCE per head
    # instead of once per reduction.
    def _vreduce_stats(x, a, with_ent):
        x = x.astype(jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
        xa_arr = jnp.where(col == a[..., None], x, 0.0)
        ones = jnp.ones_like(x)

        if with_ent:
            def comb(acc, val):
                m1, s1, sx1, xa1 = acc
                m2, s2, sx2, xa2 = val
                M = jnp.maximum(m1, m2)
                e1 = jnp.exp(m1 - M)
                e2 = jnp.exp(m2 - M)
                return (M, s1 * e1 + s2 * e2, sx1 * e1 + sx2 * e2, xa1 + xa2)
            return jax.lax.reduce(
                (x, ones, x, xa_arr),
                (jnp.float32(-jnp.inf), jnp.float32(0), jnp.float32(0),
                 jnp.float32(0)),
                comb, (x.ndim - 1,))

        def comb3(acc, val):
            m1, s1, xa1 = acc
            m2, s2, xa2 = val
            M = jnp.maximum(m1, m2)
            return (M, s1 * jnp.exp(m1 - M) + s2 * jnp.exp(m2 - M), xa1 + xa2)
        return jax.lax.reduce(
            (x, ones, xa_arr),
            (jnp.float32(-jnp.inf), jnp.float32(0), jnp.float32(0)),
            comb3, (x.ndim - 1,))

    def mk_vreduce_heads(carry, a, init=False):
        t, b = _dep(None if init else carry, a[0], a[1])
        mt, st, sxt, xat = _vreduce_stats(t, act, True)
        lse_t = mt + jnp.log(st)
        lp_t = xat - lse_t
        ent = lse_t - sxt / st
        mb_, sb, xab = _vreduce_stats(b, act, False)
        lp_b = xab - (mb_ + jnp.log(sb))
        IS = jnp.exp(lp_t - lp_b)
        return (jnp.sum(lp_t) + jnp.sum(ent) + jnp.sum(IS)) * 1e-12 + 1.0
    report("vreduce heads", (to, bo), mk_vreduce_heads, K=60,
           mb=2 * LOGITS_MB)

    mt, st, sxt, xat = _vreduce_stats(to, act, True)
    lse_t = mt + jnp.log(st)
    lp_k = xat - lse_t
    ent_k = lse_t - sxt / st
    lp_j, ent_j = ops.categorical.logp_entropy(to, act)
    print("vreduce max |lp diff|", float(jnp.max(jnp.abs(lp_k - lp_j))),
          " max |ent diff|", float(jnp.max(jnp.abs(ent_k - ent_j))), flush=True)

if which in ("all", "vreduce2"):
    # Two-pass variant: exact max reduce first, then an ADD-ONLY variadic
    # reduce of (e, e*x, xa) with exp computed elementwise outside the
    # combiner — trades one extra pass per head for exact-max accuracy
    # (the online combiner's in-tree exp measured ~1.6e-4 abs on TPU).
    def _vreduce2_stats(x, a, with_ent):
        x = x.astype(jnp.float32)
        m = jnp.max(x, axis=-1)
        e = jnp.exp(x - m[..., None])
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
        xa_arr = jnp.where(col == a[..., None], x, 0.0)

        def add_comb(acc, val):
            return tuple(a_ + v_ for a_, v_ in zip(acc, val))

        if with_ent:
            s, sx, xa = jax.lax.reduce(
                (e, e * x, xa_arr),
                (jnp.float32(0), jnp.float32(0), jnp.float32(0)),
                add_comb, (x.ndim - 1,))
            return m, s, sx, xa
        s, xa = jax.lax.reduce(
            (e, xa_arr), (jnp.float32(0), jnp.float32(0)),
            add_comb, (x.ndim - 1,))
        return m, s, xa

    def mk_vreduce2_heads(carry, a, init=False):
        t, b = _dep(None if init else carry, a[0], a[1])
        mt, st, sxt, xat = _vreduce2_stats(t, act, True)
        lse_t = mt + jnp.log(st)
        lp_t = xat - lse_t
        ent = lse_t - sxt / st
        mb_, sb, xab = _vreduce2_stats(b, act, False)
        lp_b = xab - (mb_ + jnp.log(sb))
        IS = jnp.exp(lp_t - lp_b)
        return (jnp.sum(lp_t) + jnp.sum(ent) + jnp.sum(IS)) * 1e-12 + 1.0
    report("vreduce2 heads (2-pass)", (to, bo), mk_vreduce2_heads, K=60,
           mb=2 * LOGITS_MB)

    mt, st, sxt, xat = _vreduce2_stats(to, act, True)
    lse_t = mt + jnp.log(st)
    lp_k = xat - lse_t
    ent_k = lse_t - sxt / st
    lp_j, ent_j = ops.categorical.logp_entropy(to, act)
    print("vreduce2 max |lp diff|", float(jnp.max(jnp.abs(lp_k - lp_j))),
          " max |ent diff|", float(jnp.max(jnp.abs(ent_k - ent_j))), flush=True)

if which in ("all", "small"):
    # Small/cache-resident shape (the vtrace_grad / upgo bench config):
    # does the one-pass reduce also beat the multi-pass jnp head when the
    # re-reads are cache-hits?
    Ts, Bs, Ns = 128, 512, 128
    ksm = jax.random.split(jax.random.PRNGKey(11), 3)
    to_s = jax.random.normal(ksm[0], (Ts, Bs, Ns))
    bo_s = jax.random.normal(ksm[1], (Ts, Bs, Ns))
    act_s = jax.random.randint(ksm[2], (Ts, Bs), 0, Ns)
    small_mb = 2 * Ts * Bs * Ns * 4 / 1e6

    def _mk_pair(head_fn):
        def mk(carry, a, init=False):
            t, b = _dep(None if init else carry, a[0], a[1])
            lp_t, ent, IS = head_fn(t, b, act_s)
            return (jnp.sum(lp_t) + jnp.sum(ent) + jnp.sum(IS)) * 1e-12 + 1.0
        return mk

    def jnp_pair(t, b, a):
        lp_t, ent = ops.categorical.logp_entropy(t, a)
        lp_b = ops.categorical.logp(b, a)
        return lp_t, ent, jnp.exp(lp_t - lp_b)

    def vr_pair(t, b, a):
        x = t.astype(jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
        xa_arr = jnp.where(col == a[..., None], x, 0.0)

        def comb(acc, val):
            m1, s1, sx1, xa1 = acc
            m2, s2, sx2, xa2 = val
            M = jnp.maximum(m1, m2)
            e1 = jnp.exp(m1 - M)
            e2 = jnp.exp(m2 - M)
            return (M, s1 * e1 + s2 * e2, sx1 * e1 + sx2 * e2, xa1 + xa2)
        m, s, sx, xa = jax.lax.reduce(
            (x, jnp.ones_like(x), x, xa_arr),
            (jnp.float32(-jnp.inf), jnp.float32(0), jnp.float32(0),
             jnp.float32(0)), comb, (x.ndim - 1,))
        lse = m + jnp.log(s)
        lp_t = xa - lse
        ent = lse - sx / s

        xb = b.astype(jnp.float32)
        xab_arr = jnp.where(col == a[..., None], xb, 0.0)

        def comb3(acc, val):
            m1, s1, xa1 = acc
            m2, s2, xa2 = val
            M = jnp.maximum(m1, m2)
            return (M, s1 * jnp.exp(m1 - M) + s2 * jnp.exp(m2 - M), xa1 + xa2)
        mb_, sb, xab = jax.lax.reduce(
            (xb, jnp.ones_like(xb), xab_arr),
            (jnp.float32(-jnp.inf), jnp.float32(0), jnp.float32(0)),
            comb3, (xb.ndim - 1,))
        lp_b = xab - (mb_ + jnp.log(sb))
        return lp_t, ent, jnp.exp(lp_t - lp_b)

    report("small jnp heads", (to_s, bo_s), _mk_pair(jnp_pair), K=1000,
           mb=small_mb)
    report("small vreduce heads", (to_s, bo_s), _mk_pair(vr_pair), K=1000,
           mb=small_mb)

if which in ("all", "full"):
    def mk_full_heads(carry, a, init=False, bG=16):
        t, b = _dep(None if init else carry, a[0], a[1])
        mt, st, sxt, xat = _call_stats(t, act, bG)
        mb_, sb, _, xab = _call_stats(b, act, bG)
        lse_t = mt + jnp.log(st)
        lp_t = xat - lse_t
        ent = lse_t - sxt / st
        lp_b = xab - (mb_ + jnp.log(sb))
        IS = jnp.exp(lp_t - lp_b)
        return (jnp.sum(lp_t) + jnp.sum(ent) + jnp.sum(IS)) * 1e-12 + 1.0
    report("pallas heads + epilogue", (to, bo), mk_full_heads, K=60,
           mb=2 * LOGITS_MB + 2 * 5 * PLANE_MB)

    def mk_jnp_heads(carry, a, init=False):
        t, b = _dep(None if init else carry, a[0], a[1])
        lp_t, ent = ops.categorical.logp_entropy(t, act)
        lp_b = ops.categorical.logp(b, act)
        IS = jnp.exp(lp_t - lp_b)
        return (jnp.sum(lp_t) + jnp.sum(ent) + jnp.sum(IS)) * 1e-12 + 1.0
    report("jnp heads (current)", (to, bo), mk_jnp_heads, K=60,
           mb=2 * LOGITS_MB)

    # correctness spot-check against the jnp head
    mt, st, sxt, xat = _call_stats(to, act, 16)
    lse_t = mt + jnp.log(st)
    lp_k = (xat - lse_t).reshape(T, B)
    ent_k = (lse_t - sxt / st).reshape(T, B)
    lp_j, ent_j = ops.categorical.logp_entropy(to, act)
    import numpy as np
    print("max |lp diff|", float(jnp.max(jnp.abs(lp_k - lp_j))),
          " max |ent diff|", float(jnp.max(jnp.abs(ent_k - ent_j))), flush=True)

print("done", flush=True)
