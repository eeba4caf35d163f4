"""Decompose the north-star vtrace stage (T=1024, B=4096, N=32) on the real
TPU (diagnostic, not part of bench).

BENCH_r03 recorded the fused forward at 5,563us vs a 1,393us logical-bytes
floor (25% SoL).  Hypothesis to test FIRST: with N=32 minor-most, the two
(T, B, N) logits arrays are tile-padded to 128 lanes in HBM (4x physical
bytes), so the *physical* floor is ~4x the logical one — 4 * 1,393 = 5,572us
~= the measured 5,563us.  If the raw-read probes confirm that, the gap is
layout, not the scan kernel, and the lever is an N-in-sublane (T, N, B)
head path — not the VERDICT's in-kernel clip folding (worth only ~41us of
logical traffic).

Usage: python bench_results/profile_vtrace_ns.py [probe|head|kernel|post|full]
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench  # noqa: E402  (configures the persistent compile cache)
from bench import _bench_loop, _dep, _HBM_GBS
from di_hpc_tpu import ops, origin

T, B, N = 1024, 4096, 32
kn = jax.random.split(jax.random.PRNGKey(7), 5)
to = jax.random.normal(kn[0], (T, B, N))
bo = jax.random.normal(kn[1], (T, B, N))
to_tnb = jnp.asarray(jax.device_get(to).transpose(0, 2, 1))  # (T, N, B)
bo_tnb = jnp.asarray(jax.device_get(bo).transpose(0, 2, 1))
act = jax.random.randint(kn[2], (T, B), 0, N)
val = jax.random.normal(kn[3], (T + 1, B))
rew = jax.random.normal(kn[4], (T, B))

PLANE_MB = T * B * 4 / 1e6          # 16.78 MB
LOGITS_MB = T * B * N * 4 / 1e6     # 537 MB logical


def report(name, args, make_body, K, mb):
    sec, compile_s = _bench_loop(make_body, K, n=3, args=args)
    floor = mb * 1e6 / (_HBM_GBS * 1e3)
    print(f"{name:<28} {sec*1e6:9.1f} us   floor {floor:8.1f} us "
          f"({100*floor/(sec*1e6):5.1f}% SoL, logical {mb:7.1f} MB, "
          f"compile {compile_s:.1f}s)", flush=True)
    return sec


which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "probe"):
    def mk_sum(carry, a, init=False):
        (x,) = _dep(None if init else carry, a[0])
        return jnp.sum(x) * 1e-12 + 1.0
    report("read (T,B,32) minor=32", (to,), mk_sum, K=100, mb=LOGITS_MB)
    report("read (T,32,B) minor=B", (to_tnb,), mk_sum, K=100, mb=LOGITS_MB)

if which in ("all", "head"):
    def mk_heads(carry, a, init=False):
        t, b = _dep(None if init else carry, a[0], a[1])
        lp_t, ent = ops.categorical.logp_entropy(t, act)
        lp_b = ops.categorical.logp(b, act)
        IS = jnp.exp(lp_t - lp_b)
        return (jnp.sum(lp_t) + jnp.sum(ent) + jnp.sum(IS)) * 1e-12 + 1.0
    report("heads (T,B,32)", (to, bo), mk_heads, K=60, mb=2 * LOGITS_MB)

    def mk_heads_tnb(carry, a, init=False):
        t, b = _dep(None if init else carry, a[0], a[1])
        # Same head math with N in the sublane dim (axis=1): reductions over
        # axis 1, iota-compare gather over axis 1.
        def head(x, with_ent):
            x = x.astype(jnp.float32)
            m = jnp.max(x, axis=1, keepdims=True)
            e = jnp.exp(x - m)
            s = jnp.sum(e, axis=1, keepdims=True)
            lse = m + jnp.log(s)
            row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            xa = jnp.sum(jnp.where(row == act[:, None, :], x, 0.0), axis=1,
                         keepdims=True)
            lp = (xa - lse)[:, 0, :]
            if not with_ent:
                return lp, None
            sx = jnp.sum(e * x, axis=1, keepdims=True)
            return lp, (lse - sx / s)[:, 0, :]
        lp_t, ent = head(t, True)
        lp_b, _ = head(b, False)
        IS = jnp.exp(lp_t - lp_b)
        return (jnp.sum(lp_t) + jnp.sum(ent) + jnp.sum(IS)) * 1e-12 + 1.0
    report("heads (T,32,B)", (to_tnb, bo_tnb), mk_heads_tnb, K=60,
           mb=2 * LOGITS_MB)

if which in ("all", "kernel", "post"):
    from di_hpc_tpu.pallas_kernels.rl_scans import vtrace_returns_adv_pallas
    from di_hpc_tpu.ops.scan import linear_recurrence_reverse

    lp_t0, ent0 = ops.categorical.logp_entropy(to, act)
    lp_b0 = ops.categorical.logp(bo, act)
    IS0 = jnp.exp(jax.lax.stop_gradient(lp_t0) - lp_b0)
    rhos0 = jnp.minimum(IS0, 1.0)
    planes = (rhos0, rhos0, rhos0, rew, val)

if which in ("all", "kernel"):
    def mk_k5(carry, a, init=False):
        is_, _c, _p, rw_, v_ = _dep(None if init else carry, *a)
        ret, adv = vtrace_returns_adv_pallas(is_, rw_, v_, 0.99, 0.95,
                                             1.0, 1.0, 1.0)
        return (jnp.sum(ret) + jnp.sum(adv)) * 1e-12 + 1.0
    report("kernel 5-stream", planes, mk_k5, K=200, mb=5 * PLANE_MB)

    def mk_assoc(carry, a, init=False):
        r_, c_, p_, rw_, v_ = _dep(None if init else carry, *a)
        deltas = r_ * (rw_ + 0.99 * v_[1:] - v_[:-1])
        items = linear_recurrence_reverse(deltas, 0.99 * 0.95 * c_,
                                          method="associative")
        ret = v_[:-1] + items
        ret_tp1 = jnp.concatenate([ret[1:], v_[-1:]], axis=0)
        adv = p_ * (rw_ + 0.99 * ret_tp1 - v_[:-1])
        return (jnp.sum(ret) + jnp.sum(adv)) * 1e-12 + 1.0
    report("assoc-scan fallback", planes, mk_assoc, K=60, mb=7 * PLANE_MB)

if which in ("all", "post"):
    post_args = (IS0, lp_t0, ent0, rew, val)

    def mk_post(carry, a, init=False):
        IS_, lpt_, ent_, rw_, v_ = _dep(None if init else carry, *a)
        ret, adv = vtrace_returns_adv_pallas(IS_, rw_, v_, 0.99, 0.95,
                                             1.0, 1.0, 1.0)
        pg = -jnp.mean(lpt_ * adv)
        vl = jnp.mean((v_[:-1] - ret) ** 2)
        el = jnp.mean(ent_)
        return (pg + vl + el) * 1e-12 + 1.0
    report("post-head (clips+k+losses)", post_args, mk_post, K=200,
           mb=9 * PLANE_MB)

if which in ("all", "full"):
    def mk_full(carry, a, init=False):
        t, b, v, r = _dep(None if init else carry, a[0], a[1], a[2], a[3])
        out = ops.vtrace_error(origin.vtrace_data(t, b, act, v, r, None))
        return (out.policy_loss + out.value_loss + out.entropy_loss) * 1e-12 + 1.0
    report("full fused vtrace fwd", (to, bo, val, rew), mk_full, K=60,
           mb=2 * LOGITS_MB + 4 * PLANE_MB)

print("done", flush=True)
