"""r5 (VERDICT ask #3): account the north-star composed stage's residual
~300us (stage 1,891us vs heads 1,489 + scan ~105 = 1,594us in r4), then
measure the fix — the loss-fused vtrace kernel (vtrace_losses_pallas), which
reduces pg/value losses in-kernel so the (T, B) returns/advantage planes
(and the epilogue's plane re-reads) never touch HBM.

Legs at T=1024, B=4096, N=32:
  heads        — logp_entropy + logp + IS (2 x 537MB logits reads)
  post-OLD     — 5-stream kernel + clip/loss epilogue on materialized planes
  post-NEW     — loss-fused kernel (+ ent mean) on materialized planes
  full-OLD     — r4 composition (returns/adv kernel + outside losses)
  full-NEW     — ops.vtrace_error at HEAD (loss-fused path)

Run: PYTHONPATH=/root/repo:$PYTHONPATH python
bench_results/profile_vtrace_compose_r5.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench  # noqa: E402  (configures the persistent compile cache)
from bench import _bench_loop, _dep, _HBM_GBS
from di_hpc_tpu import ops, origin
from di_hpc_tpu.pallas_kernels.rl_scans import (
    vtrace_losses_pallas, vtrace_returns_adv_pallas,
)

T, B, N = 1024, 4096, 32
kn = jax.random.split(jax.random.PRNGKey(7), 5)
to = jax.random.normal(kn[0], (T, B, N))
bo = jax.random.normal(kn[1], (T, B, N))
act = jax.random.randint(kn[2], (T, B), 0, N)
val = jax.random.normal(kn[3], (T + 1, B))
rew = jax.random.normal(kn[4], (T, B))

PLANE_MB = T * B * 4 / 1e6
LOGITS_MB = T * B * N * 4 / 1e6


def report(name, args, make_body, K, mb):
    sec, compile_s = _bench_loop(make_body, K, n=3, args=args)
    floor = mb * 1e6 / (_HBM_GBS * 1e3)
    print(f"{name:<30} {sec*1e6:9.1f} us   floor {floor:8.1f} us "
          f"({100*floor/(sec*1e6):5.1f}% SoL, compile {compile_s:.1f}s)",
          flush=True)
    return sec


def mk_heads(carry, a, init=False):
    t, b = _dep(None if init else carry, a[0], a[1])
    lp_t, ent = ops.categorical.logp_entropy(t, act)
    lp_b = ops.categorical.logp(b, act)
    IS = jnp.exp(lp_t - lp_b)
    return (jnp.sum(lp_t) + jnp.sum(ent) + jnp.sum(IS)) * 1e-12 + 1.0


lp_t0, ent0 = ops.categorical.logp_entropy(to, act)
lp_b0 = ops.categorical.logp(bo, act)
IS0 = jnp.exp(jax.lax.stop_gradient(lp_t0) - lp_b0)


def mk_post_old(carry, a, init=False):
    IS_, lpt_, ent_, rw_, v_ = _dep(None if init else carry, *a)
    ret, adv = vtrace_returns_adv_pallas(IS_, rw_, v_, 0.99, 0.95,
                                         1.0, 1.0, 1.0)
    pg = -jnp.mean(lpt_ * adv)
    vl = jnp.mean((v_[:-1] - ret) ** 2)
    el = jnp.mean(ent_)
    return (pg + vl + el) * 1e-12 + 1.0


def mk_post_new(carry, a, init=False):
    IS_, lpt_, ent_, rw_, v_ = _dep(None if init else carry, *a)
    pg, vl = vtrace_losses_pallas(IS_, lpt_, rw_, v_, 0.99, 0.95,
                                  1.0, 1.0, 1.0)
    el = jnp.mean(ent_)
    return (pg + vl + el) * 1e-12 + 1.0


def mk_full(carry, a, init=False):
    t, b, v, r = _dep(None if init else carry, a[0], a[1], a[2], a[3])
    out = ops.vtrace_error(origin.vtrace_data(t, b, act, v, r, None))
    return (out.policy_loss + out.value_loss + out.entropy_loss) * 1e-12 + 1.0


def mk_full_old(carry, a, init=False):
    """The r4 composition, reproduced inline: returns/adv kernel + outside
    losses (what ops.vtrace_error did before the loss-fused path)."""
    t, b, v, r = _dep(None if init else carry, a[0], a[1], a[2], a[3])
    lp_t, ent = ops.categorical.logp_entropy(t, act)
    lp_b = jax.lax.stop_gradient(ops.categorical.logp(b, act))
    IS = jax.lax.stop_gradient(jnp.exp(lp_t - lp_b))
    vsg = jax.lax.stop_gradient(v)
    ret, adv = vtrace_returns_adv_pallas(IS, r, vsg, 0.99, 0.95, 1.0, 1.0, 1.0)
    pg = -jnp.mean(lp_t * adv)
    vl = jnp.mean((v[:-1] - ret) ** 2)
    el = jnp.mean(ent)
    return (pg + vl + el) * 1e-12 + 1.0


which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "heads"):
    report("heads", (to, bo), mk_heads, K=60, mb=2 * LOGITS_MB)
if which in ("all", "post"):
    planes = (IS0, lp_t0, ent0, rew, val)
    report("post-OLD (k5+losses)", planes, mk_post_old, K=200, mb=9 * PLANE_MB)
    report("post-NEW (loss-fused)", planes, mk_post_new, K=200, mb=6 * PLANE_MB)
if which in ("all", "full"):
    report("full-OLD (r4 compose)", (to, bo, val, rew), mk_full_old, K=60,
           mb=2 * LOGITS_MB + 4 * PLANE_MB)
    report("full-NEW (ops at HEAD)", (to, bo, val, rew), mk_full, K=60,
           mb=2 * LOGITS_MB + 4 * PLANE_MB)
