"""Benchmark: fused TPU ops vs naive XLA lowering (the origin oracles).

Per-op wall-clock uses differential timing to cancel host<->device dispatch
and readback overhead (significant over a tunneled chip): each measurement
jits a fori_loop running the op K times with a data dependence between
iterations and a single scalar readback, and reports
(time(K2) - time(K1)) / (K2 - K1).

Prints ONE JSON line to stdout:
  {"metric": "fused_vs_naive_geomean_speedup", "value": <geomean speedup>,
   "unit": "x", "vs_baseline": <value / 5.0>, "details": {...}}
vs_baseline is relative to the BASELINE.json north-star target of >=5x over
naive lowering (gae/vtrace class ops at T=1024, B=4096).
Per-op diagnostics go to stderr.
"""

from __future__ import annotations

import functools
import json
import math
import sys
import time

import jax
import jax.numpy as jnp


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def _bench_loop(make_body, K, n=4):
    """Min-of-n time of a jitted fori_loop of K data-dependent op
    applications (min filters tunnel-latency noise)."""

    @jax.jit
    def run():
        def body(i, carry):
            return make_body(carry)
        out = jax.lax.fori_loop(0, K, body, make_body(None, init=True))
        return jnp.sum(jax.tree.leaves(out)[0])

    s = float(run())  # compile + warm up
    assert s == s, "NaN in benchmark output"
    best = float("inf")
    for _ in range(n):
        t = time.time()
        float(run())
        best = min(best, time.time() - t)
    return best


def bench_op(name, naive_step, fused_step, K1=10, K2=110, n=4):
    res = {}
    t0 = time.time()
    for kind, step in (("naive", naive_step), ("fused", fused_step)):
        t1 = _bench_loop(step, K1, n)
        t2 = _bench_loop(step, K2, n)
        res[kind] = max((t2 - t1) / (K2 - K1), 1e-9)
        _log(f"  [{name}/{kind}] done in {time.time()-t0:.1f}s")
    speedup = res["naive"] / res["fused"]
    _log(f"{name:<24} naive {res['naive']*1e6:9.1f}us   fused {res['fused']*1e6:9.1f}us"
         f"   speedup {speedup:6.2f}x")
    return {"naive_us": res["naive"] * 1e6, "fused_us": res["fused"] * 1e6,
            "speedup": speedup}


def main():
    from di_hpc_tpu import network, ops, origin

    backend = jax.default_backend()
    _log(f"backend: {backend}, devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)
    details = {}

    # ----- GAE / TD(lambda): BASELINE config T=1024, B=4096 -----
    T, B = 1024, 4096
    ks = jax.random.split(key, 4)
    value = jax.random.normal(ks[0], (T + 1, B))
    reward = jax.random.normal(ks[1], (T, B))

    def gae_step(fn):
        def step(carry, init=False):
            r = reward if init else reward + carry * 1e-12
            return fn(origin.gae_data(value, r))
        return step

    details["gae_T1024_B4096"] = bench_op(
        "gae T=1024 B=4096",
        gae_step(functools.partial(origin.gae, gamma=0.99, lambda_=0.97)),
        gae_step(functools.partial(ops.gae, gamma=0.99, lambda_=0.97)),
    )

    def tdl_step(fn):
        def step(carry, init=False):
            r = reward if init else reward + carry * 1e-12
            # carry is the scalar loss; broadcast keeps the dependence cheap.
            out = fn(origin.td_lambda_data(value, r, None))
            return out * 1e-12 + jnp.float32(1.0)
        return step

    details["td_lambda_T1024_B4096"] = bench_op(
        "td_lambda T=1024 B=4096",
        tdl_step(origin.td_lambda_error),
        tdl_step(ops.td_lambda_error),
    )

    # ----- vtrace / upgo at BASELINE batch scale: T=1024, B=4096 is the
    # north-star config for scan-bound ops; logits add an N dim, so use the
    # reference config upscaled on B (T=128, B=1024, N=128). -----
    Tv, Bv, Nv = 128, 512, 128
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    to = jax.random.normal(ks[0], (Tv, Bv, Nv))
    bo = jax.random.normal(ks[1], (Tv, Bv, Nv))
    act = jax.random.randint(ks[2], (Tv, Bv), 0, Nv)
    val_v = jax.random.normal(ks[3], (Tv + 1, Bv))
    rew_v = jax.random.normal(ks[4], (Tv, Bv))

    def vtrace_step(fn):
        def step(carry, init=False):
            t = to if init else to + carry * 1e-12
            out = fn(origin.vtrace_data(t, bo, act, val_v, rew_v, None))
            return (out.policy_loss + out.value_loss + out.entropy_loss) * 1e-12 + 1.0
        return step

    details["vtrace_T128_B512_N128"] = bench_op(
        "vtrace T=128 B=512 N=128",
        vtrace_step(origin.vtrace_error),
        vtrace_step(ops.vtrace_error),
        K1=5, K2=55,
    )

    rhos = jnp.exp(jax.random.normal(ks[0], (Tv, Bv)) * 0.1)

    def upgo_step(fn):
        def step(carry, init=False):
            t = to if init else to + carry * 1e-12
            return fn(t, rhos, act, rew_v, val_v) * 1e-12 + 1.0
        return step

    details["upgo_T128_B512_N128"] = bench_op(
        "upgo T=128 B=512 N=128",
        upgo_step(origin.upgo_loss),
        upgo_step(ops.upgo_loss),
        K1=5, K2=55,
    )

    # ----- LSTM: reference config seq=64, B=3, in=1792, hid=384, L=3 -----
    S, Bl, I, H, L = 64, 3, 1792, 384, 3
    kp, kx = jax.random.split(jax.random.PRNGKey(2))
    params = origin.init_lstm_params(kp, I, H, L, "LN")
    x = jax.random.normal(kx, (S, Bl, I))

    def lstm_step(fn):
        def step(carry, init=False):
            xx = x if init else x + carry * 1e-12
            y, (h, c) = fn(params, xx, None, "LN")
            return jnp.sum(y) * 1e-12 + 1.0
        return step

    details["lstm_s64_b3_i1792_h384_l3"] = bench_op(
        "lstm ref config",
        lstm_step(origin.lstm),
        lstm_step(network.lstm_fused),
        K1=2, K2=12, n=3,
    )

    speedups = [d["speedup"] for d in details.values()]
    geomean = math.exp(sum(math.log(max(s, 1e-9)) for s in speedups) / len(speedups))
    result = {
        "metric": "fused_vs_naive_geomean_speedup",
        "value": round(geomean, 3),
        "unit": "x",
        "vs_baseline": round(geomean / 5.0, 3),
        "details": {k: {kk: round(vv, 3) for kk, vv in v.items()}
                    for k, v in details.items()},
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
