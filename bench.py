"""Benchmark: fused TPU ops vs naive XLA lowering (the origin oracles).

Per-op wall-clock: each measurement jits ONE fori_loop running the op K times
with a data dependence between iterations and a single scalar readback; K is
large enough that the ~30ms (noisy) tunnel dispatch overhead — measured once
and subtracted — is negligible.  One compile per (op, kind) keeps total
compile time inside the wall-clock budget.

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
import threading
import time

import os

import jax

# Persistent compilation cache: bench compiles ~28 programs; caching makes
# re-runs (and the driver's round-end run) fast.
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "build", "jax_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


# Self-imposed wall-clock budget: skip remaining stages rather than get
# killed mid-TPU-op (a killed client can wedge a tunneled chip).
_START = time.time()
_BUDGET_S = float(os.environ.get("DIHPC_BENCH_BUDGET_S", "420"))


def _remaining():
    return _BUDGET_S - (time.time() - _START)


_details: dict = {}
_TOTAL_STAGES = 10  # keep in sync with the run_stage calls in main()
_emitted = threading.Lock()


def _emit_result_and_exit(exit_code=0):
    """Print the single JSON result line exactly once (also used by the
    watchdog when a remote compile hangs past the budget)."""
    if not _emitted.acquire(blocking=False):
        return
    speedups = [d["speedup"] for d in _details.values()] or [0.0]
    geomean = math.exp(sum(math.log(max(s, 1e-9)) for s in speedups) / len(speedups))
    result = {
        "metric": "fused_vs_naive_geomean_speedup",
        "value": round(geomean, 3),
        "unit": "x",
        "vs_baseline": round(geomean / 5.0, 3),
        "details": {k: {kk: round(vv, 3) for kk, vv in v.items()}
                    for k, v in _details.items()},
    }
    if len(_details) < _TOTAL_STAGES:
        # Self-describing partial run (slow tunnel pool / watchdog): the
        # geomean then covers only the completed stages.
        result["partial"] = True
        result["stages_completed"] = len(_details)
    print(json.dumps(result), flush=True)
    if exit_code is not None:
        os._exit(exit_code)


def _start_watchdog():
    def fire():
        _log("  [watchdog] budget exceeded mid-stage; emitting partial result")
        _emit_result_and_exit(0)

    t = threading.Timer(_BUDGET_S + 90, fire)
    t.daemon = True
    t.start()


_overhead_s = None


def _dispatch_overhead():
    """Median round-trip cost of a trivial jitted call + scalar readback —
    subtracted from loop timings (it is large and noisy over a tunneled
    chip)."""
    global _overhead_s
    if _overhead_s is None:
        f = jax.jit(lambda x: jnp.sum(x))
        x = jnp.ones((8, 8))
        float(f(x))
        samples = []
        for _ in range(7):
            t = time.time()
            float(f(x))
            samples.append(time.time() - t)
        # min, to pair with min-of-n loop totals (subtracting the median
        # would over-subtract whenever the fastest run also had a fast
        # round-trip).
        _overhead_s = min(samples)
        _log(f"  dispatch overhead ~{_overhead_s*1e3:.1f}ms")
    return _overhead_s


def _bench_loop(make_body, K, n=3):
    """Per-application seconds from ONE compiled fori_loop of K data-dependent
    op applications (single compile per measurement; min-of-n, dispatch
    overhead subtracted).  K must be large enough that K*op_time >> the
    ~30ms dispatch overhead jitter."""

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
    return max((best - _dispatch_overhead()) / K, 1e-9)


def bench_op(name, naive_step, fused_step, K=1000, n=3):
    res = {}
    t0 = time.time()
    for kind, step in (("naive", naive_step), ("fused", fused_step)):
        res[kind] = _bench_loop(step, K, n)
        _log(f"  [{name}/{kind}] done in {time.time()-t0:.1f}s")
    speedup = res["naive"] / res["fused"]
    _log(f"{name:<24} naive {res['naive']*1e6:9.1f}us   fused {res['fused']*1e6:9.1f}us"
         f"   speedup {speedup:6.2f}x")
    return {"naive_us": res["naive"] * 1e6, "fused_us": res["fused"] * 1e6,
            "speedup": speedup}


def main():
    from di_hpc_tpu import network, ops, origin

    _start_watchdog()
    backend = jax.default_backend()
    _log(f"backend: {backend}, devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)
    details = _details

    def run_stage(key_name, label, naive, fused, est_s, **kw):
        if _remaining() < est_s:
            _log(f"  [skip] {label}: {_remaining():.0f}s budget left < est {est_s}s")
            return
        try:
            details[key_name] = bench_op(label, naive, fused, **kw)
        except Exception as e:  # noqa: BLE001
            # The tunneled remote-compile service drops connections under
            # load; a failed stage must not kill the whole bench (the driver
            # consumes the JSON line).  Retry once, then move on.
            _log(f"  [retry] {label}: {type(e).__name__}: {e}")
            try:
                details[key_name] = bench_op(label, naive, fused, **kw)
            except Exception as e2:  # noqa: BLE001
                _log(f"  [fail] {label}: {type(e2).__name__}: {e2}")

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

    run_stage(
        "gae_T1024_B4096", "gae T=1024 B=4096",
        gae_step(functools.partial(origin.gae, gamma=0.99, lambda_=0.97)),
        gae_step(functools.partial(ops.gae, gamma=0.99, lambda_=0.97)),
        est_s=45, K=1500,
    )

    def tdl_step(fn):
        def step(carry, init=False):
            r = reward if init else reward + carry * 1e-12
            # carry is the scalar loss; broadcast keeps the dependence cheap.
            out = fn(origin.td_lambda_data(value, r, None))
            return out * 1e-12 + jnp.float32(1.0)
        return step

    run_stage(
        "td_lambda_T1024_B4096", "td_lambda T=1024 B=4096",
        tdl_step(origin.td_lambda_error),
        tdl_step(ops.td_lambda_error),
        est_s=60,
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

    run_stage(
        "vtrace_T128_B512_N128", "vtrace T=128 B=512 N=128",
        vtrace_step(origin.vtrace_error),
        vtrace_step(ops.vtrace_error),
        est_s=60, K=500,
    )

    rhos = jnp.exp(jax.random.normal(ks[0], (Tv, Bv)) * 0.1)

    def upgo_step(fn):
        def step(carry, init=False):
            t = to if init else to + carry * 1e-12
            return fn(t, rhos, act, rew_v, val_v) * 1e-12 + 1.0
        return step

    run_stage(
        "upgo_T128_B512_N128", "upgo T=128 B=512 N=128",
        upgo_step(origin.upgo_loss),
        upgo_step(ops.upgo_loss),
        est_s=55, K=500,
    )

    # ----- training path: loss value_and_grad (what a learner step runs) -----
    def vtrace_train_step(fn_mod):
        def loss(t_):
            l = fn_mod.vtrace_error(
                fn_mod.vtrace_data(t_, bo, act, val_v, rew_v, None))
            return l.policy_loss + 0.5 * l.value_loss - 0.01 * l.entropy_loss

        def step(carry, init=False):
            t = to if init else to + carry * 1e-12
            v, g = jax.value_and_grad(loss)(t)
            return v * 1e-12 + jnp.sum(g) * 1e-12 + 1.0
        return step

    run_stage(
        "vtrace_grad_T128_B512_N128", "vtrace+grad",
        vtrace_train_step(origin),
        vtrace_train_step(ops),
        est_s=75, K=300,
    )

    Bp, Np = 4096, 128
    kp = jax.random.split(jax.random.PRNGKey(3), 7)
    ln = jax.random.normal(kp[0], (Bp, Np)); lo = jax.random.normal(kp[1], (Bp, Np))
    act_p = jax.random.randint(kp[2], (Bp,), 0, Np)
    vn = jax.random.normal(kp[3], (Bp,)); vo = jax.random.normal(kp[4], (Bp,))
    adv = jax.random.normal(kp[5], (Bp,)); ret = jax.random.normal(kp[6], (Bp,))

    def ppo_train_step(fn_mod):
        def loss(ln_):
            (pol, vl, el), _ = fn_mod.ppo_error(
                fn_mod.ppo_data(ln_, lo, act_p, vn, vo, adv, ret, None),
                0.2, True, None)
            return pol + 0.5 * vl - 0.01 * el

        def step(carry, init=False):
            x = ln if init else ln + carry * 1e-12
            v, g = jax.value_and_grad(loss)(x)
            return v * 1e-12 + jnp.sum(g) * 1e-12 + 1.0
        return step

    run_stage(
        "ppo_grad_B4096_N128", "ppo+grad B=4096 N=128",
        ppo_train_step(origin),
        ppo_train_step(ops),
        est_s=60, K=4000,
    )

    # ----- C51 distributional TD: reference config B=128 N=128 atoms=51 -----
    Bd, Nd, n_atom, nstep_d = 128, 128, 51, 10
    kd = jax.random.split(jax.random.PRNGKey(6), 6)
    d_dist = jax.nn.softmax(jax.random.normal(kd[0], (Bd, Nd, n_atom)), -1)
    d_next = jax.nn.softmax(jax.random.normal(kd[1], (Bd, Nd, n_atom)), -1)
    d_act = jax.random.randint(kd[2], (Bd,), 0, Nd)
    d_nact = jax.random.randint(kd[3], (Bd,), 0, Nd)
    d_rew = jax.random.normal(kd[4], (nstep_d, Bd))
    d_done = jax.random.uniform(kd[5], (Bd,)) > 0.9

    def dntd_step(fn):
        def step(carry, init=False):
            # Perturb BOTH dist and reward: the categorical projection
            # depends only on reward, and a loop-invariant projection gets
            # hoisted out of the fori_loop, under-measuring the op.
            # Forward+td only: the NAIVE scatter formulation's gradient
            # (an XLA scatter transpose) returns NaN when compiled inside a
            # fori_loop on this TPU stack (clean as a standalone program) —
            # an XLA lowering artifact, so the grad comparison cannot be
            # benchmarked this way; measured one-off numbers (131us naive /
            # 1.3us fused) live in docs/DESIGN.md and
            # bench_results/profile_dist_td.py.
            x = d_dist if init else d_dist + carry * 1e-12
            r = d_rew if init else d_rew + carry * 1e-12
            v, td = fn(origin.dist_nstep_td_data(
                x, d_next, d_act, d_nact, r, d_done, None),
                0.95, -10.0, 10.0, n_atom, nstep_d)
            return v * 1e-12 + jnp.sum(td) * 1e-12 + 1.0
        return step

    run_stage(
        "dntd_B128_N128_atoms51", "c51 B=128 N=128",
        dntd_step(origin.dist_nstep_td_error),
        dntd_step(ops.dist_nstep_td_error),
        # The fused op is ~5us; K must push the loop total far above the
        # ~30ms (+-30%) tunnel dispatch jitter or the speedup is noise.
        est_s=60, K=20000,
    )

    # ----- scatter connection: reference config B=M=N=256, 16x16 -----
    from di_hpc_tpu.network import scatter_connection as _scat_fused
    from di_hpc_tpu.origin.scatter_connection import (
        scatter_connection as _scat_naive,
    )
    Bs, Ms, Ns, Hs, Ws = 256, 256, 256, 16, 16
    ksc = jax.random.split(jax.random.PRNGKey(8), 3)
    sc_x = jax.random.normal(ksc[0], (Bs, Ms, Ns))
    sc_loc = jnp.stack([jax.random.randint(ksc[1], (Bs, Ms), 0, Hs),
                        jax.random.randint(ksc[2], (Bs, Ms), 0, Ws)], axis=-1)

    def scatter_train_step(fn):
        def loss(x_):
            return jnp.sum(fn(x_, (Hs, Ws), sc_loc, "add") ** 2)

        def step(carry, init=False):
            x_ = sc_x if init else sc_x + carry * 1e-12
            v, g = jax.value_and_grad(loss)(x_)
            return v * 1e-12 + jnp.sum(g) * 1e-12 + 1.0
        return step

    run_stage(
        "scatter_add_grad_B256_M256", "scatter add+grad B=M=N=256",
        scatter_train_step(lambda x, s, l, m: _scat_naive(x, s, l, m)),
        scatter_train_step(_scat_fused),
        est_s=50, K=300,
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

    run_stage(
        "lstm_s64_b3_i1792_h384_l3", "lstm ref config",
        lstm_step(origin.lstm),
        lstm_step(network.lstm_fused),
        est_s=50, K=1000,
    )

    # ----- framework level: full actor-critic V-trace train step -----
    import optax
    from di_hpc_tpu.models import (
        ActorCriticConfig, TrainBatch, init_actor_critic,
    )
    from di_hpc_tpu.network import lstm_fused
    from di_hpc_tpu.origin.rnn import lstm as lstm_naive

    cfg = ActorCriticConfig(obs_dim=256, hidden_size=512, num_layers=2,
                            action_dim=64)
    kt = jax.random.split(jax.random.PRNGKey(4), 5)
    Tt, Bt = 32, 256
    params0 = init_actor_critic(kt[0], cfg)
    tb = TrainBatch(
        obs=jax.random.normal(kt[1], (Tt + 1, Bt, cfg.obs_dim)),
        actions=jax.random.randint(kt[2], (Tt, Bt), 0, cfg.action_dim),
        rewards=jax.random.normal(kt[3], (Tt, Bt)),
        behaviour_logits=jax.random.normal(kt[4], (Tt, Bt, cfg.action_dim)),
    )
    optimizer = optax.adam(1e-3)
    opt0 = optimizer.init(params0)

    def train_step_factory(lstm_impl, vtrace_impl):
        def loss_fn(params, batch):
            x = jnp.einsum("sbo,oh->sbh", batch.obs, params.embed_w) + params.embed_b
            x = jax.nn.relu(x)
            y, _ = lstm_impl(params.lstm, x, None, cfg.norm_type)
            logits = jnp.einsum("sbh,ha->sba", y, params.policy_w) + params.policy_b
            v = jnp.einsum("sbh,h->sb", y, params.value_w[:, 0]) + params.value_b[0]
            l = vtrace_impl(origin.vtrace_data(
                logits[:Tt], batch.behaviour_logits, batch.actions, v,
                batch.rewards, None))
            return l.policy_loss + 0.5 * l.value_loss - 0.01 * l.entropy_loss

        def step(carry, init=False):
            batch = tb if init else TrainBatch(
                tb.obs + carry * 1e-12, tb.actions, tb.rewards,
                tb.behaviour_logits)
            lval, grads = jax.value_and_grad(loss_fn)(params0, batch)
            upd, _ = optimizer.update(grads, opt0, params0)
            return lval * 1e-12 + jnp.sum(upd.embed_b) * 1e-12 + 1.0
        return step

    run_stage(
        "train_step_T32_B256_h512", "train step (model+loss+grad+adam)",
        train_step_factory(lstm_naive, origin.vtrace_error),
        train_step_factory(lstm_fused, ops.vtrace_error),
        est_s=140, K=50, n=3,
    )

    _emit_result_and_exit(exit_code=None)


if __name__ == "__main__":
    try:
        main()
    finally:
        # Whatever happens (stage crash, tunnel failure), the driver always
        # gets the one JSON result line with the stages that completed.
        _emit_result_and_exit(exit_code=None)
