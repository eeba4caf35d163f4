"""Benchmark: fused TPU ops vs naive XLA lowering (the origin oracles).

Per-op wall-clock: each measurement jits ONE fori_loop running the op K times
with a data dependence between iterations and a single scalar readback; K is
large enough that the ~30ms (noisy) tunnel dispatch overhead — measured once
and subtracted — is negligible.  Every input that feeds an op's hot path is
tied to the loop carry through jax.lax.optimization_barrier (see _dep), so no
expensive subgraph can be hoisted out and under-measured and no perturbation
traffic is added.  One compile per (op, kind) keeps total compile time inside
the wall-clock budget.

Stage order: the geomean + mandatory stages run FIRST (cheapest warm cost
first, the two BASELINE-critical stages — train_step and the north-star
vtrace T=1024 B=4096 — at the end of that group), then the evidence-only
stages (padding, actor-critic, td point ops).  A partial run under a
degraded tunnel therefore loses evidence rows, not the headline.

Prints ONE SHORT JSON line to stdout (compact fields + per-stage
{s: speedup, sol: pct_sol} only, <=1900 chars by construction — the driver
captures just the LAST 2000 chars of stdout, which tail-truncated the >2KB
single-line blobs of r01-r03 into unparseable fragments):
  {"metric": "fused_vs_naive_geomean_speedup", "value": <geomean speedup>,
   "unit": "x", "vs_baseline": <value / 5.0>, ..., "stages": {...}}
vs_baseline is relative to the BASELINE.json north-star target of >=5x over
naive lowering (gae/vtrace/ppo class ops at T=1024, B=4096).  The FULL
per-stage details payload (naive_us / fused_us / speedup plus compile_s /
measure_s, and, where the op is HBM-bound, the analytic min-traffic
floor_us + pct_sol roofline) goes to stderr ("FULL RESULT: ...") and to
bench_results/last_run.json.

Geomean composition: ONE row per op.  `ppo_fast_grad` (the
logp_old-precomputed path every multi-epoch PPO loop actually runs,
examples/ppo_training.py) is PPO's geomean row; the plain `ppo_grad` row is
kept as evidence (in_geomean=0) — see BASELINE.md "PPO adjudication".
The `td_point_ops` / `actor_critic_ops` entries are likewise evidence:
at the reference's toy configs these ops are launch-bound and ~1.0x is the
claim being demonstrated (docs/DESIGN.md §6; at production scale the r5
hybrid gathers win the qrdqn/iqn BACKWARD 3.5x —
bench_results/profile_qrdqn_iqn_scale_r5.py).
`train_step_bf16` is evidence too: it compares the SAME fused train step
f32 vs bf16 mixed precision (not fused-vs-naive), making the
mixed-precision margin driver-visible.

Env knobs: DIHPC_BENCH_BUDGET_S (default 420), DIHPC_BENCH_SMOKE=1,
DIHPC_BENCH_PLATFORM=cpu, DIHPC_BENCH_STAGES=key1,key2 (run only the named
stages — the per-stage prewarm/retry tool, see bench_results/prewarm.sh).
Per-op diagnostics go to stderr.
"""

from __future__ import annotations

import functools
import json
import math
import os
import sys
import threading
import time

import jax

# Persistent compilation cache (bench_cache/, machine-local + gitignored —
# the warmed cache measures ~4GB because the big-shape stages' executables
# serialize at 150-475MB each, far past committable size): the driver's
# round-end run executes in THIS working tree, so an on-disk cache is what
# saves it from the ~30-930s/program cold remote compiles that zeroed
# BENCH_r01.  Prewarm with bench_results/prewarm.sh (per-stage, retried)
# before round end.
_cache_dir = os.environ.get(
    "DIHPC_BENCH_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_cache"))
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# Structure smoke-testing off-TPU (numbers are meaningless there):
#   DIHPC_BENCH_PLATFORM=cpu python bench.py
# (the env var JAX_PLATFORMS is not honored on this machine — pinned by the
# axon site module — so the platform must be set through jax.config.)
if os.environ.get("DIHPC_BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["DIHPC_BENCH_PLATFORM"])

# DIHPC_BENCH_SMOKE=1 shrinks every loop to K=2, n=1 — a fast whole-structure
# correctness pass (every stage compiles and runs; timings meaningless).
_SMOKE = bool(int(os.environ.get("DIHPC_BENCH_SMOKE", "0")))

# DIHPC_BENCH_STAGES=key1,key2 runs only the named stage keys — used by the
# prewarm tool to compile/land one stage at a time with retries.
_ONLY_STAGES = None
if os.environ.get("DIHPC_BENCH_STAGES"):
    _ONLY_STAGES = set(os.environ["DIHPC_BENCH_STAGES"].split(","))

import jax.numpy as jnp


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


# Self-imposed wall-clock budget: skip remaining stages rather than get
# killed mid-TPU-op (a killed client can wedge a tunneled chip).
_START = time.time()
_BUDGET_S = float(os.environ.get("DIHPC_BENCH_BUDGET_S", "420"))

# HBM speed-of-light used for the roofline rows (v5e book bandwidth) and
# MXU peak for the compute-floor term (v5e book bf16 rate; matmuls here run
# at ambient precision = bf16 passes).
_HBM_GBS = 819.0
_MXU_TFLOPS = 197.0


def _remaining():
    return _BUDGET_S - (time.time() - _START)


_details: dict = {}

# Every stage key, in run order.  Geomean membership is per-entry
# (in_geomean); the mandatory set is what BASELINE.md names — a missing
# mandatory stage is flagged loudly in the JSON rather than silently
# shrinking the geomean's denominator.
_ALL_STAGES = [
    "ppo_grad_B4096_N128",
    "ppo_fast_grad_B4096_N128",
    "dntd_B128_N128_atoms51",
    "gae_T1024_B4096",
    "lstm_s64_b3_i1792_h384_l3",
    "scatter_add_grad_B256_M256",
    "scatter_cover_grad_B256_M256",
    "upgo_T128_B512_N128",
    "td_lambda_T1024_B4096",
    "vtrace_grad_T128_B512_N128",
    "train_step_T32_B256_h512",
    "vtrace_T1024_B4096_N32",
    "train_step_bf16_T32_B256_h512",
    "train_step_bf16_T64_B1024_h128",
    "padding_ops",
    "actor_critic_ops",
    "td_point_ops",
]
_MANDATORY = {"gae_T1024_B4096", "vtrace_T1024_B4096_N32",
              "train_step_T32_B256_h512", "ppo_fast_grad_B4096_N128"}
_TOTAL_STAGES = len(_ALL_STAGES)
_emitted = threading.Lock()


def build_result_line(details, all_stages=None, mandatory=None,
                      only_stages=None, max_len=1900):
    """Build the single stdout JSON line.

    The driver captures only the LAST 2000 characters of stdout
    (BENCH_r01..r03 all failed to parse because a >2KB single line lost its
    LEADING compact fields to that tail window — putting them first, as r3
    did, made it worse, not better).  So the stdout line must be SHORT:
    compact fields plus per-stage {s: speedup, sol: pct_sol} only — the full
    details blob goes to stderr and bench_results/last_run.json instead.

    Guarantee by construction: if the line still exceeds ``max_len`` the
    per-stage map is progressively thinned (drop sol, then drop the map)
    until json.loads(line[-2000:]) must succeed.  Returns (line, full) where
    ``full`` is the complete details payload for the sidecar file.
    """
    all_stages = _ALL_STAGES if all_stages is None else all_stages
    mandatory = _MANDATORY if mandatory is None else mandatory
    speedups = [d["speedup"] for d in details.values()
                if d.get("in_geomean", 1)] or [0.0]
    geomean = math.exp(sum(math.log(max(s, 1e-9)) for s in speedups) / len(speedups))
    missing = [k for k in all_stages if k not in details]
    result = {
        "metric": "fused_vs_naive_geomean_speedup",
        "value": round(geomean, 3),
        "unit": "x",
        "vs_baseline": round(geomean / 5.0, 3),
        "stages_completed": len(details),
        "stages_total": len(all_stages),
    }
    if missing and only_stages is None:
        result["partial"] = True
        result["missing_stages"] = missing
        if any(k in mandatory for k in missing):
            result["missing_mandatory"] = [k for k in missing if k in mandatory]
    full = dict(result)
    full["details"] = {
        k: {kk: (round(vv, 2) if isinstance(vv, float) else vv)
            for kk, vv in v.items()}
        for k, v in details.items()}

    def stage_map(with_sol):
        out = {}
        for k, v in details.items():
            row = {"s": round(v.get("speedup", 0.0), 2)}
            if with_sol and isinstance(v.get("pct_sol"), (int, float)):
                row["sol"] = round(v["pct_sol"], 1)
            out[k] = row
        return out

    for variant in (stage_map(True), stage_map(False), None):
        r = dict(result)
        if variant is not None:
            r["stages"] = variant
        line = json.dumps(r, separators=(",", ":"))
        if len(line) <= max_len:
            break
    return line, full


def _emit_result_and_exit(exit_code=0):
    """Emit the result exactly once (also used by the watchdog when a remote
    compile hangs past the budget): one SHORT JSON line on stdout (the
    driver's parse window is the last 2000 chars of stdout — see
    build_result_line), full details to stderr + bench_results/last_run.json."""
    if not _emitted.acquire(blocking=False):
        return
    line, full = build_result_line(_details, only_stages=_ONLY_STAGES)
    full_s = json.dumps(full)
    _log("FULL RESULT: " + full_s)
    try:
        outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "bench_results")
        os.makedirs(outdir, exist_ok=True)
        with open(os.path.join(outdir, "last_run.json"), "w") as f:
            f.write(full_s + "\n")
    except OSError as e:  # never let the sidecar write block the stdout line
        _log(f"  [warn] could not write bench_results/last_run.json: {e}")
    # Self-test the driver's actual parse before printing: the line must
    # round-trip from its own 2000-char tail.  On failure fall back to a
    # minimal compact-fields-only line rather than raising — an assert here
    # would leave the driver with NO stdout line at all (and, from the
    # watchdog thread, a still-running process), strictly worse than a long
    # line (r4 advisor finding).
    try:
        ok = json.loads(line[-2000:])["metric"] == "fused_vs_naive_geomean_speedup"
    except Exception:
        ok = False
    if not ok:
        line = json.dumps({k: full[k] for k in
                           ("metric", "value", "unit", "vs_baseline")},
                          separators=(",", ":"))
    print(line, flush=True)
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
        t0 = time.time()
        float(f(x))
        _log(f"  first device op: {time.time()-t0:.1f}s")
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


def _dep(carry, *arrays):
    """Tie arrays to the loop carry WITHOUT touching their bytes.

    An optimization barrier whose operands include the (per-iteration) carry
    makes every output un-hoistable out of the fori_loop — the correct
    anti-hoisting device for loop-invariant op inputs.  The previous scheme
    (adding carry*1e-12 to each input) cost one full extra HBM pass per
    perturbed input per iteration, a tax the opaque Pallas side pays in
    full while XLA fuses it into the naive side's first consumer — it both
    inflated fused_us and flattened speedups.  carry=None means the
    init=True call (no dependence needed).
    """
    if carry is None:
        return arrays
    out = jax.lax.optimization_barrier((carry,) + tuple(arrays))
    return out[1:]


def _bench_loop(make_body, K, n=3, args=()):
    """Per-application seconds from ONE compiled fori_loop of K data-dependent
    op applications (single compile per measurement; min-of-n, dispatch
    overhead subtracted).  K must be large enough that K*op_time >> the
    ~30ms dispatch overhead jitter.  Returns (seconds, compile_s).

    `args` (a pytree of device arrays) is passed to make_body(carry, args,
    init=...) as a JIT ARGUMENT — never close over the op's input arrays:
    closed-over arrays are inlined into the HLO module as dense constants,
    and the module must be serialized to the tunnel's remote compile
    service.  The north-star vtrace stage captures >1GB of logits that way
    (~2 bytes of module text per array byte), which is exactly the
    reproducible ~20-min broken-pipe compile that kept it out of every
    round-2 record; as arguments the same program lowers to a few KB.

    The args must be threaded THROUGH the loop carry and re-barriered with
    the running scalar every iteration.  A plain invariant jit argument
    tied by a per-iteration barrier is NOT enough on this stack: XLA hoists
    the whole body out of the while loop and K=2000 measures the same as
    K=10 (verified on CPU and TPU, 2026-08-21) — whereas the identical
    program with the arrays as embedded constants is not hoisted.  With
    the arrays re-emitted by a barrier that also consumes the iteration-t
    scalar, iteration t+1's inputs are fresh values data-dependent on
    iteration t, and the barrier is an identity so no bytes move.
    """

    if _SMOKE:
        K, n = 2, 1

    leaves, treedef = jax.tree.flatten(args)
    del leaves

    @jax.jit
    def run(a):
        la = tuple(jax.tree.leaves(a))

        def body(i, carry):
            bar = jax.lax.optimization_barrier(carry)
            s = make_body(bar[0], jax.tree.unflatten(treedef, list(bar[1:])))
            return (s,) + bar[1:]

        out = jax.lax.fori_loop(0, K, body,
                                (make_body(None, a, init=True),) + la)
        return jnp.sum(jax.tree.leaves(out[0])[0])

    t0 = time.time()
    s = float(run(args))  # compile + warm up
    compile_s = time.time() - t0
    assert s == s, "NaN in benchmark output"
    best = float("inf")
    for _ in range(n):
        t = time.time()
        float(run(args))
        best = min(best, time.time() - t)
    return max((best - _dispatch_overhead()) / K, 1e-9), compile_s


def bench_op(name, naive_step, fused_step, K=1000, n=3, bytes_mb=None,
             flops_g=None, chain_floor_us=None, args=()):
    res, compile_s, t0 = {}, 0.0, time.time()
    for kind, step in (("naive", naive_step), ("fused", fused_step)):
        res[kind], c = _bench_loop(step, K, n, args=args)
        compile_s += c
        _log(f"  [{name}/{kind}] compile {c:.1f}s, total {time.time()-t0:.1f}s")
    speedup = res["naive"] / res["fused"]
    _log(f"{name:<28} naive {res['naive']*1e6:9.1f}us   fused {res['fused']*1e6:9.1f}us"
         f"   speedup {speedup:6.2f}x")
    out = {"naive_us": res["naive"] * 1e6, "fused_us": res["fused"] * 1e6,
           "speedup": speedup, "compile_s": compile_s,
           "measure_s": time.time() - t0 - compile_s}
    if bytes_mb is not None or flops_g is not None or chain_floor_us is not None:
        # Analytic floor = max(min-HBM-traffic time, min-MXU time, measured
        # serial-chain time): the binding resource sets the speed-of-light.
        # pct_sol > 100 means the working set is cache-resident (the HBM
        # term doesn't bind; see docs/DESIGN.md §6 ppo_grad).
        # chain_floor_us covers ops whose floor is a measured serial MXU
        # dependency chain, not a bandwidth/throughput bound (the B=3 LSTM:
        # DESIGN.md §6 / bench_results/r3_lstm_decomp.json dot-only
        # variant) — without it the JSON reports a non-binding HBM number.
        hbm_us = (bytes_mb or 0.0) * 1e6 / (_HBM_GBS * 1e3)
        mxu_us = (flops_g or 0.0) * 1e3 / _MXU_TFLOPS
        floor_us = max(hbm_us, mxu_us, chain_floor_us or 0.0)
        if bytes_mb is not None:
            out["bytes_mb"] = bytes_mb
        if flops_g is not None:
            out["flops_g"] = flops_g
            out["mxu_floor_us"] = mxu_us
        if chain_floor_us is not None:
            out["chain_floor_us"] = chain_floor_us
        out["floor_us"] = floor_us
        out["pct_sol"] = 100.0 * floor_us / out["fused_us"]
        # Self-explaining marker for pct_sol > 100 rows (r4 VERDICT weak #5):
        # the analytic floor assumes every byte round-trips HBM, so beating
        # it means the working set stayed cache-resident (CMEM/VMEM) and the
        # floor does NOT bind — a cache effect, not a measurement error.
        out["floor_binds"] = bool(out["pct_sol"] <= 100.0)
        if not out["floor_binds"]:
            out["floor_note"] = "cache-resident: working set fits on-chip, HBM floor does not bind"
        _log(f"  roofline: {bytes_mb or 0:.1f} MB / {flops_g or 0:.2f} GF -> "
             f"floor {floor_us:.1f}us ({out['pct_sol']:.0f}% of SoL)")
    return out


def main():
    from di_hpc_tpu import network, ops, origin

    _start_watchdog()
    backend = jax.default_backend()
    _log(f"backend: {backend}, devices: {jax.devices()}")
    details = _details

    def _selected(key_name):
        return _ONLY_STAGES is None or key_name in _ONLY_STAGES

    def run_stage(key_name, label, naive, fused, est_s, in_geomean=1, **kw):
        if not _selected(key_name):
            return
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
                return
        if not in_geomean:
            details[key_name]["in_geomean"] = 0.0

    # =====================================================================
    # Geomean + mandatory stages, cheapest-warm-cost first; the two
    # BASELINE-critical stages (train_step, north-star vtrace) close the
    # group so a cold-cache partial run still lands the most rows.
    # =====================================================================

    # ----- PPO at the BASELINE batch scale: B=4096, N=128 -----
    Bp, Np = 4096, 128
    kp = jax.random.split(jax.random.PRNGKey(3), 7)
    ln = jax.random.normal(kp[0], (Bp, Np)); lo = jax.random.normal(kp[1], (Bp, Np))
    act_p = jax.random.randint(kp[2], (Bp,), 0, Np)
    vn = jax.random.normal(kp[3], (Bp,)); vo = jax.random.normal(kp[4], (Bp,))
    adv = jax.random.normal(kp[5], (Bp,)); ret = jax.random.normal(kp[6], (Bp,))

    # logp_old precomputed once per batch for the fast path (what a
    # multi-epoch PPO loop reuses, examples/ppo_training.py).
    lp_old_pre = ops.logp(lo, act_p)
    ppo_args = (ln, vn, lo, lp_old_pre, act_p, vo, adv, ret)

    def ppo_train_step(fn_mod):
        def step(carry, a, init=False):
            ln_a, vn_a, lo_a, _lp, act_a, vo_a, adv_a, ret_a = a

            def loss(ln_, vn_, lo_):
                (pol, vl, el), _ = fn_mod.ppo_error(
                    fn_mod.ppo_data(ln_, lo_, act_a, vn_, vo_a, adv_a,
                                    ret_a, None),
                    0.2, True, None)
                return pol + 0.5 * vl - 0.01 * el

            x, v_in, lo_ = _dep(None if init else carry, ln_a, vn_a, lo_a)
            v, g = jax.value_and_grad(loss)(x, v_in, lo_)
            return v * 1e-12 + jnp.sum(g) * 1e-12 + 1.0
        return step

    # fwd+grad traffic: read ln twice (fwd + stash-free bwd recompute),
    # write d_ln once, read lo once = 4 * B*N*4 bytes + O(B) vectors.
    # Evidence row (in_geomean=0): PPO's geomean row is the fast path below
    # — one row per op; adjudication in BASELINE.md.
    ppo_mb = 4 * Bp * Np * 4 / 1e6
    run_stage(
        "ppo_grad_B4096_N128", "ppo+grad B=4096 N=128",
        ppo_train_step(origin),
        ppo_train_step(ops),
        est_s=50, K=7000, bytes_mb=ppo_mb, in_geomean=0, args=ppo_args,
    )

    # PPO fast path: naive side = the full origin recompute — the
    # per-minibatch cost the fast path replaces.
    def ppo_fast_step(carry, a, init=False):
        ln_a, vn_a, _lo, lp_a, act_a, vo_a, adv_a, ret_a = a
        x, v_in, lp_ = _dep(None if init else carry, ln_a, vn_a, lp_a)

        def loss(ln_, vn_, lpo_):
            (pol, vl, el), _ = ops.ppo_error_with_logp_old(
                ops.ppo_fast_data(ln_, lpo_, act_a, vn_, vo_a, adv_a,
                                  ret_a, None),
                0.2, True, None)
            return pol + 0.5 * vl - 0.01 * el

        v, g = jax.value_and_grad(loss)(x, v_in, lp_)
        return v * 1e-12 + jnp.sum(g) * 1e-12 + 1.0

    run_stage(
        "ppo_fast_grad_B4096_N128", "ppo fast(logp_old)+grad",
        ppo_train_step(origin),
        ppo_fast_step,
        est_s=45, K=7000, bytes_mb=3 * Bp * Np * 4 / 1e6, args=ppo_args,
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

    dntd_args = (d_dist, d_next, d_act, d_nact, d_rew, d_done)

    def dntd_step(fn):
        def step(carry, a, init=False):
            # Tie BOTH dist and reward to the carry: the categorical
            # projection depends only on reward, and a loop-invariant
            # projection gets hoisted out of the fori_loop, under-measuring
            # the op.  Forward+td only: the NAIVE scatter formulation's gradient
            # (an XLA scatter transpose) returns NaN when compiled inside a
            # fori_loop on this TPU stack (clean as a standalone jit) —
            # an XLA lowering artifact, so the grad comparison cannot be
            # benchmarked this way; measured one-off numbers (131us naive /
            # 1.3us fused) live in docs/DESIGN.md and
            # bench_results/profile_dist_td.py.
            dist_a, next_a, act_a, nact_a, rew_a, done_a = a
            x, xn, r = _dep(None if init else carry, dist_a, next_a, rew_a)
            v, td = fn(origin.dist_nstep_td_data(
                x, xn, act_a, nact_a, r, done_a, None),
                0.95, -10.0, 10.0, n_atom, nstep_d)
            return v * 1e-12 + jnp.sum(td) * 1e-12 + 1.0
        return step

    run_stage(
        "dntd_B128_N128_atoms51", "c51 B=128 N=128",
        dntd_step(origin.dist_nstep_td_error),
        dntd_step(ops.dist_nstep_td_error),
        args=dntd_args,
        # The fused op is ~5us; K must push the loop total far above the
        # ~30ms (+-30%) tunnel dispatch jitter or the speedup is noise.
        est_s=50, K=20000,
        # fwd+td min traffic: dist + next_dist read once; td_err (B,) out is
        # noise.  6.7 MB fits in cache at this config, so pct_sol can exceed
        # 100 (the HBM term does not bind; the op is epilogue/VPU-bound).
        bytes_mb=2 * Bd * Nd * n_atom * 4 / 1e6,
    )

    # ----- GAE / TD(lambda): BASELINE config T=1024, B=4096 -----
    T, B = 1024, 4096
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    value = jax.random.normal(ks[0], (T + 1, B))
    reward = jax.random.normal(ks[1], (T, B))

    def gae_step(fn):
        def step(carry, a, init=False):
            # Tie BOTH inputs to the carry: with value loop-invariant, XLA
            # hoists the naive path's delta = r + g*V[1:] - V[:-1] subgraph
            # out of the fori_loop and under-measures it.
            v, r = _dep(None if init else carry, *a)
            return fn(origin.gae_data(v, r))
        return step

    gae_mb = (3 * T + 1) * B * 4 / 1e6  # value + reward in, adv out
    run_stage(
        "gae_T1024_B4096", "gae T=1024 B=4096",
        gae_step(functools.partial(origin.gae, gamma=0.99, lambda_=0.97)),
        gae_step(functools.partial(ops.gae, gamma=0.99, lambda_=0.97)),
        est_s=45, K=2500, bytes_mb=gae_mb, args=(value, reward),
    )

    # ----- LSTM: reference config seq=64, B=3, in=1792, hid=384, L=3 -----
    S, Bl, I, H, L = 64, 3, 1792, 384, 3
    kpar, kx = jax.random.split(jax.random.PRNGKey(2))
    params = origin.init_lstm_params(kpar, I, H, L, "LN")
    x = jax.random.normal(kx, (S, Bl, I))

    def lstm_step(fn):
        def step(carry, a, init=False):
            params_a, x_a = a
            xx, = _dep(None if init else carry, x_a)
            y, (h, c) = fn(params_a, xx, None, "LN")
            return jnp.sum(y) * 1e-12 + 1.0
        return step

    # Weights dominate at B=3: per-layer Wx + Wh read once per call, plus
    # x in / y out streams.
    lstm_mb = ((I * 4 * H + H * 4 * H) + 2 * (H * 4 * H + H * 4 * H)
               + S * Bl * (I + H)) * 4 / 1e6
    run_stage(
        "lstm_s64_b3_i1792_h384_l3", "lstm ref config",
        lstm_step(origin.lstm),
        lstm_step(network.lstm_fused),
        est_s=50, K=1000, bytes_mb=lstm_mb,
        # At B=3 the HBM number above does NOT bind: the stage is a 192-step
        # serial MXU dependency chain.  The binding floor was measured with
        # a dot-only kernel variant at 16.9us/layer x 3 layers = 50.7us
        # (bench_results/r3_lstm_decomp.json, DESIGN.md §6).
        chain_floor_us=50.7,
        args=(params, x),
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

    def scatter_train_step(fn, mode="add"):
        def step(carry, a, init=False):
            sc_x_a, sc_loc_a = a

            def loss(x_):
                return jnp.sum(fn(x_, (Hs, Ws), sc_loc_a, mode) ** 2)

            x_, = _dep(None if init else carry, sc_x_a)
            v, g = jax.value_and_grad(loss)(x_)
            return v * 1e-12 + jnp.sum(g) * 1e-12 + 1.0
        return step

    # fwd+grad min traffic: x in (B*M*N), out (B*N*H*W) written + read back
    # by the loss, grad path mirrors it: ~2x(BMN) + 3x(B*N*HW) floats.
    scat_mb = (2 * Bs * Ms * Ns + 3 * Bs * Ns * Hs * Ws) * 4 / 1e6
    run_stage(
        "scatter_add_grad_B256_M256", "scatter add+grad B=M=N=256",
        scatter_train_step(lambda x, s, l, m: _scat_naive(x, s, l, m)),
        scatter_train_step(_scat_fused),
        est_s=45, K=300, bytes_mb=scat_mb, args=(sc_x, sc_loc),
    )

    # Cover-mode evidence row (r4 VERDICT missing #2): the reference ships
    # and tests both modes (scatter_connection_kernel.h:11-89); cover is a
    # different cost shape (winner-select + one-hot einsum vs plain
    # accumulate).  Same fwd+grad traffic floor as add.
    run_stage(
        "scatter_cover_grad_B256_M256", "scatter cover+grad B=M=N=256",
        scatter_train_step(lambda x, s, l, m: _scat_naive(x, s, l, m),
                           mode="cover"),
        scatter_train_step(_scat_fused, mode="cover"),
        est_s=45, K=300, bytes_mb=scat_mb, in_geomean=0,
        args=(sc_x, sc_loc),
    )

    # ----- upgo + vtrace grad at the reference shape scaled to B=512 -----
    Tv, Bv, Nv = 128, 512, 128
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    to = jax.random.normal(ks[0], (Tv, Bv, Nv))
    bo = jax.random.normal(ks[1], (Tv, Bv, Nv))
    act = jax.random.randint(ks[2], (Tv, Bv), 0, Nv)
    val_v = jax.random.normal(ks[3], (Tv + 1, Bv))
    rew_v = jax.random.normal(ks[4], (Tv, Bv))
    rhos = jnp.exp(jax.random.normal(jax.random.PRNGKey(5), (Tv, Bv)) * 0.1)

    def upgo_step(fn):
        def step(carry, a, init=False):
            to_a, rhos_a, act_a, rew_a, val_a = a
            t, rh, r, v = _dep(None if init else carry, to_a, rhos_a,
                               rew_a, val_a)
            return fn(t, rh, act_a, r, v) * 1e-12 + 1.0
        return step

    run_stage(
        "upgo_T128_B512_N128", "upgo T=128 B=512 N=128",
        upgo_step(origin.upgo_loss),
        upgo_step(ops.upgo_loss),
        est_s=50, K=2000, bytes_mb=Tv * Bv * Nv * 4 / 1e6,
        args=(to, rhos, act, rew_v, val_v),
    )

    def tdl_step(fn):
        def step(carry, a, init=False):
            v, r = _dep(None if init else carry, *a)
            out = fn(origin.td_lambda_data(v, r, None))
            return out * 1e-12 + jnp.float32(1.0)
        return step

    tdl_mb = (2 * T + 1) * B * 4 / 1e6  # inputs once; scalar out
    run_stage(
        "td_lambda_T1024_B4096", "td_lambda T=1024 B=4096",
        tdl_step(origin.td_lambda_error),
        tdl_step(ops.td_lambda_error),
        est_s=55, K=2000, bytes_mb=tdl_mb, args=(value, reward),
    )

    def vtrace_train_step(fn_mod):
        def step(carry, a, init=False):
            to_a, bo_a, act_a, val_a, rew_a = a

            def loss(t_, v_, b_, r_):
                l = fn_mod.vtrace_error(
                    fn_mod.vtrace_data(t_, b_, act_a, v_, r_, None))
                return (l.policy_loss + 0.5 * l.value_loss
                        - 0.01 * l.entropy_loss)

            t, v, b, r = _dep(None if init else carry, to_a, val_a, bo_a,
                              rew_a)
            out, g = jax.value_and_grad(loss, argnums=(0, 1))(t, v, b, r)
            return out * 1e-12 + jnp.sum(g[0]) * 1e-12 + 1.0
        return step

    # target logits read twice (fwd + bwd recompute) + d_logits written,
    # behaviour logits read once = 4 T*B*N floats + O(T*B) vectors.
    vtr_grad_mb = 4 * Tv * Bv * Nv * 4 / 1e6
    run_stage(
        "vtrace_grad_T128_B512_N128", "vtrace+grad T=128 B=512",
        vtrace_train_step(origin),
        vtrace_train_step(ops),
        est_s=65, K=600, bytes_mb=vtr_grad_mb,
        args=(to, bo, act, val_v, rew_v),
    )

    # ----- framework level: full actor-critic V-trace train step -----
    import optax
    from di_hpc_tpu.models import (
        ActorCriticConfig, TrainBatch, init_actor_critic, make_train_step,
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

    def _all_leaves_step(carry, a, compute, init=False):
        """Shared train-step loop body: _dep-tie the batch arrays to the
        carry, run `compute(params, opt, batch) -> (scalar, new_params)`,
        and depend on EVERY updated leaf — tying only one (r4 did embed_b)
        lets XLA dead-code-eliminate the weight-grad GEMMs and the adam
        update of every other parameter (found r5,
        profile_mp_decomp_r5.py)."""
        params_a, tb_a, opt_a = a
        obs_, rew_, blog_ = _dep(None if init else carry, tb_a.obs,
                                 tb_a.rewards, tb_a.behaviour_logits)
        batch = TrainBatch(obs_, tb_a.actions, rew_, blog_)
        scalar, new_p = compute(params_a, opt_a, batch)
        psum = sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree.leaves(new_p))
        return scalar * 1e-12 + psum * 1e-12 + 1.0

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

        def compute(params_a, opt_a, batch):
            lval, grads = jax.value_and_grad(loss_fn)(params_a, batch)
            upd, _ = optimizer.update(grads, opt_a, params_a)
            return lval, optax.apply_updates(params_a, upd)

        return functools.partial(_all_leaves_step, compute=compute)

    # MXU compute floor: fwd GEMM flops (embed + per-layer x@Wx and h@Wh +
    # heads), backward ~2x (dx + dW per GEMM), + the bwd-V2 kernel's gh_pre
    # recompute (~0.5x of the LSTM's Wh flops).  The step is MXU-bound, not
    # HBM-bound (weights + activations ~15 MB, read many times from cache).
    St, Ht = Tt + 1, cfg.hidden_size
    embed_f = 2 * St * Bt * cfg.obs_dim * Ht
    lstm_f = cfg.num_layers * 2 * (2 * St * Bt * Ht * 4 * Ht)
    heads_f = 2 * St * Bt * Ht * (cfg.action_dim + 1)
    fwd_f = embed_f + lstm_f + heads_f
    train_flops_g = (3.0 * fwd_f + lstm_f / 2) / 1e9
    run_stage(
        "train_step_T32_B256_h512", "train step (model+loss+grad+adam)",
        train_step_factory(lstm_naive, origin.vtrace_error),
        train_step_factory(lstm_fused, ops.vtrace_error),
        est_s=120, K=60, n=3, flops_g=train_flops_g,
        args=(params0, tb, opt0),
    )

    # ----- vtrace forward at the BASELINE north-star config T=1024 B=4096.
    # N=32 keeps the two (T, B, N) logits tensors at 537MB each (N=128 would
    # be 2.1GB apiece — past what the naive lowering's softmax temporaries
    # leave free on a 16GB chip); T and B are the BASELINE-pinned dims. ----
    Tn, Bn, Nn = 1024, 4096, 32
    kn = jax.random.split(jax.random.PRNGKey(7), 5)
    to_n = jax.random.normal(kn[0], (Tn, Bn, Nn))
    bo_n = jax.random.normal(kn[1], (Tn, Bn, Nn))
    act_n = jax.random.randint(kn[2], (Tn, Bn), 0, Nn)
    val_n = jax.random.normal(kn[3], (Tn + 1, Bn))
    rew_n = jax.random.normal(kn[4], (Tn, Bn))

    def vtrace_ns_step(fn):
        def step(carry, a, init=False):
            to_a, bo_a, act_a, val_a, rew_a = a
            t, b, v, r = _dep(None if init else carry, to_a, bo_a, val_a,
                              rew_a)
            out = fn(origin.vtrace_data(t, b, act_a, v, r, None))
            return (out.policy_loss + out.value_loss + out.entropy_loss) * 1e-12 + 1.0
        return step

    vtr_ns_mb = (2 * Tn * Bn * Nn + 4 * Tn * Bn) * 4 / 1e6
    run_stage(
        "vtrace_T1024_B4096_N32", "vtrace T=1024 B=4096 N=32",
        vtrace_ns_step(origin.vtrace_error),
        vtrace_ns_step(ops.vtrace_error),
        est_s=70, K=60, bytes_mb=vtr_ns_mb,
        args=(to_n, bo_n, act_n, val_n, rew_n),
    )

    # =====================================================================
    # Evidence stages (in_geomean=0), run after the headline group: every
    # reference-benchmarked surface gets a BENCH row (reference
    # tests/test_padding.py:76-87, tests/test_actor_critic.py), plus the
    # mixed-precision train step.
    # =====================================================================

    # ----- mixed-precision evidence: the SAME fused train step (models.
    # make_train_step, what examples/impala_training.py runs) f32 vs
    # compute_dtype=bf16 (bf16 model forward through the LSTM kernel's
    # native bf16 path, f32 master params/loss/adam).  "naive" = f32 step,
    # "fused" = bf16 step; the ratio is the mixed-precision win README's
    # perf section claims — this row makes it driver-visible. -----
    def mp_step_factory(dtype, step_cfg=None):
        step_fn = make_train_step(step_cfg or cfg, optimizer,
                                  compute_dtype=dtype)

        def compute(params_a, opt_a, batch):
            p2, _o2, metrics = step_fn(params_a, opt_a, batch)
            return metrics["total_loss"], p2

        return functools.partial(_all_leaves_step, compute=compute)

    run_stage(
        "train_step_bf16_T32_B256_h512", "train step f32 vs bf16 mixed",
        mp_step_factory(None), mp_step_factory(jnp.bfloat16),
        est_s=100, K=60, n=3, in_geomean=0,
        args=(params0, tb, opt0),
    )

    # ----- mixed precision where bandwidth BINDS (r5 adjudication,
    # profile_mp_decomp_r5.py): at H=512 the LSTM is MXU-bound (MXU:HBM
    # ~4:1) and ambient-precision f32 already runs the same single-pass
    # bf16 MXU work as bf16 streams, so the H=512 row can only show the
    # non-binding stream share (~1.12x).  At H=128 the ratio flips and
    # halved bf16 streams genuinely pay: 1.59x measured end-to-end. -----
    cfg_sh = ActorCriticConfig(obs_dim=256, hidden_size=128, num_layers=2,
                               action_dim=64)
    Tsh, Bsh = 64, 1024
    ksh = jax.random.split(jax.random.PRNGKey(14), 5)
    params_sh = init_actor_critic(ksh[0], cfg_sh)
    tb_sh = TrainBatch(
        obs=jax.random.normal(ksh[1], (Tsh + 1, Bsh, cfg_sh.obs_dim)),
        actions=jax.random.randint(ksh[2], (Tsh, Bsh), 0, cfg_sh.action_dim),
        rewards=jax.random.normal(ksh[3], (Tsh, Bsh)),
        behaviour_logits=jax.random.normal(ksh[4],
                                           (Tsh, Bsh, cfg_sh.action_dim)),
    )
    opt_sh = optimizer.init(params_sh)

    run_stage(
        "train_step_bf16_T64_B1024_h128", "train step f32 vs bf16 (H=128)",
        mp_step_factory(None, cfg_sh), mp_step_factory(jnp.bfloat16, cfg_sh),
        est_s=100, K=60, n=3, in_geomean=0,
        args=(params_sh, tb_sh, opt_sh),
    )

    def _padding_ops():
        """Host-side op: wall-clock the full Padding/UnPadding round trip
        (bucketing + ragged pack — numpy/C++ on both sides, no jit), origin
        oracle vs ops product, at the reference config (B=64, ragged ranges,
        group=4 oracle DP; /root/reference/tests/test_padding.py:10-13)."""
        if not _selected("padding_ops"):
            return
        if _remaining() < 15:
            _log(f"  [skip] padding_ops: {_remaining():.0f}s left")
            return
        import numpy as np
        t0 = time.time()
        rng = np.random.default_rng(0)
        B64 = 64
        data = {
            "1d": [np.asarray(rng.standard_normal(rng.integers(32, 128)),
                              np.float32) for _ in range(B64)],
            "2d": [np.asarray(rng.standard_normal(
                (rng.integers(48, 80), rng.integers(32, 64))), np.float32)
                for _ in range(B64)],
            "3d": [np.asarray(rng.standard_normal(
                (rng.integers(24, 32), rng.integers(24, 32),
                 rng.integers(32, 40))), np.float32) for _ in range(B64)],
        }
        entry = {"in_geomean": 0.0}
        ratios = []
        for nd, xs in data.items():
            o_pad = getattr(origin, f"Padding{nd.upper()}")
            f_pad = getattr(ops, f"Padding{nd.upper()}")
            for mode_name, kw in (("", {}), ("_grp4",
                                             {"group": 4,
                                              "group_mode": "oracle"})):
                reps = 1 if _SMOKE else (3 if nd == "1d" else 2)
                times = {}
                for kind, fn in (("naive", o_pad), ("fused", f_pad)):
                    best = float("inf")
                    for _ in range(reps + 1):  # first rep warms caches
                        t = time.time()
                        # Materialize on the HOST CPU device and block:
                        # async jnp.asarray let each timed call absorb the
                        # PREVIOUS call's in-flight transfers (r3's phantom
                        # 1d/3d "regressions"), while a blocking TUNNELED
                        # H2D measures the tunnel (40-540ms/call, r4), not
                        # the pack.  A co-located host pays neither; CPU-
                        # device materialization is the faithful cost model
                        # and is identical for both sides.
                        with jax.default_device(jax.devices("cpu")[0]):
                            jax.block_until_ready(fn(list(xs), **kw))
                        best = min(best, time.time() - t)
                    times[kind] = best
                entry[f"pad{nd}{mode_name}_naive_us"] = times["naive"] * 1e6
                entry[f"pad{nd}{mode_name}_fused_us"] = times["fused"] * 1e6
                ratios.append(times["naive"] / times["fused"])
                _log(f"  padding/{nd}{mode_name:<6} naive "
                     f"{times['naive']*1e3:8.2f}ms  fused "
                     f"{times['fused']*1e3:8.2f}ms  ratio "
                     f"{ratios[-1]:5.2f}x")
        entry["speedup"] = math.exp(sum(math.log(r) for r in ratios)
                                    / len(ratios))
        entry["measure_s"] = time.time() - t0
        entry["compile_s"] = 0.0
        details["padding_ops"] = entry
        _log(f"padding_ops (evidence)        geomean ratio "
             f"{entry['speedup']:.2f}x (host bucketing+pack)")

    _padding_ops()

    def _actor_critic_ops():
        """Model-helper evidence at the reference configs
        (/root/reference/tests/test_actor_critic.py:10-20): update_ae's
        naive side is the straightforward take_along_axis lowering (the
        dynamic gather our iota-compare formulation replaces);
        lstm_activation / pre_sample have no kernel case — jit(origin-style
        math) IS the op, so ~1.0x is the claim."""
        if not _selected("actor_critic_ops"):
            return
        if _remaining() < 45:
            _log(f"  [skip] actor_critic_ops: {_remaining():.0f}s left")
            return
        from di_hpc_tpu import models as M
        entry = {"in_geomean": 0.0}
        t0 = time.time()
        compile_s = 0.0

        # update_ae: B=8, entities=182, dim=1024.
        ka = jax.random.split(jax.random.PRNGKey(20), 4)
        Ba, Ma, Da = 8, 182, 1024
        ae = jax.random.normal(ka[0], (Ba, Da))
        ke = jax.random.normal(ka[1], (Ba, Ma, Da))
        se = jax.random.randint(ka[2], (Ba,), 0, Ma + 1)
        en = jnp.full((Ba,), Ma, jnp.int32)

        ae_args = (ae, ke, se, en)

        def ae_naive_step(carry, a, init=False):
            ae_a, ke_a, se_a, en_a = a
            ae_, ke_ = _dep(None if init else carry, ae_a, ke_a)
            end = se_a == en_a
            idx = jnp.minimum(se_a, Ma - 1)
            picked = jnp.take_along_axis(ke_, idx[:, None, None], axis=1)[:, 0]
            out = ae_ + jnp.where(end[:, None], 0.0, picked)
            return jnp.sum(out) * 1e-12 + 1.0

        def ae_fused_step(carry, a, init=False):
            ae_a, ke_a, se_a, en_a = a
            ae_, ke_ = _dep(None if init else carry, ae_a, ke_a)
            out = M.update_ae(ae_, ke_, se_a, en_a)
            return jnp.sum(out) * 1e-12 + 1.0

        # lstm_activation: B=8, hidden=32.
        kl = jax.random.split(jax.random.PRNGKey(21), 5)
        Bh, Hh = 8, 32
        in_x = jax.random.normal(kl[0], (Bh, 4 * Hh))
        in_h = jax.random.normal(kl[1], (Bh, 4 * Hh))
        bias_l = jax.random.normal(kl[2], (4 * Hh,))
        h_l = jax.random.normal(kl[3], (Bh, Hh))
        c_l = jax.random.normal(kl[4], (Bh, Hh))

        lact_args = (in_x, in_h, bias_l, h_l, c_l)

        def lact_step(carry, a, init=False):
            in_x_a, in_h_a, bias_a, h_a, c_a = a
            x_, h_ = _dep(None if init else carry, in_x_a, in_h_a)
            hn, cn = M.lstm_activation(x_, h_, bias_a, h_a, c_a)
            return jnp.sum(hn) * 1e-12 + jnp.sum(cn) * 1e-12 + 1.0

        # pre_sample: B=8, entities=182, hidden=32.
        kp_ = jax.random.split(jax.random.PRNGKey(22), 3)
        Bp_, Mp_, Hp_ = 8, 182, 32
        mat = jax.random.normal(kp_[0], (Bp_, Mp_, Hp_))
        vec = jax.random.normal(kp_[1], (Bp_, Hp_))
        mask = jax.random.uniform(kp_[2], (Bp_, Mp_)) > 0.1

        psample_args = (mat, vec, mask)

        def psample_step(carry, a, init=False):
            mat_a, vec_a, mask_a = a
            m_, v_ = _dep(None if init else carry, mat_a, vec_a)
            out = M.pre_sample(m_, v_, mask_a)
            return jnp.sum(out) * 1e-12 + 1.0

        pairs = [
            ("update_ae", ae_naive_step, ae_fused_step, 20000, ae_args),
            ("lstm_activation", lact_step, lact_step, 20000, lact_args),
            ("pre_sample", psample_step, psample_step, 20000, psample_args),
        ]
        ratios = []
        for nm, naive, fused, K, a_ in pairs:
            try:
                tn, cn = _bench_loop(naive, K, n=2, args=a_)
                if fused is naive:
                    tf, cf = tn, 0.0  # no-kernel-case: the op IS the lowering
                else:
                    tf, cf = _bench_loop(fused, K, n=2, args=a_)
            except Exception as e:  # noqa: BLE001
                _log(f"  [fail] actor_critic/{nm}: {type(e).__name__}: {e}")
                continue
            compile_s += cn + cf
            entry[f"{nm}_naive_us"] = tn * 1e6
            entry[f"{nm}_fused_us"] = tf * 1e6
            ratios.append(tn / tf)
            _log(f"  ac/{nm:<18} naive {tn*1e6:7.1f}us  fused {tf*1e6:7.1f}us"
                 f"  ratio {tn/tf:5.2f}x")
        if ratios:
            entry["speedup"] = math.exp(sum(math.log(r) for r in ratios)
                                        / len(ratios))
            entry["compile_s"] = compile_s
            entry["measure_s"] = time.time() - t0 - compile_s
            details["actor_critic_ops"] = entry
            _log(f"actor_critic_ops (evidence)   geomean ratio "
                 f"{entry['speedup']:.2f}x")

    _actor_critic_ops()

    # ----- TD point ops (evidence): qntd + iqn at reference configs.
    # Trimmed from 4 sub-ops to 2 in round 3: the r2 8-program version was
    # the single most expensive compile in the suite (628-934s cold) and
    # starved the stages after it; one simple + one quantile family member
    # carry the no-kernel-case claim (rescale/qrdqn follow identically). ----
    def _td_point_ops():
        if not _selected("td_point_ops"):
            return
        if _remaining() < 60:
            _log(f"  [skip] td_point_ops: {_remaining():.0f}s left")
            return
        entry = {"in_geomean": 0.0, "speedup": 1.0}
        t0 = time.time()
        compile_s = 0.0

        # qntd: reference config T=nstep=5, B=64, N=64.
        kq = jax.random.split(jax.random.PRNGKey(10), 6)
        Bq, Nq, nstep = 64, 64, 5
        q = jax.random.normal(kq[0], (Bq, Nq))
        nq = jax.random.normal(kq[1], (Bq, Nq))
        aq = jax.random.randint(kq[2], (Bq,), 0, Nq)
        naq = jax.random.randint(kq[3], (Bq,), 0, Nq)
        rq = jax.random.normal(kq[4], (nstep, Bq))
        dq = jax.random.uniform(kq[5], (Bq,)) > 0.9

        qn_args = (q, nq, aq, naq, rq, dq)

        def qn_step(fn):
            def step(carry, a, init=False):
                q_a, nq_a, aq_a, naq_a, rq_a, dq_a = a
                qq, nqq, rr = _dep(None if init else carry, q_a, nq_a, rq_a)

                def loss(qq_, rr_):
                    l, td = fn(origin.q_nstep_td_data(qq_, nqq, aq_a, naq_a,
                                                      rr_, dq_a, None),
                               gamma=0.95, nstep=nstep)
                    return l + jnp.sum(td) * 1e-12
                v, g = jax.value_and_grad(loss)(qq, rr_=rr)
                return v * 1e-12 + jnp.sum(g) * 1e-12 + 1.0
            return step

        # iqn: tau=33, tau'=34, T=10, B=64, N=8, kappa=0.9.
        ki = jax.random.split(jax.random.PRNGKey(12), 8)
        ti, tpi, Bi, Ni, Ti = 33, 34, 64, 8, 10
        qi = jax.random.normal(ki[0], (ti, Bi, Ni))
        nqi = jax.random.normal(ki[1], (tpi, Bi, Ni))
        ai = jax.random.randint(ki[2], (Bi,), 0, Ni)
        nai = jax.random.randint(ki[3], (Bi,), 0, Ni)
        ri = jax.random.normal(ki[4], (Ti, Bi))
        di = jax.random.uniform(ki[5], (Bi,)) > 0.9
        rq_i = jax.random.uniform(ki[6], (ti, Bi))

        iqn_args = (qi, nqi, ai, nai, ri, di, rq_i)

        def iqn_step(fn):
            def step(carry, a, init=False):
                qi_a, nqi_a, ai_a, nai_a, ri_a, di_a, rqi_a = a
                qq, nqq, rr = _dep(None if init else carry, qi_a, nqi_a, ri_a)

                def loss(qq_, rr_):
                    l, td = fn(origin.iqn_nstep_td_data(qq_, nqq, ai_a, nai_a,
                                                        rr_, di_a, rqi_a,
                                                        None),
                               gamma=0.95, nstep=Ti, kappa=0.9)
                    return l + jnp.sum(td) * 1e-12
                v, g = jax.value_and_grad(loss)(qq, rr_=rr)
                return v * 1e-12 + jnp.sum(g) * 1e-12 + 1.0
            return step

        pairs = [
            ("qntd", qn_step(functools.partial(origin.q_nstep_td_error)),
             qn_step(functools.partial(ops.q_nstep_td_error)), 20000, qn_args),
            ("iqn", iqn_step(origin.iqn_nstep_td_error),
             iqn_step(ops.iqn_nstep_td_error), 4000, iqn_args),
        ]
        sps = []
        for nm, naive, fused, K, a_ in pairs:
            try:
                tn, cn = _bench_loop(naive, K, n=2, args=a_)
                tf, cf = _bench_loop(fused, K, n=2, args=a_)
            except Exception as e:  # noqa: BLE001
                _log(f"  [fail] td_point_ops/{nm}: {type(e).__name__}: {e}")
                continue
            compile_s += cn + cf
            entry[f"{nm}_naive_us"] = tn * 1e6
            entry[f"{nm}_fused_us"] = tf * 1e6
            sps.append(tn / tf)
            _log(f"  td_point/{nm:<14} naive {tn*1e6:7.1f}us  fused {tf*1e6:7.1f}us"
                 f"  ratio {tn/tf:5.2f}x")
        if sps:
            entry["speedup"] = math.exp(sum(math.log(s) for s in sps) / len(sps))
            entry["compile_s"] = compile_s
            entry["measure_s"] = time.time() - t0 - compile_s
            details["td_point_ops"] = entry
            _log(f"td_point_ops (evidence)       geomean ratio "
                 f"{entry['speedup']:.2f}x (expected ~1.0: no kernel case)")

    _td_point_ops()

    _emit_result_and_exit(exit_code=None)


if __name__ == "__main__":
    try:
        main()
    finally:
        # Whatever happens (stage crash, tunnel failure), the driver always
        # gets the one JSON result line with the stages that completed.
        _emit_result_and_exit(exit_code=None)
