"""Round-2 gae measurement audit at the BASELINE config (T=1024, B=4096).

VERDICT.md round-1 finding: the bench perturbed only `reward`, letting XLA
hoist value-side work out of the timing loop, and the measured fused time
(~50us) sat BELOW the analytic 61.5us HBM floor — self-contradictory.
This script measures, with BOTH inputs tied to the loop carry via
jax.lax.optimization_barrier (no hoisting, no perturbation traffic tax):

  1. naive  = origin.gae (lax.scan lowering)
  2. fused  = ops.gae (single-pass Pallas kernel)
  3. stream = the minimal same-traffic op (delta only: reads value+reward,
              writes one (T,B) array) -> the empirical speed-of-light for
              this op's 50.4 MB of traffic
  4. both under the legacy perturb method, quantifying its +1-pass-per-input
     tax (the round-1 bench perturbed reward only AND used a non-differential
     harness, landing at a flattered 50-54us "below the floor")

Usage: PYTHONPATH=/root/repo python bench_results/profile_gae_r2.py
"""

import functools
import json

import jax
import jax.numpy as jnp

from di_hpc_tpu import ops, origin
from di_hpc_tpu.utils.profiling import bench_fn, roofline

T, B = 1024, 4096
ks = jax.random.split(jax.random.PRNGKey(0), 2)
value = jax.random.normal(ks[0], (T + 1, B))
reward = jax.random.normal(ks[1], (T, B))
data = origin.gae_data(value, reward)

BYTES = ((T + 1) * B + 2 * T * B) * 4  # value+reward read, adv written

results = {}


def show(name, sec):
    r = roofline(sec, BYTES)
    results[name] = {"us": sec * 1e6, "pct_sol": r.sol_fraction * 100}
    print(f"{name:<28} {r}")


naive = functools.partial(origin.gae, gamma=0.99, lambda_=0.97)
fused = functools.partial(ops.gae, gamma=0.99, lambda_=0.97)


def stream(d):
    v, r = d
    return r + 0.99 * v[1:] - v[:-1]


show("stream (empirical SoL)", bench_fn(stream, data, k1=10, k2=400))
show("fused ops.gae", bench_fn(fused, data, k1=10, k2=400))
show("naive origin.gae", bench_fn(naive, data, k1=10, k2=200))

# Legacy perturb method for the A/B record (pays +1 HBM pass per input).
show("fused (perturb method)",
     bench_fn(fused, data, k1=10, k2=400, method="perturb"))
show("naive (perturb method)",
     bench_fn(naive, data, k1=10, k2=200, method="perturb"))

results["speedup_both_perturbed"] = (
    results["naive origin.gae"]["us"] / results["fused ops.gae"]["us"])
print(json.dumps(results, indent=1))
