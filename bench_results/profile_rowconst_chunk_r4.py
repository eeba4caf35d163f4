"""Does the r4 VECTORIZED chunked scan also help row-constant-coefficient
kernels (gae, td_lambda loss)?  (diagnostic, not part of bench)

The r2 chunked-scan retirement measured a SERIAL per-chunk carry chain
(94 vs 50us on gae).  The r4 scheme vectorizes the in-chunk doubling over
chunks and unrolls only the C=16 cross-chunk carries; for row-constant b
it keeps the cheap (C, L, 1) coefficient shifts while cutting the aa-shift
passes from log2(T)=10 to log2(64)=6 (+1 fix-up).

Usage: python bench_results/profile_rowconst_chunk_r4.py
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench  # noqa: E402
from bench import _bench_loop, _dep, _HBM_GBS
from di_hpc_tpu.pallas_kernels import rl_scans

T, B = 1024, 4096
ks = jax.random.split(jax.random.PRNGKey(0), 2)
value = jax.random.normal(ks[0], (T + 1, B))
reward = jax.random.normal(ks[1], (T, B))
PLANE_MB = T * B * 4 / 1e6


def report(name, make_body, K, mb):
    sec, compile_s = _bench_loop(make_body, K, n=3, args=(value, reward))
    floor = mb * 1e6 / (_HBM_GBS * 1e3)
    print(f"{name:<34} {sec*1e6:9.1f} us   floor {floor:8.1f} us "
          f"({100*floor/(sec*1e6):5.1f}% SoL, compile {compile_s:.1f}s)",
          flush=True)


def mk(fn):
    def body(carry, a, init=False):
        v, r = _dep(None if init else carry, *a)
        return fn(v, r)
    return body


def gae_body(v, r):
    return jnp.sum(rl_scans._gae_fused_impl.__wrapped__(v, r, 0.99, 0.97)) * 1e-12 + 1.0


def tdl_body(v, r):
    return rl_scans._tdl_loss_impl.__wrapped__(v, r, 0.9, 0.8) * 1e-12 + 1.0


want_g = rl_scans._gae_fused_impl.__wrapped__(value, reward, 0.99, 0.97)
want_t = rl_scans._tdl_loss_impl.__wrapped__(value, reward, 0.9, 0.8)

report("gae shipping (flat scan)", mk(jax.jit(gae_body)), K=1500, mb=3 * PLANE_MB)
report("tdl loss shipping (flat)", mk(jax.jit(tdl_body)), K=1500, mb=2 * PLANE_MB)

# Patch the module-global scan; fresh jits retrace with the chunked one.
rl_scans._suffix_scan = rl_scans._suffix_scan_full_plane

got_g = jax.jit(lambda v, r: rl_scans._gae_fused_impl.__wrapped__(v, r, 0.99, 0.97))(value, reward)
got_t = jax.jit(lambda v, r: rl_scans._tdl_loss_impl.__wrapped__(v, r, 0.9, 0.8))(value, reward)
print("gae |diff|", float(jnp.max(jnp.abs(got_g - want_g))),
      " tdl |diff|", abs(float(got_t) - float(want_t)), flush=True)

report("gae CHUNKED", mk(jax.jit(gae_body)), K=1500, mb=3 * PLANE_MB)
report("tdl loss CHUNKED", mk(jax.jit(tdl_body)), K=1500, mb=2 * PLANE_MB)

print("done", flush=True)
