"""Decompose the td_lambda loss kernel's gap to floor at T=1024, B=4096
(diagnostic, not part of bench).

r3 recorded the fused loss at 64.6us vs a 41.0us 2-stream floor (63% SoL)
while gae (3 streams, same suffix scan, row-constant coefficients) runs at
106% of its 61.5us floor — i.e. the loss kernel is slower in ABSOLUTE time
than gae despite reading one plane less.  Suspects: (a) the (1, 128)
revisited accumulator's read-modify-write chaining grid steps, (b) the
in-kernel full reduction, (c) the iota/where last-row masking in
_lret_body.  Variants measured here isolate them.

Usage: python bench_results/profile_tdl_r4.py
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
ks = jax.random.split(jax.random.PRNGKey(0), 2)
value = jax.random.normal(ks[0], (T + 1, B))
reward = jax.random.normal(ks[1], (T, B))
PLANE_MB = T * B * 4 / 1e6


def report(name, args, make_body, K, mb):
    sec, compile_s = _bench_loop(make_body, K, n=3, args=args)
    floor = mb * 1e6 / (_HBM_GBS * 1e3)
    print(f"{name:<34} {sec*1e6:9.1f} us   floor {floor:8.1f} us "
          f"({100*floor/(sec*1e6):5.1f}% SoL, compile {compile_s:.1f}s)",
          flush=True)
    return sec


def mk(fn):
    def body(carry, a, init=False):
        v, r = _dep(None if init else carry, *a)
        return fn(v, r)
    return body


# 1. XLA stream probe: 2-plane read, scalar out.
report("stream probe (sum v + sum r)", (value, reward),
       mk(lambda v, r: (jnp.sum(v) + jnp.sum(r)) * 1e-12 + 1.0),
       K=2000, mb=2 * PLANE_MB)

# 2. gae kernel (3 streams, row-constant b) — the at-floor reference point.
report("gae kernel (3 streams)", (value, reward),
       mk(lambda v, r: jnp.sum(rl_scans.gae_fused_pallas(v, r, 0.99, 0.97))
          * 1e-12 + 1.0),
       K=1500, mb=3 * PLANE_MB)

# 3. lambda-returns kernel (3 streams, no loss accumulation).
report("lambda-returns kernel (3 str)", (value, reward),
       mk(lambda v, r: jnp.sum(rl_scans.lambda_returns_pallas(v, r, 0.9, 0.8))
          * 1e-12 + 1.0),
       K=1500, mb=3 * PLANE_MB)

# 4. the shipping fused loss kernel (2 streams + (1,128) RMW accumulator).
report("tdl loss kernel (shipping)", (value, reward),
       mk(lambda v, r: rl_scans.td_lambda_loss_pallas(v, r, 0.9, 0.8)
          * 1e-12 + 1.0),
       K=1500, mb=2 * PLANE_MB)


# 5. variant: per-block partial outputs (no read-modify-write, no cross-
#    grid-step dependence); the (nblk, 128) partials are summed outside.
def _tdl_partial_kernel(value_ref, reward_ref, out_ref, *, gamma, lambda_,
                        T, B):
    v = value_ref[:]
    ret = rl_scans._lret_body(v, reward_ref[:], gamma, lambda_, T)
    e = ret - v[:-1]
    blk = e.shape[1]
    if B % blk:
        i = pl.program_id(0)
        col = i * blk + jax.lax.broadcasted_iota(jnp.int32, e.shape, 1)
        e = jnp.where(col < B, e, 0.0)
    out_ref[:] = jnp.sum(e * e, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("gamma", "lambda_"))
def tdl_loss_partials(value, reward, gamma, lambda_):
    T_, B_ = reward.shape
    blk = rl_scans._pick_blk(T_, B_, 3)
    nblk = pl.cdiv(B_, blk)
    kernel = functools.partial(_tdl_partial_kernel, gamma=gamma,
                               lambda_=lambda_, T=T_, B=B_)
    parts = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, B_), jnp.float32),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((T_ + 1, blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T_, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=_ls.INTERPRET,
    )(value, reward)
    return 0.5 * jnp.sum(parts) / (T_ * B_)


want = rl_scans.td_lambda_loss_pallas(value, reward, 0.9, 0.8)
got = tdl_loss_partials(value, reward, 0.9, 0.8)
print("partials-variant |diff|:", abs(float(want) - float(got)), flush=True)

report("tdl loss partials (no RMW)", (value, reward),
       mk(lambda v, r: tdl_loss_partials(v, r, 0.9, 0.8) * 1e-12 + 1.0),
       K=1500, mb=2 * PLANE_MB)

print("done", flush=True)
