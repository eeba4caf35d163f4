"""Round-2 LSTM forward-kernel VPU experiments (VERDICT task 5).

The train-step stage is LSTM-dominated; the named lever is per-step LN+gate
VPU work in pallas_kernels/lstm_cell.py.  Variants measured here (single
layer, norm=True), all at ambient (bf16) matmul precision:

  v0: the product kernel (_layer_impl stash=False)
  v1: single-pass LN stats (var = E[x^2] - E[x]^2, no (x-mean)^2
      materialization) + 3H/H two-slice gate nonlinearity
  v2: v1 + two time steps per grid invocation (halves per-grid-step
      overhead; same math)

Usage: PYTHONPATH=/root/repo python bench_results/profile_lstm_r2.py

HISTORICAL (2026-08-20): run against the round-1 kernel; v2u2 was adopted
into lstm_cell.py and the kernel signature has since grown the LN_x fold
(gxp/glnx/blnx/bias inputs), so the v0 calls below no longer run unedited.
Recorded results: bench_results/r2_lstm_variants.json.
"""

import functools
import json

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from di_hpc_tpu.pallas_kernels import lstm_cell as lc
from di_hpc_tpu.utils.constants import LAYERNORM_EPS
from di_hpc_tpu.utils.profiling import bench_fn

# ---------------------------------------------------------------------------


def _step_math_v1(gx32, h, c, wh_ref, gln_ref, bln_ref, H):
    gh_pre = jax.lax.dot_general(
        h.astype(wh_ref.dtype), wh_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=None)
    m = jnp.mean(gh_pre, axis=-1, keepdims=True)
    m2 = jnp.mean(gh_pre * gh_pre, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(m2 - m * m + LAYERNORM_EPS)
    gh = ((gh_pre - m) * rstd * gln_ref[:].astype(jnp.float32)
          + bln_ref[:].astype(jnp.float32))
    gate = gx32 + gh
    sfo = jax.nn.sigmoid(gate[:, :3 * H])
    u = jnp.tanh(gate[:, 3 * H:])
    c_new = sfo[:, H:2 * H] * c + sfo[:, :H] * u
    h_new = sfo[:, 2 * H:3 * H] * jnp.tanh(c_new)
    return h_new, c_new


def _kernel_v1(gx_ref, wh_ref, gln_ref, bln_ref, h0_ref, c0_ref,
               y_ref, hn_ref, cn_ref, h_scr, c_scr, *, S, H):
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init():
        h_scr[:] = h0_ref[:].astype(jnp.float32)
        c_scr[:] = c0_ref[:].astype(jnp.float32)

    h_new, c_new = _step_math_v1(gx_ref[0].astype(jnp.float32),
                                 h_scr[:], c_scr[:], wh_ref, gln_ref,
                                 bln_ref, H)
    h_scr[:] = h_new
    c_scr[:] = c_new
    y_ref[0] = h_new.astype(y_ref.dtype)

    @pl.when(s == S - 1)
    def _flush():
        hn_ref[:] = h_new.astype(hn_ref.dtype)
        cn_ref[:] = c_new.astype(cn_ref.dtype)


def _kernel_v2(gx_ref, wh_ref, gln_ref, bln_ref, h0_ref, c0_ref,
               y_ref, hn_ref, cn_ref, h_scr, c_scr, *, S, H, U):
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init():
        h_scr[:] = h0_ref[:].astype(jnp.float32)
        c_scr[:] = c0_ref[:].astype(jnp.float32)

    h, c = h_scr[:], c_scr[:]
    for u_i in range(U):
        h, c = _step_math_v1(gx_ref[u_i].astype(jnp.float32), h, c,
                             wh_ref, gln_ref, bln_ref, H)
        y_ref[u_i] = h.astype(y_ref.dtype)
    h_scr[:] = h
    c_scr[:] = c

    @pl.when(s == S // U - 1)
    def _flush():
        hn_ref[:] = h.astype(hn_ref.dtype)
        cn_ref[:] = c.astype(cn_ref.dtype)


def _run_variant(kernel_name, gx, wh, gln, bln, h0, c0, U=1):
    S, B, H4 = gx.shape
    H = H4 // 4
    blk = lc._pick_blk_b(B, H, n_bufs=10, itemsize=gx.dtype.itemsize)
    if kernel_name == "v1":
        kernel = functools.partial(_kernel_v1, S=S, H=H)
        grid = (pl.cdiv(B, blk), S)
        tb = 1
    else:
        kernel = functools.partial(_kernel_v2, S=S, H=H, U=U)
        grid = (pl.cdiv(B, blk), S // U)
        tb = U
    sb = lambda b, s: (s, b, 0)
    const_b = lambda b, s: (b, 0)
    full = lambda b, s: (0, 0)
    seq_spec = pl.BlockSpec((tb, blk, H4), sb, memory_space=pltpu.VMEM)
    out_seq = pl.BlockSpec((tb, blk, H), sb, memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((blk, H), const_b, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((S, B, H), gx.dtype),
                   jax.ShapeDtypeStruct((B, H), gx.dtype),
                   jax.ShapeDtypeStruct((B, H), gx.dtype)),
        grid=grid,
        in_specs=[seq_spec,
                  pl.BlockSpec((H, H4), full, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, H4), full, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, H4), full, memory_space=pltpu.VMEM),
                  state_spec, state_spec],
        out_specs=(out_seq, state_spec, state_spec),
        scratch_shapes=[pltpu.VMEM((blk, H), jnp.float32),
                        pltpu.VMEM((blk, H), jnp.float32)],
        interpret=lc._ls.INTERPRET,
    )(gx, wh, gln.reshape(1, H4), bln.reshape(1, H4), h0, c0)


def main():
    results = {}
    for (S, B, H) in [(32, 256, 512), (64, 3, 384), (64, 256, 512)]:
        ks = jax.random.split(jax.random.PRNGKey(0), 6)
        gx = jax.random.normal(ks[0], (S, B, 4 * H)) * 0.5
        wh = jax.random.normal(ks[1], (H, 4 * H)) / jnp.sqrt(H)
        gln = jnp.abs(jax.random.normal(ks[2], (4 * H,))) + 0.5
        bln = jax.random.normal(ks[3], (4 * H,)) * 0.1
        h0 = jax.random.normal(ks[4], (B, H))
        c0 = jax.random.normal(ks[5], (B, H))
        args = (gx, wh, gln, bln, h0, c0)

        v0 = jax.jit(lambda a: lc._layer_impl(*a, norm=True, stash=False)[0])
        v1 = jax.jit(lambda a: _run_variant("v1", *a)[0])
        v2 = jax.jit(lambda a: _run_variant("v2", *a, U=2)[0])
        v4 = jax.jit(lambda a: _run_variant("v2", *a, U=4)[0])

        # Correctness vs v0: SHORT horizon + f32 matmuls only — the LN
        # var reformulation differs by ~1e-6/step, and a 32-step LSTM
        # recurrence chaotically amplifies any such difference to O(1)
        # (CLAUDE.md).  Full-sequence equivalence is established in
        # interpret mode (max_err 1.3e-6 at S=8; see script history).
        import numpy as np
        Sc = 4
        args_c = (gx[:Sc], wh, gln, bln, h0, c0)
        with jax.default_matmul_precision("float32"):
            y0c = np.asarray(jax.jit(
                lambda a: lc._layer_impl(*a, norm=True, stash=False)[0])(args_c))
            for nm, f, U in [("v1", "v1", 1), ("v2", "v2", 2)]:
                got = np.asarray(jax.jit(
                    lambda a, f=f, U=U: _run_variant(f, *a, U=U)[0])(args_c))
                np.testing.assert_allclose(got, y0c, rtol=5e-3, atol=5e-3)

        row = {}
        for nm, f in [("v0", v0), ("v1", v1), ("v2u2", v2), ("v2u4", v4)]:
            sec = bench_fn(f, args, k1=10, k2=210)
            row[nm] = sec * 1e6
            print(f"S={S} B={B} H={H}  {nm:<5} {sec*1e6:8.1f}us", flush=True)
        results[f"S{S}_B{B}_H{H}"] = row
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
