"""Round-3 LSTM forward-kernel decomposition + bf16-Wh experiments.

VERDICT r2 task 3: the lstm bench stage sits at 26.9% pct_sol (111.3us vs a
29.9us weight-streaming floor at S=64, B=3, H=384, L=3).  Before picking a
lever, decompose WHERE the per-step time goes.  Variants (single layer,
product block picker, ambient bf16 matmul precision, f32 streams):

  prod      : the product kernel (_layer_impl stash=False) — U=2 unroll,
              in-kernel LN_x fold
  dotonly   : per-step h @ Wh MXU product only (h_new = g[:, :H]); no LN,
              no gates — the recurrence's MXU/VMEM floor
  noln      : full gate math on the raw GEMM output, no LayerNorms
  nox       : prod minus the in-kernel LN_x fold (gx added raw) — costs of
              the x-side LN
  u4 / u8   : prod's step math at 4 / 8 time steps per grid invocation
  wbf16     : prod with Wh stored bf16 in VMEM (halves the per-step VMEM
              weight read; under ambient bf16 single-pass matmuls the MXU
              sees bit-identical operands, so this is numerics-free)
  dot_wbf16 : dotonly with bf16 Wh — isolates the VMEM-streaming term

Usage: PYTHONPATH=/root/repo python bench_results/profile_lstm_r3.py
Results land in bench_results/r3_lstm_decomp.json.
"""

import functools
import json

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from di_hpc_tpu.pallas_kernels import lstm_cell as lc
from di_hpc_tpu.utils.profiling import bench_fn

_ln = lc._ln
_gates = lc._gates


def _var_kernel(gxp_ref, wh_ref, glnx_ref, blnx_ref, gln_ref, bln_ref,
                bias_ref, h0_ref, c0_ref, y_ref, hn_ref, cn_ref,
                h_scr, c_scr, *, S, H, U, do_lnx, do_lnh, do_gates):
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init():
        h_scr[:] = h0_ref[:].astype(jnp.float32)
        c_scr[:] = c0_ref[:].astype(jnp.float32)

    h = h_scr[:]
    c = c_scr[:]
    for u_i in range(U):
        gx32 = gxp_ref[u_i].astype(jnp.float32)
        if do_lnx:
            gx32 = _ln(gx32, glnx_ref[:].astype(jnp.float32),
                       blnx_ref[:].astype(jnp.float32))
        gx32 = gx32 + bias_ref[:].astype(jnp.float32)
        g = jax.lax.dot_general(
            h.astype(wh_ref.dtype), wh_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=None)
        if do_lnh:
            g = _ln(g, gln_ref[:].astype(jnp.float32),
                    bln_ref[:].astype(jnp.float32))
        gate = gx32 + g
        if do_gates:
            h, c = _gates(gate, c, H)
        else:
            h = gate[:, :H]
        y_ref[u_i] = h.astype(y_ref.dtype)
    h_scr[:] = h
    c_scr[:] = c

    @pl.when(s == S // U - 1)
    def _flush():
        hn_ref[:] = h.astype(hn_ref.dtype)
        cn_ref[:] = c.astype(cn_ref.dtype)


def _run_variant(gxp, wh, glnx, blnx, gln, bln, bias, h0, c0, *,
                 U=2, do_lnx=True, do_lnh=True, do_gates=True):
    S, B, H4 = gxp.shape
    H = H4 // 4
    itemsize = gxp.dtype.itemsize
    n_bufs = (12 if itemsize == 4 else 18) + (4 if U >= 2 else 0)
    blk = lc._pick_blk_b(B, H, n_bufs=n_bufs, itemsize=itemsize)
    kernel = functools.partial(_var_kernel, S=S, H=H, U=U, do_lnx=do_lnx,
                               do_lnh=do_lnh, do_gates=do_gates)
    sb = lambda b, s: (s, b, 0)
    const_b = lambda b, s: (b, 0)
    full = lambda b, s: (0, 0)
    seq_spec = pl.BlockSpec((U, blk, H4), sb, memory_space=pltpu.VMEM)
    out_seq = pl.BlockSpec((U, blk, H), sb, memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((blk, H), const_b, memory_space=pltpu.VMEM)
    vec4 = pl.BlockSpec((1, H4), full, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((S, B, H), gxp.dtype),
                   jax.ShapeDtypeStruct((B, H), gxp.dtype),
                   jax.ShapeDtypeStruct((B, H), gxp.dtype)),
        grid=(pl.cdiv(B, blk), S // U),
        in_specs=[seq_spec,
                  pl.BlockSpec((wh.shape[0], H4), full,
                               memory_space=pltpu.VMEM),
                  vec4, vec4, vec4, vec4, vec4, state_spec, state_spec],
        out_specs=(out_seq, state_spec, state_spec),
        scratch_shapes=[pltpu.VMEM((blk, H), jnp.float32),
                        pltpu.VMEM((blk, H), jnp.float32)],
        interpret=lc._ls.INTERPRET,
    )(gxp, wh, glnx.reshape(1, H4), blnx.reshape(1, H4),
      gln.reshape(1, H4), bln.reshape(1, H4), bias.reshape(1, H4), h0, c0)


def main():
    results = {}
    for (S, B, H) in [(64, 3, 384), (32, 256, 512)]:
        ks = jax.random.split(jax.random.PRNGKey(0), 9)
        H4 = 4 * H
        gxp = jax.random.normal(ks[0], (S, B, H4)) * 0.5
        wh = jax.random.normal(ks[1], (H, H4)) / jnp.sqrt(H)
        glnx = jnp.abs(jax.random.normal(ks[2], (H4,))) + 0.5
        blnx = jax.random.normal(ks[3], (H4,)) * 0.1
        gln = jnp.abs(jax.random.normal(ks[4], (H4,))) + 0.5
        bln = jax.random.normal(ks[5], (H4,)) * 0.1
        bias = jax.random.normal(ks[6], (H4,)) * 0.1
        h0 = jax.random.normal(ks[7], (B, H))
        c0 = jax.random.normal(ks[8], (B, H))
        wh_bf = wh.astype(jnp.bfloat16)
        a9 = (gxp, wh, glnx, blnx, gln, bln, bias, h0, c0)
        a9_bf = (gxp, wh_bf, glnx, blnx, gln, bln, bias, h0, c0)

        variants = {
            "prod": jax.jit(lambda a: lc._layer_impl(
                *a, norm=True, stash=False)[0]),
            "dotonly": jax.jit(lambda a: _run_variant(
                *a, do_lnx=False, do_lnh=False, do_gates=False)[0]),
            "noln": jax.jit(lambda a: _run_variant(
                *a, do_lnx=False, do_lnh=False)[0]),
            "nox": jax.jit(lambda a: _run_variant(*a, do_lnx=False)[0]),
            "u4": jax.jit(lambda a: _run_variant(*a, U=4)[0]),
            "u8": jax.jit(lambda a: _run_variant(*a, U=8)[0]),
        }
        row = {}
        for nm, f in variants.items():
            if nm in ("u8",) and S % 8:
                continue
            sec = bench_fn(f, a9, k1=10, k2=210)
            row[nm] = round(sec * 1e6, 1)
            print(f"S={S} B={B} H={H}  {nm:<10} {sec*1e6:8.1f}us", flush=True)
        for nm, f in [("wbf16", variants["prod"]),
                      ("dot_wbf16", variants["dotonly"])]:
            sec = bench_fn(f, a9_bf, k1=10, k2=210)
            row[nm] = round(sec * 1e6, 1)
            print(f"S={S} B={B} H={H}  {nm:<10} {sec*1e6:8.1f}us", flush=True)

        # Sanity: wbf16 == prod bitwise under ambient bf16 matmuls (the MXU
        # rounds f32 operands to bf16 anyway).
        import numpy as np
        y_f32wh = np.asarray(variants["prod"](a9))
        y_bf16wh = np.asarray(variants["prod"](a9_bf))
        row["wbf16_max_abs_diff"] = float(np.max(np.abs(y_f32wh - y_bf16wh)))
        print(f"  wbf16 vs prod max|diff| = {row['wbf16_max_abs_diff']:.2e}",
              flush=True)
        results[f"S{S}_B{B}_H{H}"] = row
    print(json.dumps(results, indent=1))
    with open("bench_results/r3_lstm_decomp.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
