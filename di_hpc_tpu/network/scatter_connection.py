"""Fused scatter-connection (TPU-native).

The reference splits this into cover/add CUDA kernels with a gather backward
(src/torch_utils/network/scatter_connection.cu, scatter_connection_kernel.h).
XLA's scatter/gather lowering serializes on TPU, so the fused path computes
both modes as ONE-HOT MXU CONTRACTIONS instead (measured at the reference
config B=M=N=256, H=W=16: add 1379 -> 145us, cover 731 -> 158us —
bench_results/profile_scatter.py):

 - 'add':   out[b,hw,:] = sum_m 1[cell_bm == hw] * x[b,m,:]   (einsum, f32)
 - 'cover': winner[b,hw] = max_m (cell_bm == hw ? m : -1), then the winning
   entity is selected by a second one-hot einsum — deterministic
   last-writer-by-entity-index (the reference's GPU cover mode is admittedly
   nondeterministic, tests/test_scatter.py:17).

Einsum precision follows the ambient `jax.default_matmul_precision` (see
`_exact_onehot_einsum`): exact-f32 HIGHEST under a forced-float32 context
(parity workflows), 3-pass BF16_BF16_F32_X3 (~1.5e-5 rel, 1.3x faster)
otherwise.  The custom VJP matches the reference's backward: every entity
reads grad_out at its own location (exact for 'add'; for 'cover' collisions
this double-reads — the documented approximation of
scatter_connection_kernel.h:91-106) — also an MXU contraction here.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from di_hpc_tpu.origin.scatter_connection import scatter_connection as _scatter_oracle

__all__ = ["scatter_connection", "ScatterConnection"]

# One-hot tensor budget: (B, M, HW) f32 materialized for the MXU contraction.
_ONEHOT_BUDGET_BYTES = 1 * 1024 * 1024 * 1024
# The contraction does HW x the scatter's FLOPs; it wins while the MXU eats
# that redundancy (measured 9.5x at HW=256) but must lose for large spatial
# maps, so cap HW rather than only memory.
_MAX_HW_FOR_MATMUL = 4096


def _matmul_path_ok(B: int, M: int, HW: int) -> bool:
    return (HW <= _MAX_HW_FOR_MATMUL
            and B * M * HW * 4 <= _ONEHOT_BUDGET_BYTES)


def _exact_onehot_einsum(subscripts: str, onehot: jax.Array, v: jax.Array,
                         out_dtype) -> jax.Array:
    """One-hot x value MXU contraction, precision following the ambient
    `jax.default_matmul_precision` (same convention as the LSTM kernel):

     - ambient float32/highest (parity workflows): Precision.HIGHEST —
       exact-f32 result (one-hot products are exact; measured 9.5e-7 vs the
       oracle at the reference config).
     - ambient default: BF16_BF16_F32_X3 (3 MXU passes, bf16x2-per-operand
       quality) — ~1.5e-5 relative error, 153.9 -> 115.1us on the v5e at
       B=M=N=HW=256 (the 1-pass bf16 floor is 104.7us, so X3 is
       near-optimal).  Plain 1-pass bf16 would round the VALUES to ~1e-2.

    Alternatives measured worse: per-operand precision tuples are ignored
    by this XLA, and an explicit hi/lo value split round-trips HBM (4x
    slower).  bf16 values take the single-pass path directly.
    """
    if v.dtype == jnp.bfloat16:
        return jnp.einsum(subscripts, onehot.astype(jnp.bfloat16), v,
                          preferred_element_type=jnp.float32).astype(out_dtype)
    # Only explicit full-f32 requests force HIGHEST; "tensorfloat32"/"high"
    # ask for reduced precision, which X3 already exceeds.
    if jax.config.jax_default_matmul_precision in ("float32", "highest"):
        prec = jax.lax.Precision.HIGHEST
    else:
        prec = jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X3
    out = jnp.einsum(subscripts, onehot.astype(jnp.float32),
                     v.astype(jnp.float32), precision=prec)
    return out.astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 3))
def scatter_connection(x: jax.Array, spatial_size: Tuple[int, int],
                       location: jax.Array, scatter_type: str = "cover") -> jax.Array:
    """(B, M, N) entities + (B, M, 2) (y, x) locations -> (B, N, H, W)."""
    from di_hpc_tpu.ops._validate import _fail, _is_int
    if x.ndim != 3:
        _fail("scatter_connection", f"x must be (B, M, N); got {x.shape}")
    if location.shape != x.shape[:2] + (2,):
        _fail("scatter_connection",
              f"location must have shape {x.shape[:2] + (2,)} ((B, M, 2) "
              f"(y, x) pairs); got {location.shape}")
    if not _is_int(location):
        _fail("scatter_connection", "location must be an integer array; got "
              f"dtype {location.dtype}")
    if scatter_type not in ("cover", "add"):
        _fail("scatter_connection",
              f"scatter_type must be 'cover' or 'add'; got {scatter_type!r}")
    return _scatter_impl(x, spatial_size, location, scatter_type)


@functools.partial(jax.jit, static_argnames=("spatial_size", "scatter_type"))
def _scatter_impl(x, spatial_size, location, scatter_type):
    assert scatter_type in ("cover", "add"), scatter_type
    B, M, N = x.shape
    H, W = spatial_size
    HW = H * W
    if not _matmul_path_ok(B, M, HW):
        return _scatter_oracle(x, spatial_size, location, scatter_type)

    cell = location[..., 0] * W + location[..., 1]            # (B, M)
    hw = jax.lax.broadcasted_iota(jnp.int32, (B, M, HW), 2)
    hit = hw == cell[..., None]                               # (B, M, HW)
    if scatter_type == "add":
        sel = hit
    else:
        m_ids = jnp.arange(M, dtype=jnp.int32)[None, :, None]
        winner = jnp.max(jnp.where(hit, m_ids, -1), axis=1)   # (B, HW)
        sel = m_ids == winner[:, None, :]                     # one (or zero) m per cell
    out = _exact_onehot_einsum("bmh,bmn->bhn", sel, x, x.dtype)
    return out.reshape(B, H, W, N).transpose(0, 3, 1, 2)


def _fwd(x, spatial_size, location, scatter_type):
    return scatter_connection(x, spatial_size, location, scatter_type), location


@functools.partial(jax.jit, static_argnames=("spatial_size",))
def _bwd_impl(spatial_size, location, g):
    # g: (B, N, H, W).  Every entity reads the gradient at its own location —
    # exact for 'add'; for 'cover' collisions this double-counts, matching the
    # reference kernel and its origin oracle under autograd.
    H, W = spatial_size
    B, N = g.shape[0], g.shape[1]
    HW = H * W
    g_flat = g.transpose(0, 2, 3, 1).reshape(B, HW, N)        # (B, HW, N)
    cell = location[..., 0] * W + location[..., 1]            # (B, M)
    M = cell.shape[1]
    if not _matmul_path_ok(B, M, HW):
        # Zero the gradient of out-of-range entities (their forward update is
        # dropped) — take_along_axis alone would CLAMP the index and return a
        # real gradient, diverging from the matmul path's semantics.
        valid = (cell >= 0) & (cell < HW)
        gathered = jnp.take_along_axis(
            g_flat, jnp.clip(cell, 0, HW - 1)[..., None], axis=1)
        return jnp.where(valid[..., None], gathered, 0.0)
    hw = jax.lax.broadcasted_iota(jnp.int32, (B, M, HW), 2)
    onehot = hw == cell[..., None]
    return _exact_onehot_einsum("bmh,bhn->bmn", onehot, g_flat, g.dtype)


def _bwd(spatial_size, scatter_type, location, g):
    return (_bwd_impl(spatial_size, location, g), None)


scatter_connection.defvjp(_fwd, _bwd)


class ScatterConnection:
    """Wrapper mirroring hpc_rll/torch_utils/network/scatter_connection.py:7-87."""

    def __init__(self, scatter_type: str):
        assert scatter_type in ("cover", "add")
        self.scatter_type = scatter_type

    def __call__(self, x, spatial_size, location):
        return scatter_connection(x, tuple(spatial_size), location, self.scatter_type)

    forward = __call__
