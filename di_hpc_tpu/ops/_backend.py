"""Backend selection helpers for the fused op layer."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fused_kernels_ok(*arrays, method: str = "auto") -> bool:
    """True when the fully-fused Pallas path applies: method is auto/pallas,
    running on TPU (or Pallas interpret mode for tests), all arrays f32 with
    a 2-D (T, B) layout."""
    if method not in ("auto", "pallas"):
        return False
    from di_hpc_tpu.pallas_kernels import linear_scan as _ls

    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    if not (on_tpu or _ls.INTERPRET):
        return False
    for a in arrays:
        a = jnp.asarray(a)
        if a.ndim != 2 or a.dtype != jnp.float32:
            return False
        # VMEM feasibility: rl_scans._pick_blk cannot shrink below 128 lanes,
        # and the widest kernel (vtrace) keeps ~11 live (T, 128) f32 buffers
        # under Mosaic's 16MB scoped limit.  Longer T falls back to the
        # associative scan, which scales arbitrarily.
        if 11 * (a.shape[0] + 1) * 128 * 4 > 13 * 1024 * 1024:
            return False
    return True
