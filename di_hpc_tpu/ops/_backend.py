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
    return True
