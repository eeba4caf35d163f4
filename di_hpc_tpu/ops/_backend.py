"""Backend selection helpers for the fused op layer.

Also the single source of truth for each kernel family's VMEM io-buffer
charge (``*_NBUFS``): the gate below and rl_scans' _pick_blk calls must use
the SAME number or the gate admits shapes the kernel cannot compile at on
real hardware (the r3 failure mode this gate exists to prevent).  This
module stays pallas-import-free so ops modules can import the constants
without pulling jax.experimental.pallas at import time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# gae / lambda-returns / td_lambda-loss: row-constant (T, 1) scan
# coefficients — io buffers only.
ROWCONST_SCAN_NBUFS = 3
# vtrace / upgo: the suffix scan carries a FULL (T, blk) coefficient plane
# derived in-kernel, keeping extra shift temporaries live per pass.
VTRACE_NBUFS = 10
UPGO_NBUFS = 10


def fused_kernels_ok(*arrays, method: str = "auto", n_bufs: int = 3) -> bool:
    """True when the fully-fused Pallas path applies: method is auto/pallas,
    running on TPU (or Pallas interpret mode for tests), all arrays f32 with
    a 2-D (T, B) layout.

    ``n_bufs`` is the CALLING op's VMEM io-buffer charge — pass the op's
    ``*_NBUFS`` constant from this module (rl_scans' _pick_blk calls use the
    same constants).  The gate mirrors the picker's budget at its blk=128
    floor: if even the narrowest block over-charges Mosaic's scoped-VMEM
    limit the kernel would fail to compile on real hardware (interpret mode
    does not check this), so the op must fall back to the associative scan,
    which scales arbitrarily."""
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
        # Same formula as rl_scans._pick_blk (io charge + ~4 live doubling-
        # scan temporaries) evaluated at the blk=128 floor.
        if (n_bufs + 4) * (a.shape[0] + 1) * 128 * 4 > 13 * 1024 * 1024:
            return False
    return True
