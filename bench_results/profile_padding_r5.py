"""r5 padding decomposition: why the r4 native pack lost to numpy at
ungrouped 2D (driver r4: pad2d fused 1414.78us vs naive 1129.87us), and the
evidence for the two fixes that closed it.

Findings on the bench host (2-core, ~9GB/s single-thread fill bandwidth):

  r4 ctypes path, 2D config (64 tensors, ~2.5MB out+mask payload):
    marshal only (64x ascontiguousarray + ctypes ptr arrays)   165 us
    np.full prefill x2 + C++ copy pass (double touch)          495 us
    numpy oracle (np.full x2 + 64 slice-assigns)               324 us
  -> the native path lost on BOTH fixed overhead (marshalling) and
     payload passes (prefill + copy touches every byte twice).

  Fixes (csrc/hostcore.c + csrc/bucketing.cpp single-touch rewrite):
    1. single-touch pack: C writes every out/mask element exactly once
       (valid memcpy + pad fill + mask per padded row) over np.empty —
       removes the prefill pass.  C++ pass alone: 275 us ~= the 2.5MB
       write floor at 9GB/s.
    2. CPython extension (buffer protocol, no numpy headers): the
       per-array pointer walk moves into PySequence_Fast +
       PyObject_GetBuffer, removing the 65-165us Python marshalling that
       dominated the small-payload (1D, 20KB) config.  ctypes variants
       measured: current 130us / __array_interface__ 65us /
       np.fromiter 73us — none get near the C-side walk.

  After (this script's output, r5):
    1d: 1.50x  2d: 1.19x  3d: 1.67x   grp4: 4.51x / 2.81x / 1.57x
  (was r4 driver: 0.98x / 0.80x / 1.13x, grp4 1.40x / 2.38x / 3.83x)

Run: python bench_results/profile_padding_r5.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from di_hpc_tpu.origin import padding as origin
from di_hpc_tpu.ops import padding as ops
from di_hpc_tpu.utils.native import get_native_ext


def timeit(fn, reps=20):
    best = float("inf")
    for _ in range(reps + 2):
        t = time.time()
        fn()
        best = min(best, time.time() - t)
    return best * 1e6


def main():
    assert get_native_ext() is not None, "hostcore extension failed to build"
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
    for nd, xs in data.items():
        ndim = int(nd[0])
        p, m, _ = ops._pad_nd_fast(list(xs), 7.5, ndim)
        op, om, _ = origin._pad_nd(list(xs), 7.5, ndim)
        assert np.array_equal(np.asarray(p), np.asarray(op)), nd
        assert np.array_equal(np.asarray(m), np.asarray(om)), nd
    for nd, xs in data.items():
        o = getattr(origin, f"Padding{nd.upper()}")
        f = getattr(ops, f"Padding{nd.upper()}")
        with jax.default_device(jax.devices("cpu")[0]):
            t_o = timeit(lambda: jax.block_until_ready(o(list(xs))))
            t_f = timeit(lambda: jax.block_until_ready(f(list(xs))))
            t_og = timeit(lambda: jax.block_until_ready(
                o(list(xs), group=4, group_mode="oracle")))
            t_fg = timeit(lambda: jax.block_until_ready(
                f(list(xs), group=4, group_mode="oracle")))
        print(f"{nd}: oracle {t_o:7.1f}us product {t_f:7.1f}us "
              f"ratio {t_o/t_f:.2f}x | grp4 {t_og:7.1f} vs {t_fg:7.1f} "
              f"ratio {t_og/t_fg:.2f}x")


if __name__ == "__main__":
    main()
