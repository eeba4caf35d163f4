"""Tracing / profiling / roofline utilities.

The reference's observability is a debug TRACE macro and D2H dump helpers
(include/hpc/rll/cuda/common.h:17-42) plus wall-clock prints in tests.  The
TPU-native equivalents:

 - `trace(dir)`: context manager around jax.profiler (view in Perfetto /
   TensorBoard);
 - `bench_fn`: dispatch-overhead-immune op timing (fori_loop differential,
   the method bench.py uses);
 - `roofline`: compares measured time against the HBM speed-of-light for the
   op's actual memory traffic (per BASELINE.md, the scan-family ops are
   HBM-bound, so bytes/bandwidth is the floor).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp

# Peak HBM bandwidth per chip, bytes/s (TPU v5e ~819 GB/s; v4 ~1.2 TB/s).
HBM_GBPS = {"v5e": 819e9, "v4": 1228e9, "v5p": 2765e9}


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/dihpc_trace"):
    """Profile a block: `with trace(): f()` then inspect in Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def bench_fn(fn, *args, k1: int = 10, k2: int = 110, reps: int = 4,
             method: str = "barrier") -> float:
    """Seconds per application of fn(*args), measured as the marginal cost of
    extra iterations inside one jitted fori_loop (cancels dispatch/readback
    overhead, which dominates over tunneled chips).

    method="barrier" (default) ties args[0]'s leaves to the loop carry with
    jax.lax.optimization_barrier: nothing can be hoisted out of the loop and
    the inputs' bytes are untouched — the op is measured at its true cost.
    method="perturb" is the legacy scheme (adds carry*1e-12 to every float
    leaf): it ALSO prevents hoisting but costs one full extra HBM pass per
    input per iteration, which an opaque Pallas op pays in full while XLA
    fuses it into a jnp op's first consumer — it systematically flatters
    naive-vs-fused comparisons (measured on gae: fused 99us perturbed vs
    62us barrier at an analytic 61.5us floor).  Kept for A/B checks only.
    """

    def looped(K):
        @jax.jit
        def run():
            def body(i, carry):
                if method == "barrier":
                    leaves, treedef = jax.tree.flatten(args[0])
                    out = jax.lax.optimization_barrier((carry,) + tuple(leaves))
                    dep0 = jax.tree.unflatten(treedef, out[1:])
                else:
                    # Perturb IN the input's own dtype: `x + f32_scalar`
                    # would silently upcast bf16 inputs to f32 and measure a
                    # different (dtype-dispatched) code path.
                    dep0 = jax.tree.map(
                        lambda x: x + (carry * 1e-12).astype(jnp.asarray(x).dtype)
                        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
                        else x,
                        args[0])
                out = fn(dep0, *args[1:])
                return (jnp.sum(jax.tree.leaves(out)[0]).astype(jnp.float32)
                        * 1e-12 + 1.0)

            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
        return run

    times = []
    for K in (k1, k2):
        run = looped(K)
        float(run())
        best = float("inf")
        for _ in range(reps):
            t = time.time()
            float(run())
            best = min(best, time.time() - t)
        times.append(best)
    return max((times[1] - times[0]) / (k2 - k1), 1e-12)


@dataclass
class Roofline:
    seconds: float
    bytes_accessed: int
    achieved_gbps: float
    sol_seconds: float
    sol_fraction: float

    def __str__(self):
        return (f"{self.seconds*1e6:.1f}us, {self.achieved_gbps/1e9:.0f}GB/s "
                f"({self.sol_fraction*100:.0f}% of HBM speed-of-light, "
                f"floor {self.sol_seconds*1e6:.1f}us)")


def roofline(seconds: float, bytes_accessed: int, chip: str = "v5e") -> Roofline:
    bw = HBM_GBPS[chip]
    sol = bytes_accessed / bw
    return Roofline(
        seconds=seconds,
        bytes_accessed=bytes_accessed,
        achieved_gbps=bytes_accessed / seconds,
        sol_seconds=sol,
        sol_fraction=sol / seconds,
    )
