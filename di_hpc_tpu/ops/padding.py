"""Production ragged-batch padding (host bucketing + static-shape device
batches).

Same API and semantics as the oracle (di_hpc_tpu.origin.padding, reference
hpc_rll/rl_utils/padding.py + src/rl_utils/padding.cu), with the oracle
bucketing DP routed through the native C++ host core when available
(csrc/bucketing.cpp, built lazily via di_hpc_tpu.utils.native).

Design note: on TPU there are no per-call device pointer tables (the reference
cudaMallocs and H2D-copies pointer/shape arrays per call,
src/rl_utils/padding.cu:111-140).  Grouped bucketing bounds the set of padded
shapes, which on TPU doubles as a bound on the jit compile cache for any
downstream static-shape consumer — bucketing IS the ragged-shape strategy.
"""

from __future__ import annotations

from typing import List

import numpy as np

from di_hpc_tpu.origin import padding as _origin
from di_hpc_tpu.origin.padding import (
    UnPadding1D,
    UnPadding2D,
    UnPadding3D,
    cum,
)
from di_hpc_tpu.utils.native import (
    get_native_ext,
    native_oracle_split_group,
    native_pack_padded_f32,
)


# Gate for the LEGACY ctypes pack only (used when the CPython extension is
# unavailable): its per-call Python marshalling (~65-165us for 64 arrays,
# measured r5) exceeds what the C copies save below ~100KB of payload.  The
# preferred extension path (csrc/hostcore.c) has no Python-side per-array
# work and wins at every bench config including the 20KB 1D one, so it runs
# ungated.
_CTYPES_PACK_MIN_ELEMS = 25_600


def _pad_nd_fast(x, value, ndim):
    """Padded-batch assembly with the native ragged-pack data plane for
    float32 inputs; falls back to the Python/numpy oracle when no native
    path applies (non-f32/non-contiguous input, toolchain absent — the
    native layer rejects those itself and returns None, so non-f32 inputs
    keep their oracle dtype semantics)."""
    import jax.numpy as jnp

    try:
        shapes = [tuple(t.shape) for t in x]
    except AttributeError:
        return _origin._pad_nd(x, value, ndim)
    if x and all(len(s) == ndim for s in shapes):
        ext = get_native_ext()
        if ext is not None or sum(cum(s) for s in shapes) >= _CTYPES_PACK_MIN_ELEMS:
            max_shape = [max(d) for d in zip(*shapes)]
            res = native_pack_padded_f32(x, max_shape, value)
            if res is not None:
                out, mask = res
                return jnp.asarray(out), jnp.asarray(mask), shapes
    return _origin._pad_nd(x, value, ndim)

__all__ = [
    "Padding1D", "Padding2D", "Padding3D",
    "UnPadding1D", "UnPadding2D", "UnPadding3D",
    "oracle_split_group", "sample_split_group",
]


def oracle_split_group(x: List, group: int):
    """Exact min-cost bucketing; native C++ DP with Python fallback.

    Input must be sorted ascending by numel (like the reference,
    origin/padding.py:11-50).
    """
    numels = [cum(tuple(t.shape)) for t in x]
    res = native_oracle_split_group(numels, group)
    if res is None:
        return _origin.oracle_split_group(x, group)
    positions, _cost = res
    shapes = [tuple(x[i - 1].shape) for i in positions[1:]]
    return shapes, positions


def sample_split_group(x: List, group: int, rng=None):
    """Random-pivot bucketing (reference src/rl_utils/padding.cu:8-43):
    sample group-1 pivot shapes + the max shape, dedupe, and split the sorted
    list at each pivot.  Returns (group_shapes, group_idx).

    Unlike the reference (which dedupes pivots by shape and crashes its
    bucket-count invariant when two distinct shapes share a numel,
    origin/padding.py:77-84), pivots here are deduped by numel — the split
    comparisons are numel-based, so equal-numel shapes are one pivot.
    """
    rng = np.random.default_rng() if rng is None else rng
    x_sorted = sorted(x, key=lambda t: cum(tuple(t.shape)))
    sampled_idx = set(rng.choice(len(x_sorted), group - 1).tolist())
    group_shape = [tuple(t.shape) for i, t in enumerate(x_sorted) if i in sampled_idx]
    group_shape += [tuple(x_sorted[-1].shape)]
    group_shape = sorted({cum(s): s for s in group_shape}.values(), key=cum)
    group_shape_idx = 0
    group_idx = [0]
    for i, t in enumerate(x_sorted):
        if cum(tuple(t.shape)) > cum(group_shape[group_shape_idx]):
            group_idx.append(i)
            group_shape_idx += 1
    group_idx.append(len(x_sorted))
    return group_shape, group_idx


def _padding_nd(x, ndim, mode="constant", value=0, group=1,
                group_mode="sample", rng=None):
    assert mode == "constant", mode
    assert group_mode in ("sample", "oracle"), group_mode
    assert group >= 1, group
    if group <= 1:
        return _pad_nd_fast(x, value, ndim)
    x = sorted(x, key=lambda t: cum(tuple(t.shape)))
    if group_mode == "oracle":
        group_shape, group_idx = oracle_split_group(x, group)
    else:
        group_shape, group_idx = sample_split_group(x, group, rng=rng)
    assert len(group_idx) == len(group_shape) + 1
    ret = [
        _pad_nd_fast(x[group_idx[i]:group_idx[i + 1]], value, ndim)
        for i in range(len(group_shape))
    ]
    return list(zip(*ret))


def Padding1D(x, mode="constant", value=0, group=1, group_mode="sample", rng=None):
    return _padding_nd(x, 1, mode, value, group, group_mode, rng)


def Padding2D(x, mode="constant", value=0, group=1, group_mode="sample", rng=None):
    return _padding_nd(x, 2, mode, value, group, group_mode, rng)


def Padding3D(x, mode="constant", value=0, group=1, group_mode="sample", rng=None):
    return _padding_nd(x, 3, mode, value, group, group_mode, rng)
