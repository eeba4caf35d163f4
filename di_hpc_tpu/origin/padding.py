"""Ragged-batch padding oracles (host-side reference semantics).

Port of hpc_rll/origin/padding.py: pack a list of different-shaped tensors into
a padded dense batch + mask + shape record, optionally split into <=`group`
buckets (by random-sample pivots or by an exact DP) to reduce pad waste.

On TPU, ragged batching is a *host-side bucketing + static-shape jit* problem —
there are no device pointer tables (reference src/rl_utils/padding.cu:111-140);
the padded buffers here are assembled with numpy and transferred once.  The
production path (same API, numpy fast-paths + optional C++ bucketing core)
lives in di_hpc_tpu.ops.padding.
"""

from __future__ import annotations

from functools import reduce
from typing import List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp


def cum(t: Sequence[int]) -> int:
    return reduce(lambda a, b: a * b, t)


def oracle_split_group(x: List, group: int) -> Tuple[List[Tuple], List[int]]:
    """Exact DP bucketing minimizing total padded cost, O(M*N^2).

    Inputs must be sorted ascending by numel.  Returns (shapes, positions)
    where positions are the split indices into x (len group+1, positions[0]=0)
    and shapes[i] is the max shape of bucket i (reference
    origin/padding.py:11-50; C++ host version src/rl_utils/padding.cu:44-108).
    """
    arr = [None] + [cum(tuple(t.shape)) for t in x]
    N, M = len(arr) - 1, group

    def p(start: int, end: int) -> int:
        return arr[end] * (end - start + 1)

    f = {(0, 0): (0, 0)}
    for i in range(1, N + 1):
        for j in range(1, M + 1):
            ress = []
            for k in range(0, i):
                if (k, j - 1) in f:
                    last_cost, _ = f[(k, j - 1)]
                    ress.append((last_cost + p(k + 1, i), k))
            if ress:
                f[(i, j)] = min(ress)

    last_position, last_cnt = N, M
    positions = [N]
    while last_position > 0:
        _, last_position = f[(last_position, last_cnt)]
        last_cnt -= 1
        positions.append(last_position)
    assert len(positions) == M + 1
    positions = positions[::-1]
    shapes = [tuple(x[i - 1].shape) for i in positions[1:]]
    return shapes, positions


def _pad_nd(x: List, value=0, ndim: int = 1):
    """Pad a list of ndim-dimensional arrays to the elementwise-max shape.

    Returns (padded (len(x), *max_shape), mask, shapes).  Mask uses the same
    fill value outside valid regions and 1 inside, matching the reference
    (origin/padding.py:53-63).
    """
    shapes = [tuple(t.shape) for t in x]
    for s in shapes:
        assert len(s) == ndim, (s, ndim)
    max_shape = [max(d) for d in zip(*shapes)]
    new_shape = (len(x), *max_shape)
    dtype = np.asarray(x[0]).dtype
    padded = np.full(new_shape, value, dtype=dtype)
    mask = np.full(new_shape, value, dtype=dtype)
    for i, t in enumerate(x):
        region = (i,) + tuple(slice(0, d) for d in shapes[i])
        padded[region] = np.asarray(t)
        mask[region] = 1
    return jnp.asarray(padded), jnp.asarray(mask), shapes


def _grouped_padding(x: List, value, group: int, group_mode: str, ndim: int, rng=None):
    assert group_mode in ("sample", "oracle"), group_mode
    x = sorted(x, key=lambda t: cum(tuple(t.shape)))
    if group_mode == "sample":
        rng = np.random.default_rng() if rng is None else rng
        sampled_idx = set(rng.choice(len(x), group - 1).tolist())
        group_shape = [tuple(t.shape) for i, t in enumerate(x) if i in sampled_idx]
        group_shape += [tuple(x[-1].shape)]
        group_shape = sorted(set(group_shape), key=cum)
        group_shape_idx = 0
        group_idx = [0]
        for i, t in enumerate(x):
            if cum(tuple(t.shape)) > cum(group_shape[group_shape_idx]):
                group_idx.append(i)
                group_shape_idx += 1
        group_idx.append(len(x))
    else:
        group_shape, group_idx = oracle_split_group(x, group)
    assert len(group_idx) == len(group_shape) + 1
    ret = [
        _pad_nd(x[group_idx[i]:group_idx[i + 1]], value, ndim)
        for i in range(len(group_shape))
    ]
    return list(zip(*ret))


def Padding1D(x: List, mode: str = "constant", value=0, group: int = 1,
              group_mode: str = "sample", rng=None):
    assert mode == "constant", mode
    assert group >= 1, group
    if group > 1:
        return _grouped_padding(x, value, group, group_mode, ndim=1, rng=rng)
    return _pad_nd(x, value, ndim=1)


def Padding2D(x: List, mode: str = "constant", value=0, group: int = 1,
              group_mode: str = "sample", rng=None):
    assert mode == "constant", mode
    assert group >= 1, group
    if group > 1:
        return _grouped_padding(x, value, group, group_mode, ndim=2, rng=rng)
    return _pad_nd(x, value, ndim=2)


def Padding3D(x: List, mode: str = "constant", value=0, group: int = 1,
              group_mode: str = "sample", rng=None):
    assert mode == "constant", mode
    assert group >= 1, group
    if group > 1:
        return _grouped_padding(x, value, group, group_mode, ndim=3, rng=rng)
    return _pad_nd(x, value, ndim=3)


def _unpad(x, shapes: List, deepcopy: bool = False):
    out = []
    for i in range(x.shape[0]):
        region = (i,) + tuple(slice(0, d) for d in shapes[i])
        item = x[region]
        if deepcopy:
            item = jnp.array(item)
        out.append(item)
    return out


def UnPadding1D(x, shapes, deepcopy: bool = False):
    if isinstance(x, (list, tuple)):
        return sum((_unpad(t, s, deepcopy) for t, s in zip(x, shapes)), [])
    return _unpad(x, shapes, deepcopy)


def UnPadding2D(x, shapes, deepcopy: bool = False):
    if isinstance(x, (list, tuple)):
        return sum((_unpad(t, s, deepcopy) for t, s in zip(x, shapes)), [])
    return _unpad(x, shapes, deepcopy)


def UnPadding3D(x, shapes, deepcopy: bool = False):
    if isinstance(x, (list, tuple)):
        return sum((_unpad(t, s, deepcopy) for t, s in zip(x, shapes)), [])
    return _unpad(x, shapes, deepcopy)
