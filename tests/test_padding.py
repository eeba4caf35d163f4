"""Padding 1D/2D/3D + grouped bucketing: exact round-trips and bucket
invariants (reference asserts, tests/test_padding.py:54-55,77-87)."""

import jax.numpy as jnp
import numpy as np
import pytest

from di_hpc_tpu import ops, origin
from di_hpc_tpu.origin import padding as _origin_padding
from di_hpc_tpu.origin.padding import cum


def _rand_list(rng, n, ndim, lo, hi):
    out = []
    for _ in range(n):
        shape = tuple(int(rng.integers(lo, hi)) for _ in range(ndim))
        out.append(jnp.asarray(rng.standard_normal(shape), jnp.float32))
    return out


@pytest.mark.parametrize("ndim,pad", [(1, ops.Padding1D), (2, ops.Padding2D), (3, ops.Padding3D)])
def test_pad_roundtrip(ndim, pad):
    rng = np.random.default_rng(0)
    data = _rand_list(rng, 12, ndim, 3, 9)
    unpad = {1: ops.UnPadding1D, 2: ops.UnPadding2D, 3: ops.UnPadding3D}[ndim]
    x, mask, shapes = pad(data)
    assert x.shape[0] == len(data)
    out = unpad(x, shapes)
    for a, b in zip(data, out):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # mask marks exactly the valid region
    assert float(jnp.sum(mask)) == sum(cum(s) for s in shapes)


@pytest.mark.parametrize("group_mode", ["sample", "oracle"])
def test_grouped_pad_roundtrip_and_invariants(group_mode):
    rng = np.random.default_rng(1)
    data = _rand_list(rng, 16, 1, 8, 64)
    xs, masks, shapes = ops.Padding1D(data, group=4, group_mode=group_mode,
                                      rng=np.random.default_rng(2))
    assert len(xs) <= 4
    # bucket shapes are ascending and each tensor fits its bucket
    maxes = [x.shape[1] for x in xs]
    assert maxes == sorted(maxes)
    for x, sh in zip(xs, shapes):
        for s in sh:
            assert s[0] <= x.shape[1]
    out = ops.UnPadding1D(list(xs), list(shapes))
    got = sorted([tuple(np.asarray(t).ravel().tolist()) for t in out])
    want = sorted([tuple(np.asarray(t).ravel().tolist()) for t in data])
    assert got == want


def test_oracle_dp_native_matches_python():
    rng = np.random.default_rng(3)
    data = sorted(_rand_list(rng, 20, 1, 4, 90), key=lambda t: cum(tuple(t.shape)))
    shapes_py, pos_py = origin.oracle_split_group(data, 5)
    shapes_nat, pos_nat = ops.oracle_split_group(data, 5)
    # Both must be min-cost solutions; costs must agree exactly.
    def cost(positions):
        c = 0
        for i in range(len(positions) - 1):
            s, e = positions[i], positions[i + 1]
            c += cum(tuple(data[e - 1].shape)) * (e - s)
        return c
    assert cost(pos_nat) == cost(pos_py)
    assert pos_nat[0] == 0 and pos_nat[-1] == len(data)


def test_oracle_dp_beats_or_ties_naive():
    """The DP cost is never worse than the single-bucket cost."""
    rng = np.random.default_rng(4)
    data = sorted(_rand_list(rng, 15, 1, 4, 60), key=lambda t: cum(tuple(t.shape)))
    _, pos = ops.oracle_split_group(data, 3)
    def cost(positions):
        c = 0
        for i in range(len(positions) - 1):
            s, e = positions[i], positions[i + 1]
            c += cum(tuple(data[e - 1].shape)) * (e - s)
        return c
    naive = cum(tuple(data[-1].shape)) * len(data)
    assert cost(pos) <= naive


def test_native_pack_matches_origin():
    """C++ ragged pack produces identical padded batches and masks."""
    from di_hpc_tpu.ops.padding import _pad_nd_fast
    from di_hpc_tpu.utils.native import get_native_lib
    if get_native_lib() is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(9)
    for ndim in (1, 2, 3):
        data = _rand_list(rng, 10, ndim, 2, 7)
        got = _pad_nd_fast(data, 0.0, ndim)
        want = origin.padding._pad_nd(data, 0.0, ndim)
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))
        assert got[2] == want[2]


@pytest.mark.slow
def test_grouped_padding_fuzz():
    """Random sweep over (n, ndim, group, mode): round-trip must always hold
    and buckets must always cover the whole list."""
    rng = np.random.default_rng(11)
    pads = {1: ops.Padding1D, 2: ops.Padding2D, 3: ops.Padding3D}
    unpads = {1: ops.UnPadding1D, 2: ops.UnPadding2D, 3: ops.UnPadding3D}
    for trial in range(20):
        ndim = int(rng.integers(1, 4))
        n = int(rng.integers(4, 20))
        group = int(rng.integers(1, min(n, 6) + 1))
        mode = ["sample", "oracle"][trial % 2]
        data = _rand_list(rng, n, ndim, 2, 9)
        res = pads[ndim](data, group=group, group_mode=mode,
                         rng=np.random.default_rng(trial))
        if group == 1:
            xs, masks, shapes = [res[0]], [res[1]], [res[2]]
        else:
            xs, masks, shapes = res
        total = sum(x.shape[0] for x in xs)
        assert total == n, (trial, total, n)
        out = unpads[ndim](list(xs), list(shapes))
        got = sorted(tuple(np.asarray(t).ravel().tolist()) for t in out)
        want = sorted(tuple(np.asarray(t).ravel().tolist()) for t in data)
        assert got == want, trial


def test_padding_2d_3d_shapes():
    rng = np.random.default_rng(5)
    d2 = _rand_list(rng, 6, 2, 3, 8)
    x2, m2, s2 = ops.Padding2D(d2)
    assert x2.ndim == 3
    d3 = _rand_list(rng, 6, 3, 3, 6)
    x3, m3, s3 = ops.Padding3D(d3)
    assert x3.ndim == 4
    out3 = ops.UnPadding3D(x3, s3)
    for a, b in zip(d3, out3):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
