"""utils: checkpoint round-trip, roofline math, native build fallback."""

import jax
import jax.numpy as jnp
import numpy as np

from di_hpc_tpu import origin, utils
from di_hpc_tpu.utils.native import get_native_lib, native_oracle_split_group


def test_checkpoint_roundtrip(tmp_path, key):
    params = origin.init_lstm_params(key, 6, 4, 2, "LN")
    path = tmp_path / "params.npz"
    utils.save_pytree(path, params)
    fresh = origin.init_lstm_params(jax.random.split(key)[0], 6, 4, 2, "LN")
    loaded = utils.load_pytree(path, fresh)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_structure_mismatch(tmp_path, key):
    import pytest
    params = origin.init_lstm_params(key, 6, 4, 2, "LN")
    path = tmp_path / "p.npz"
    utils.save_pytree(path, params)
    other = origin.init_lstm_params(key, 6, 4, 3, "LN")
    with pytest.raises(AssertionError):
        utils.load_pytree(path, other)


def test_roofline():
    r = utils.roofline(seconds=100e-6, bytes_accessed=50 * 1024 * 1024, chip="v5e")
    assert 0 < r.sol_fraction < 1
    assert "GB/s" in str(r)


def test_bench_fn_measures_positive_time(key):
    x = jax.random.normal(key, (64, 64))
    t = utils.bench_fn(lambda a: a @ a, x, k1=2, k2=12, reps=2)
    assert t > 0


def test_runtime_initialize_noop():
    from di_hpc_tpu.parallel import initialize
    initialize(num_processes=1)  # single-process: must be a no-op


def test_native_lib_builds_and_matches():
    """C++ bucketing DP builds with g++ and agrees with the Python DP."""
    lib = get_native_lib()
    if lib is None:
        import pytest
        pytest.skip("native toolchain unavailable")
    numels = sorted([12, 40, 41, 100, 7, 90, 13, 55])
    res = native_oracle_split_group(numels, 3)
    assert res is not None
    positions, cost = res
    assert positions[0] == 0 and positions[-1] == len(numels)

    class Fake:
        def __init__(self, n):
            self.shape = (n,)

    from di_hpc_tpu.origin.padding import oracle_split_group as py_dp
    _, py_pos = py_dp([Fake(n) for n in numels], 3)

    def cost_of(pos):
        return sum(numels[pos[i + 1] - 1] * (pos[i + 1] - pos[i])
                   for i in range(len(pos) - 1))

    assert cost_of(positions) == cost_of(py_pos) == cost
