"""Trajectory buffer / data plane."""

import threading

import jax
import numpy as np
import pytest

from di_hpc_tpu.data import TrajectoryBuffer, stack_trajectories
from di_hpc_tpu.parallel import make_mesh


def _traj(rng, T=8, obs=4):
    return {
        "obs": rng.standard_normal((T, obs)).astype(np.float32),
        "action": rng.integers(0, 5, size=(T,)).astype(np.int32),
        "reward": rng.standard_normal((T,)).astype(np.float32),
    }


def test_stack_time_major():
    rng = np.random.default_rng(0)
    trajs = [_traj(rng) for _ in range(3)]
    out = stack_trajectories(trajs)
    assert out["obs"].shape == (8, 3, 4)
    assert out["reward"].shape == (8, 3)
    np.testing.assert_array_equal(out["obs"][:, 1], trajs[1]["obs"])


def test_fifo_pop_order():
    rng = np.random.default_rng(1)
    buf = TrajectoryBuffer(capacity=16)
    trajs = [_traj(rng) for _ in range(6)]
    for t in trajs:
        buf.add(t)
    batch = buf.sample_batch(4)
    assert len(buf) == 2
    np.testing.assert_allclose(np.asarray(batch["obs"][:, 0]), trajs[0]["obs"])
    np.testing.assert_allclose(np.asarray(batch["obs"][:, 3]), trajs[3]["obs"])


def test_replay_sampling_keeps_buffer():
    rng = np.random.default_rng(2)
    buf = TrajectoryBuffer(capacity=8)
    for _ in range(5):
        buf.add(_traj(rng))
    batch = buf.sample_batch(10, pop=False, rng=np.random.default_rng(3))
    assert batch["obs"].shape[1] == 10
    assert len(buf) == 5


def test_timeout():
    buf = TrajectoryBuffer(capacity=4)
    with pytest.raises(TimeoutError):
        buf.sample_batch(2, timeout=0.05)


def test_capacity_evicts_oldest():
    rng = np.random.default_rng(4)
    buf = TrajectoryBuffer(capacity=3)
    trajs = [_traj(rng) for _ in range(5)]
    for t in trajs:
        buf.add(t)
    assert len(buf) == 3
    batch = buf.sample_batch(1)
    np.testing.assert_allclose(np.asarray(batch["obs"][:, 0]), trajs[2]["obs"])


def test_collector_thread_feeds_learner():
    rng = np.random.default_rng(5)
    buf = TrajectoryBuffer(capacity=32)

    def collect():
        for _ in range(8):
            buf.add(_traj(rng))

    t = threading.Thread(target=collect)
    t.start()
    batch = buf.sample_batch(8, timeout=5.0)
    t.join()
    assert batch["obs"].shape == (8, 8, 4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_batch():
    rng = np.random.default_rng(6)
    mesh = make_mesh({"data": 8})
    buf = TrajectoryBuffer(capacity=32)
    for _ in range(16):
        buf.add(_traj(rng))
    batch = buf.sample_batch(16, mesh=mesh)
    sh = batch["obs"].sharding
    assert sh.spec[1] == "data"
    # global content identical to an unsharded stack
    assert batch["obs"].shape == (8, 16, 4)


def test_stack_ragged_pads_and_masks():
    """Ragged fields route through the padding subsystem with a mask."""
    trajs = [
        {"reward": np.arange(3, dtype=np.float32),
         "action": np.arange(3, dtype=np.int32),
         "obs": np.ones((4, 2), np.float32)},
        {"reward": np.arange(5, dtype=np.float32),
         "action": np.arange(5, dtype=np.int32),
         "obs": np.ones((6, 2), np.float32) * 2},
    ]
    out = stack_trajectories(trajs, time_major=True)
    assert out["reward"].shape == (5, 2)
    assert out["reward_mask"].shape == (5, 2)
    assert out["reward_mask"].dtype == np.bool_
    np.testing.assert_array_equal(out["reward_mask"][:, 0],
                                  [True] * 3 + [False] * 2)
    np.testing.assert_array_equal(out["reward"][:, 0], [0, 1, 2, 0, 0])
    np.testing.assert_array_equal(out["reward"][:, 1], np.arange(5))
    # int (non-f32) fields take the oracle fallback, same semantics
    assert out["action"].shape == (5, 2)
    np.testing.assert_array_equal(out["action"][:, 0], [0, 1, 2, 0, 0])
    # 2-D ragged field
    assert out["obs"].shape == (6, 2, 2)
    assert out["obs_mask"][:, 0].sum() == 4 * 2


def test_stack_ragged_rank_mismatch_raises():
    trajs = [{"x": np.zeros((3,), np.float32)},
             {"x": np.zeros((3, 2), np.float32)}]
    with pytest.raises(ValueError, match="ragged field 'x'"):
        stack_trajectories(trajs)
