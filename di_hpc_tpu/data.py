"""Host-side trajectory data plane for the actor-learner loop.

The reference library's only data-plane component is ragged-batch padding
(§2.1); in a production actor-learner deployment (the BASELINE.json north
star: "sharded actor-learner batch dim over a multi-host TPU mesh") the
library also needs the host loop that feeds it.  This module provides:

 - `TrajectoryBuffer`: a bounded FIFO of per-trajectory field dicts
   (numpy, host memory), thread-safe for a collector thread + learner thread;
 - `sample_batch`: assemble (T, B) time-major device batches from fixed-length
   trajectories, optionally sharded over a mesh batch axis in one transfer;
 - ragged fields are routed through the padding subsystem (native C++ pack
   when available).

All device transfer happens once per batch (no per-trajectory H2D), the
TPU-native replacement for the reference's per-call cudaMalloc/cudaMemcpy
pointer tables (src/rl_utils/padding.cu:111-140).
"""

from __future__ import annotations

import collections
import threading
from typing import Dict, Optional, Sequence

import jax
import numpy as np

from di_hpc_tpu.parallel.mesh import DATA_AXIS, batch_sharding

__all__ = ["TrajectoryBuffer", "stack_trajectories"]


def _host_pad_nd(arrs):
    """Zero-pad a ragged list of same-rank numpy arrays to the per-dim max.

    Host-only (returns numpy): f32 inputs use the C++ ragged pack
    (csrc/bucketing.cpp, one memcpy per contiguous row); everything else is a
    per-array numpy slice-assign.  Returns (padded (B, ...), bool mask).
    """
    from di_hpc_tpu.utils.native import native_pack_padded_f32

    max_shape = [max(dims) for dims in zip(*(a.shape for a in arrs))]
    if all(a.dtype == np.float32 for a in arrs):
        res = native_pack_padded_f32(
            [np.ascontiguousarray(a) for a in arrs], max_shape, 0.0)
        if res is not None:
            out, m = res
            return out, m != 0
    out = np.zeros((len(arrs), *max_shape), dtype=arrs[0].dtype)
    mask = np.zeros((len(arrs), *max_shape), dtype=bool)
    for i, a in enumerate(arrs):
        sl = (i,) + tuple(slice(0, d) for d in a.shape)
        out[sl] = a
        mask[sl] = True
    return out, mask


def stack_trajectories(trajs: Sequence[Dict[str, np.ndarray]],
                       time_major: bool = True) -> Dict[str, np.ndarray]:
    """Stack trajectory dicts into batched arrays.

    Each trajectory maps field -> (T, ...) array; output maps field ->
    (T, B, ...) (time-major, the layout every loss op expects) or (B, T, ...).

    RAGGED fields (per-trajectory shapes differ) are zero-padded to the
    per-dimension max (native C++ pack for f32, numpy otherwise) and an extra
    boolean ``<field>_mask`` entry of the same layout marks the real
    elements — feed it as the op's `weight` to keep padded steps out of the
    losses.

    This function is pure host code by contract: it runs on collector/learner
    data threads, and the tunneled TPU client is not thread-safe — no jax
    device op may happen here (padding therefore does NOT route through
    ops.padding, whose outputs materialize on the default device).
    """
    out = {}
    for k in trajs[0]:
        arrs = [np.asarray(t[k]) for t in trajs]
        if len({a.shape for a in arrs}) == 1:
            stacked = np.stack(arrs, axis=0)                  # (B, T, ...)
            mask = None
        else:
            nd = arrs[0].ndim
            if not (1 <= nd <= 3 and all(a.ndim == nd for a in arrs)):
                raise ValueError(
                    f"stack_trajectories: ragged field {k!r} must be 1-3D "
                    f"with a consistent rank; got "
                    f"{sorted({a.ndim for a in arrs})}-D")
            if k + "_mask" in trajs[0]:
                raise ValueError(
                    f"stack_trajectories: ragged field {k!r} needs the key "
                    f"{k + '_mask'!r} for its padding mask, but the "
                    f"trajectories already contain a field by that name")
            stacked, mask = _host_pad_nd(arrs)
        if time_major:
            stacked = np.swapaxes(stacked, 0, 1)
            if mask is not None:
                mask = np.swapaxes(mask, 0, 1)
        out[k] = np.ascontiguousarray(stacked)
        if mask is not None:
            out[k + "_mask"] = np.ascontiguousarray(mask)
    return out


class TrajectoryBuffer:
    """Bounded FIFO of trajectories with batched device sampling."""

    def __init__(self, capacity: int):
        assert capacity > 0
        self._dq: collections.deque = collections.deque(maxlen=capacity)
        self._lock = threading.Lock()
        self._not_empty = threading.Condition(self._lock)

    def __len__(self):
        with self._lock:
            return len(self._dq)

    def add(self, trajectory: Dict[str, np.ndarray]) -> None:
        """Collector side: push one trajectory (field -> (T, ...) array)."""
        with self._not_empty:
            self._dq.append(trajectory)
            self._not_empty.notify()

    def sample_batch(
        self,
        batch_size: int,
        mesh=None,
        axis: str = DATA_AXIS,
        rng: Optional[np.random.Generator] = None,
        pop: bool = True,
        timeout: Optional[float] = None,
    ):
        """Learner side: assemble a (T, B, ...) device batch.

        FIFO order when `pop` (on-policy, IMPALA-style); uniform sampling with
        replacement otherwise (replay-style).  When `mesh` is given, each
        field is placed with its batch dim (axis 1, time-major) sharded over
        `axis` — a single host->device transfer per field.
        """
        with self._not_empty:
            if pop:
                ok = self._not_empty.wait_for(
                    lambda: len(self._dq) >= batch_size, timeout=timeout)
                if not ok:
                    raise TimeoutError(
                        f"only {len(self._dq)}/{batch_size} trajectories available")
                trajs = [self._dq.popleft() for _ in range(batch_size)]
            else:
                assert len(self._dq) > 0, "buffer empty"
                rng = rng or np.random.default_rng()
                idx = rng.integers(0, len(self._dq), size=batch_size)
                trajs = [self._dq[int(i)] for i in idx]

        host = stack_trajectories(trajs, time_major=True)
        out = {}
        for k, v in host.items():
            if mesh is not None:
                sh = batch_sharding(mesh, batch_dim=1, ndim=v.ndim, axis=axis)
                out[k] = jax.device_put(v, sh)
            else:
                out[k] = jax.numpy.asarray(v)
        return out
