"""Checkpoint / resume for op and model parameters.

The reference's only checkpointing is a torch.save debug round-trip used to
move LSTM params between implementations for validation
(hpc_rll/origin/rnn.py:169-179, torch_utils/network/rnn.py:144-151).  Here
every parameter set is a pytree, so checkpointing is generic: save/load any
pytree (LSTMParams, ActorCriticParams, optimizer state) to a single .npz.

Orbax remains the right tool for sharded multi-host checkpoints of large
models; this module covers the library-level single-host contract with zero
setup.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np

__all__ = ["save_pytree", "load_pytree"]


def _norm(path: str | Path) -> str:
    """np.savez appends '.npz' to suffix-less paths; normalize both ends of
    the round-trip so save/load agree on the on-disk name."""
    p = str(path)
    return p if p.endswith(".npz") else p + ".npz"


def save_pytree(path: str | Path, tree) -> None:
    """Save a pytree of arrays to one .npz (+ structure sidecar in-archive)."""
    path = _norm(path)
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        json.dumps(str(treedef)).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_pytree(path: str | Path, like):
    """Load arrays saved by save_pytree into the structure of `like`
    (a pytree with the same topology, e.g. a freshly initialized params)."""
    with np.load(_norm(path), allow_pickle=False) as data:
        n = sum(1 for k in data.files if k.startswith("leaf_"))
        leaves = [jax.numpy.asarray(data[f"leaf_{i}"]) for i in range(n)]
    like_leaves, treedef = jax.tree.flatten(like)
    assert len(like_leaves) == len(leaves), (
        f"checkpoint has {len(leaves)} leaves, structure expects {len(like_leaves)}")
    for got, want in zip(leaves, like_leaves):
        assert got.shape == want.shape, (got.shape, want.shape)
    return jax.tree.unflatten(treedef, leaves)
