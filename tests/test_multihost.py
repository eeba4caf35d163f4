"""True multi-process (multi-"host") test via jax.distributed on CPU.

Two processes, each owning 2 virtual devices, form one global 4-device mesh;
each contributes its process-local batch shard and computes the
batch-sharded V-trace loss.  Both must produce exactly the single-process
result — validating parallel.runtime.initialize +
global_batch_from_host_local + the GSPMD global-mean contract across process
boundaries (SURVEY.md §4: "multi-node without a real cluster", which the
reference never tests).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

from di_hpc_tpu.parallel import initialize, global_batch_from_host_local
initialize(f"localhost:{port}", num_processes=n, process_id=pid)

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from di_hpc_tpu import ops

T, B_local, N = 6, 4, 5
n_dev = n * 2
mesh = jax.make_mesh((n_dev,), ("data",))

rng = np.random.default_rng(0)  # same global batch on every process
glob = {
    "to": rng.standard_normal((T, n * B_local, N)).astype(np.float32),
    "bo": rng.standard_normal((T, n * B_local, N)).astype(np.float32),
    "act": rng.integers(0, N, size=(T, n * B_local)).astype(np.int32),
    "value": rng.standard_normal((T + 1, n * B_local)).astype(np.float32),
    "reward": rng.standard_normal((T, n * B_local)).astype(np.float32),
}
sl = slice(pid * B_local, (pid + 1) * B_local)

def put(x, bdim):
    spec = [None] * x.ndim
    spec[bdim] = "data"
    local = np.take(x, range(sl.start, sl.stop), axis=bdim)
    return global_batch_from_host_local(mesh, P(*spec), local)

data = ops.vtrace_data(
    put(glob["to"], 1), put(glob["bo"], 1), put(glob["act"], 1),
    put(glob["value"], 1), put(glob["reward"], 1), None,
)
losses = ops.vtrace_error(data)
print("RESULT", pid, float(losses.policy_loss), float(losses.value_loss),
      float(losses.entropy_loss), flush=True)
"""


@pytest.mark.skipif(sys.platform != "linux", reason="gloo/linux only")
@pytest.mark.parametrize("n_proc,port", [(2, "12401"), (4, "12403")])
@pytest.mark.slow
def test_multi_process_data_parallel_vtrace(tmp_path, n_proc, port):
    """2 procs x 2 devices and 4 procs x 2 devices (8-device global mesh):
    every process must reproduce the single-process global-batch result."""
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    here = os.path.dirname(os.path.abspath(__file__))
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(n_proc), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=os.path.dirname(here),
            env={**os.environ, "JAX_PLATFORMS": "cpu",
                 "PYTHONPATH": os.path.dirname(here) + os.pathsep
                 + os.environ.get("PYTHONPATH", "")},
        )
        for i in range(n_proc)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        assert p.returncode == 0, out
        outs.append(out)

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, pg, vl, el = line.split()
                results[int(pid)] = (float(pg), float(vl), float(el))
    assert set(results) == set(range(n_proc)), outs
    for pid in range(1, n_proc):
        np.testing.assert_allclose(results[0], results[pid], rtol=1e-6)

    # single-process reference on the same global batch
    import jax
    import jax.numpy as jnp
    from di_hpc_tpu import ops as _ops
    rng = np.random.default_rng(0)
    T, Bl, N = 6, 4, 5
    B = n_proc * Bl
    to = rng.standard_normal((T, B, N)).astype(np.float32)
    bo = rng.standard_normal((T, B, N)).astype(np.float32)
    act = rng.integers(0, N, size=(T, B)).astype(np.int32)
    value = rng.standard_normal((T + 1, B)).astype(np.float32)
    reward = rng.standard_normal((T, B)).astype(np.float32)
    ref = _ops.vtrace_error(_ops.vtrace_data(
        jnp.asarray(to), jnp.asarray(bo), jnp.asarray(act),
        jnp.asarray(value), jnp.asarray(reward), None))
    # rtol 1e-4: the workers are pinned to CPU while this in-process
    # reference runs on whatever backend the suite uses — under
    # DIHPC_TEST_TPU=1 that is a CROSS-BACKEND comparison and TPU
    # transcendentals differ from CPU at the ~1e-5 level (observed 1.7e-5
    # at n=2, 5.6e-5 at n=4, growing with batch).  The worker-vs-worker
    # check above stays at 1e-6 (same backend).
    np.testing.assert_allclose(
        results[0], [float(x) for x in ref], rtol=1e-4)
