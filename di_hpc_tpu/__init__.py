"""di_hpc_tpu — TPU-native RL acceleration operator framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the DI-hpc
reference (GPU/CUDA operator library for RL training: GAE, TD family,
PPO/V-trace/UPGO losses, LN-LSTM, padding, scatter, AlphaStar policy-head
helpers), built for TPU:

 - `di_hpc_tpu.origin`   — pure-jnp oracles (ground truth / naive baselines)
 - `di_hpc_tpu.ops`      — fused ops: associative-scan recurrences, Pallas
                           single-pass linear-scan kernel, jit-fused losses
 - `di_hpc_tpu.network`  — fused LayerNorm-LSTM, scatter connection
 - `di_hpc_tpu.models`   — actor-critic helpers + reference models
 - `di_hpc_tpu.parallel` — device-mesh sharding: batch-sharded losses over
                           ICI collectives, time-sharded distributed scans
 - `di_hpc_tpu.utils`    — constants, native C++ host core
"""

__version__ = "0.1.0"

from di_hpc_tpu import data, origin, ops, network, models, parallel, utils  # noqa: F401
