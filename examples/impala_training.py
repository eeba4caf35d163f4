"""End-to-end IMPALA-style training example on synthetic trajectories.

Exercises the full stack: LN-LSTM actor-critic forward, fused V-trace loss,
optax update, and (if more than one device is visible) data-parallel batch
sharding over a mesh.  Run:

    python examples/impala_training.py            # real backend
    JAX_PLATFORMS=cpu python examples/impala_training.py
"""

import jax
import jax.numpy as jnp
import optax

from di_hpc_tpu.models import (
    ActorCriticConfig, TrainBatch, init_actor_critic, make_train_step,
)
from di_hpc_tpu.parallel import make_mesh, shard_batch_pytree


def synthetic_batch(key, T, B, obs_dim, actions):
    ks = jax.random.split(key, 4)
    return TrainBatch(
        obs=jax.random.normal(ks[0], (T + 1, B, obs_dim)),
        actions=jax.random.randint(ks[1], (T, B), 0, actions),
        rewards=jax.random.normal(ks[2], (T, B)) * 0.1,
        behaviour_logits=jax.random.normal(ks[3], (T, B, actions)) * 0.5,
    )


def main(steps: int = 20, T: int = 32, B: int = 64, bf16: bool = False):
    cfg = ActorCriticConfig(obs_dim=64, hidden_size=128, num_layers=2,
                            action_dim=16)
    key = jax.random.PRNGKey(0)
    params = init_actor_critic(key, cfg)
    optimizer = optax.adam(3e-4)
    opt_state = optimizer.init(params)
    # bf16: mixed precision (bf16 model compute incl. the LSTM kernel's
    # native bf16 path; f32 master params, loss, and optimizer).
    # donate params/opt_state: the step returns their replacements, so XLA
    # updates them in place (halves peak param-side memory at scale).
    step = jax.jit(make_train_step(
        cfg, optimizer, compute_dtype=jnp.bfloat16 if bf16 else None),
        donate_argnums=(0, 1))

    n_dev = len(jax.devices())
    mesh = make_mesh() if n_dev > 1 else None
    if mesh is not None:
        print(f"data-parallel over {n_dev} devices")

    for i in range(steps):
        key, sub = jax.random.split(key)
        batch = synthetic_batch(sub, T, B, cfg.obs_dim, cfg.action_dim)
        if mesh is not None:
            batch = shard_batch_pytree(mesh, batch, TrainBatch(1, 1, 1, 1))
        params, opt_state, metrics = step(params, opt_state, batch)
        if i % 5 == 0 or i == steps - 1:
            print(f"step {i:3d}  total={float(metrics['total_loss']):+.4f}  "
                  f"policy={float(metrics['policy_loss']):+.4f}  "
                  f"value={float(metrics['value_loss']):.4f}  "
                  f"entropy={float(metrics['entropy']):.4f}")


if __name__ == "__main__":
    import sys
    main(bf16="--bf16" in sys.argv)
