"""Full IMPALA actor-learner loop on a synthetic environment.

Exercises the complete framework surface end to end:
 - actor thread: `models.actor_step` (donated LSTM state, categorical
   sampling) rolls out a toy linear-dynamics environment ON THE HOST CPU
   device and pushes trajectories into `data.TrajectoryBuffer`;
 - learner: pops FIFO batches (time-major, one device transfer, optionally
   mesh-sharded) and applies the fused V-trace training step on the
   accelerator, publishing host param copies for the actor each step —
   the standard IMPALA actor/learner device split (only the learner thread
   ever touches the accelerator; a tunneled TPU client is not thread-safe).

Run: `python examples/impala_actor_learner.py`
     (JAX_PLATFORMS=cpu also works; uses all visible devices for data
      parallelism.)
"""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import optax

from di_hpc_tpu.data import TrajectoryBuffer
from di_hpc_tpu.models import (
    ActorCriticConfig, TrainBatch, actor_step, init_actor_critic,
    make_train_step,
)
from di_hpc_tpu.parallel import make_mesh, shard_batch_pytree


class ToyEnv:
    """Vectorized linear-dynamics env: reward peaks when the action matches
    a hidden projection of the state."""

    def __init__(self, batch: int, obs_dim: int, n_actions: int, seed: int = 0):
        rng = np.random.default_rng(seed)
        self.w = rng.standard_normal((obs_dim,)).astype(np.float32)
        self.a_mix = rng.standard_normal((obs_dim, obs_dim)).astype(np.float32) * 0.1
        self.n_actions = n_actions
        self.batch = batch
        self.obs_dim = obs_dim
        self.state = rng.standard_normal((batch, obs_dim)).astype(np.float32)
        self.rng = rng

    def step(self, actions: np.ndarray):
        target = (self.state @ self.w > 0).astype(np.int32) * (self.n_actions - 1)
        reward = (actions == target).astype(np.float32) - 0.1
        noise = self.rng.standard_normal(self.state.shape).astype(np.float32) * 0.3
        self.state = np.tanh(self.state @ self.a_mix + noise)
        return self.state.copy(), reward


def run(steps: int = 30, T: int = 16, env_batch: int = 32, learn_batch: int = 32):
    cfg = ActorCriticConfig(obs_dim=16, hidden_size=64, num_layers=1, action_dim=4)
    key = jax.random.PRNGKey(0)
    params = init_actor_critic(key, cfg)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    train = jax.jit(make_train_step(cfg, optimizer, entropy_coef=0.02),
                    donate_argnums=(0, 1))

    buf = TrajectoryBuffer(capacity=256)
    n_dev = len(jax.devices())
    mesh = make_mesh() if n_dev > 1 and learn_batch % n_dev == 0 else None
    stop = threading.Event()
    actor_exc = []

    # Actors run inference on the HOST CPU device, the learner on the
    # accelerator — the standard IMPALA split (and the accelerator client is
    # not assumed thread-safe: concurrent two-thread access to a tunneled
    # TPU fails).  Params are synced actor-side once per rollout — exactly
    # the off-policy staleness V-trace's importance weights correct for.
    cpu = jax.devices("cpu")[0]

    def zero_state():
        # actor_step DONATES the state, so every call site needs a fresh one.
        # np.zeros, not jnp.zeros: the latter would materialize on the
        # default (accelerator) device first — not actor-thread-safe.
        z = np.zeros((cfg.num_layers, env_batch, cfg.hidden_size), np.float32)
        return jax.device_put((z, z), cpu)

    # Only the learner thread touches the accelerator; it publishes host
    # copies of the params here for the actor to pick up.
    shared = {"params": jax.device_get(params)}

    # Compile the actor step BEFORE starting the threads so the first
    # learner sample_batch timeout is not spent inside a compile.
    actor_step(jax.device_put(shared["params"], cpu),
               jax.device_put(np.zeros((env_batch, cfg.obs_dim), np.float32),
                              cpu),
               zero_state(), jax.device_put(jax.random.PRNGKey(0), cpu),
               cfg.norm_type)

    actor_rng0 = jax.device_put(jax.random.PRNGKey(1), cpu)  # main thread

    def actor_loop():
        env = ToyEnv(env_batch, cfg.obs_dim, cfg.action_dim)
        rng = actor_rng0
        state = zero_state()
        obs = env.state.copy()
        while not stop.is_set():
            # Per-rollout param sync (host-to-host; the learner published it).
            p_host = jax.device_put(shared["params"], cpu)
            obs_seq, act_seq, rew_seq, logit_seq = [obs], [], [], []
            for _ in range(T):
                if stop.is_set():
                    return
                rng, sub = jax.random.split(rng)
                # device_put straight from numpy: jnp.asarray would first
                # materialize on the default (accelerator) device.
                a, logits, _v, state = actor_step(
                    p_host, jax.device_put(obs, cpu), state,
                    sub, cfg.norm_type)
                a_np = np.asarray(a)
                obs, r = env.step(a_np)
                obs_seq.append(obs)
                act_seq.append(a_np)
                rew_seq.append(r)
                logit_seq.append(np.asarray(logits))
            for b in range(env_batch):
                buf.add({
                    "obs": np.stack([o[b] for o in obs_seq]),        # (T+1, obs)
                    "action": np.stack([a[b] for a in act_seq]),     # (T,)
                    "reward": np.stack([r[b] for r in rew_seq]),     # (T,)
                    "behaviour_logits": np.stack([l[b] for l in logit_seq]),
                })

    def actor_main():
        try:
            actor_loop()
        except Exception as e:  # surfaced by the learner on its next sample
            actor_exc.append(e)

    actor = threading.Thread(target=actor_main, daemon=True)
    actor.start()

    try:
        for i in range(steps):
            try:
                batch = buf.sample_batch(learn_batch, mesh=mesh, timeout=60.0)
            except TimeoutError:
                if actor_exc:
                    raise RuntimeError("actor thread died") from actor_exc[0]
                raise
            tb = TrainBatch(
                obs=batch["obs"],
                actions=batch["action"],
                rewards=batch["reward"],
                behaviour_logits=batch["behaviour_logits"],
            )
            if mesh is not None:
                tb = shard_batch_pytree(mesh, tb, TrainBatch(1, 1, 1, 1))
            params_new, opt_state, metrics = train(params, opt_state, tb)
            params = params_new
            shared["params"] = jax.device_get(params)   # publish for actors
            if i % 5 == 0 or i == steps - 1:
                print(f"step {i:3d}  total={float(metrics['total_loss']):+.4f}  "
                      f"entropy={float(metrics['entropy']):.3f}  "
                      f"buffer={len(buf)}")
    finally:
        stop.set()
        actor.join(timeout=30)  # let in-flight jax calls finish before exit
    return params


if __name__ == "__main__":
    run()
