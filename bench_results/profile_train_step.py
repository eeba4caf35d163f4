"""Decompose the fused train-step time (bench stage train_step_T32_B256_h512:
2896us fused vs 6090us naive) into LSTM fwd/bwd, vtrace, head GEMMs, adam."""
import jax
import jax.numpy as jnp
import optax

from di_hpc_tpu.utils.profiling import bench_fn
from di_hpc_tpu import network, ops, origin
from di_hpc_tpu.models import ActorCriticConfig, TrainBatch, init_actor_critic

cfg = ActorCriticConfig(obs_dim=256, hidden_size=512, num_layers=2,
                        action_dim=64)
kt = jax.random.split(jax.random.PRNGKey(4), 5)
T, B = 32, 256
params = init_actor_critic(kt[0], cfg)
obs = jax.random.normal(kt[1], (T + 1, B, cfg.obs_dim))
actions = jax.random.randint(kt[2], (T, B), 0, cfg.action_dim)
rewards = jax.random.normal(kt[3], (T, B))
b_logits = jax.random.normal(kt[4], (T, B, cfg.action_dim))


def p(name, t):
    print(f"{name:<34} {t*1e6:9.1f} us", flush=True)


# LSTM alone (fused kernel path), fwd and fwd+grad
x_emb = jax.nn.relu(jnp.einsum("sbo,oh->sbh", obs, params.embed_w) + params.embed_b)
p("lstm fwd", bench_fn(
    lambda xx: network.lstm_fused(params.lstm, xx, None, cfg.norm_type)[0], x_emb))


def lstm_loss(pl_, xx):
    y, _ = network.lstm_fused(pl_, xx, None, cfg.norm_type)
    return jnp.sum(y ** 2)


p("lstm fwd+grad(params,x)", bench_fn(
    lambda xx: jax.grad(lstm_loss, argnums=(0, 1))(params.lstm, xx)[1], x_emb))

# vtrace grad alone at this shape
key = jax.random.PRNGKey(9)
t_logits = jax.random.normal(key, (T, B, cfg.action_dim))
value = jax.random.normal(key, (T + 1, B))
vdata = origin.vtrace_data(t_logits, b_logits, actions, value, rewards, None)


def vloss(tl, v):
    l = ops.vtrace_error(vdata._replace(target_output=tl, value=v))
    return l.policy_loss + 0.5 * l.value_loss - 0.01 * l.entropy_loss


p("vtrace grad(logits,value)", bench_fn(
    lambda tl: jax.grad(vloss, argnums=(0, 1))(tl, value)[0], t_logits))

# embed + heads GEMMs fwd+grad
def head_loss(pw, y):
    logits = jnp.einsum("sbh,ha->sba", y, pw)
    return jnp.sum(logits ** 2)


y_fake = jax.random.normal(key, (T + 1, B, cfg.hidden_size))
p("policy head grad", bench_fn(
    lambda y: jax.grad(head_loss, argnums=(0, 1))(params.policy_w, y)[1], y_fake))

# adam update alone
optimizer = optax.adam(1e-3)
opt0 = optimizer.init(params)
fake_grads = jax.tree.map(jnp.ones_like, params)


@jax.jit
def adam_step(g):
    upd, _ = optimizer.update(g, opt0, params)
    return jnp.sum(upd.embed_b)


p("adam update", bench_fn(adam_step, fake_grads))
print("done", flush=True)
