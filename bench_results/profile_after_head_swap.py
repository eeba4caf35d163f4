"""Measure updated fused ops on the TPU after the categorical-head swap
(jnp custom-vjp head) and the whole-layer LSTM Pallas kernel."""
import jax
import jax.numpy as jnp

from di_hpc_tpu.utils.profiling import bench_fn, roofline
from di_hpc_tpu import ops, origin, network

T, B, N = 128, 512, 128
key = jax.random.PRNGKey(0)
k1, k2, k3, k4, k5 = jax.random.split(key, 5)
t_logits = jax.random.normal(k1, (T, B, N), jnp.float32)
b_logits = jax.random.normal(k2, (T, B, N), jnp.float32)
action = jax.random.randint(k3, (T, B), 0, N)
value = jax.random.normal(k4, (T + 1, B), jnp.float32)
reward = jax.random.normal(k5, (T, B), jnp.float32)
data = origin.vtrace_data(t_logits, b_logits, action, value, reward, None)


def report(name, sec, nbytes):
    r = roofline(sec, nbytes)
    print(f"{name:<38} {sec*1e6:9.1f} us   ({r.sol_fraction*100:5.1f}% SoL)",
          flush=True)


# sanity: fused == origin
got = ops.vtrace_error(data)
want = origin.vtrace_error(data)
for g, w in zip(got, want):
    assert abs(float(g) - float(w)) < 1e-3, (float(g), float(w))
print("vtrace parity ok", flush=True)

import sys
if "lstm_only" not in sys.argv:
    report("fused vtrace fwd", bench_fn(lambda d: ops.vtrace_error(d), data),
           2 * T * B * N * 4)


def fused_grad(d):
    def loss(tl):
        l = ops.vtrace_error(d._replace(target_output=tl))
        return l.policy_loss + l.value_loss + 0.01 * l.entropy_loss
    return jax.grad(loss)(d.target_output)


if "lstm_only" not in sys.argv:
    report("fused vtrace grad", bench_fn(fused_grad, data), 4 * T * B * N * 4)

# ---- LSTM bench config ----
S, Bl, I, H, L = 64, 3, 1792, 384, 3
kk = jax.random.split(jax.random.PRNGKey(7), 2)
params = origin.init_lstm_params(kk[0], I, H, L, "LN")
x = jax.random.normal(kk[1], (S, Bl, I))

# Parity must be judged under one matmul precision: the Pallas layer kernel
# always runs its h@Wh at f32 (HIGHEST), while XLA's default on TPU is bf16,
# and the 64-step recurrence compounds that difference chaotically.
with jax.default_matmul_precision("float32"):
    y1, _ = jax.jit(lambda xx: origin.lstm(params, xx, None, "LN"))(x)
    y2, _ = jax.jit(lambda xx: network.lstm_fused(params, xx, None, "LN"))(x)
assert float(jnp.abs(y1 - y2).max()) < 1e-2, float(jnp.abs(y1 - y2).max())
print("lstm parity ok", flush=True)

lstm_bytes = (S * Bl * I + S * Bl * H + I * 4 * H + (L - 1) * H * 4 * H * 2) * 4
report("lstm fused (pallas layer)",
       bench_fn(lambda xx: network.lstm_fused(params, xx, None, "LN")[0], x),
       lstm_bytes)


def lstm_grad(xx):
    def loss(p):
        y, _ = network.lstm_fused(p, xx, None, "LN")
        return jnp.sum(y ** 2)
    return jax.grad(loss)(params).bias


report("lstm fused grad", bench_fn(lstm_grad, x), 3 * lstm_bytes)

# ---- PPO grad (bench config) ----
Bp, Np = 4096, 128
ks = jax.random.split(jax.random.PRNGKey(3), 7)
pdata = origin.ppo_data(
    jax.random.normal(ks[0], (Bp, Np)), jax.random.normal(ks[1], (Bp, Np)),
    jax.random.randint(ks[2], (Bp,), 0, Np), jax.random.normal(ks[3], (Bp,)),
    jax.random.normal(ks[4], (Bp,)), jax.random.normal(ks[5], (Bp,)),
    jax.random.normal(ks[6], (Bp,)), None)


def ppo_grad(d):
    def loss(ln):
        l, _ = ops.ppo_error(d._replace(logit_new=ln))
        return l.policy_loss + l.value_loss + 0.01 * l.entropy_loss
    return jax.grad(loss)(d.logit_new)


report("ppo grad", bench_fn(ppo_grad, pdata), 3 * Bp * Np * 4)
print("done", flush=True)
