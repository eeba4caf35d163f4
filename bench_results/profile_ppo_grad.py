"""Decompose the ppo_grad bench stage (19.4us fused vs ~8us traffic floor).

Components at B=4096, N=128 (f32): the new-logits categorical head fwd,
head fwd+grad, full ppo_error fwd, full fwd+grad — to locate where the
time beyond HBM traffic goes (extra fusion passes vs loop overhead).
"""
import jax
import jax.numpy as jnp

from di_hpc_tpu.utils.profiling import bench_fn, roofline
from di_hpc_tpu import ops, origin
from di_hpc_tpu.ops.categorical import logp_entropy

B, N = 4096, 128
kp = jax.random.split(jax.random.PRNGKey(3), 7)
ln = jax.random.normal(kp[0], (B, N)); lo = jax.random.normal(kp[1], (B, N))
act = jax.random.randint(kp[2], (B,), 0, N)
vn = jax.random.normal(kp[3], (B,)); vo = jax.random.normal(kp[4], (B,))
adv = jax.random.normal(kp[5], (B,)); ret = jax.random.normal(kp[6], (B,))

MB = ln.size * 4 / 1e6


def p(name, t, mb):
    print(f"{name:<30} {t*1e6:8.2f} us   ({roofline(t, int(mb*1e6))})",
          flush=True)


# 1. head fwd only
p("head fwd", bench_fn(jax.jit(lambda x: logp_entropy(x, act)), ln), MB)

# 2. head fwd+grad (policy-gradient-shaped cotangents)
def head_loss(x):
    lp, ent = logp_entropy(x, act)
    return jnp.mean(lp * adv) - 0.01 * jnp.mean(ent)

p("head fwd+grad", bench_fn(jax.jit(jax.grad(head_loss)), ln), 3 * MB)

# 3. full ppo_error fwd
def ppo_fwd(x):
    (pol, vl, el), _ = ops.ppo_error(
        ops.ppo_data(x, lo, act, vn, vo, adv, ret, None), 0.2, True, None)
    return pol + 0.5 * vl - 0.01 * el

p("ppo_error fwd", bench_fn(jax.jit(ppo_fwd), ln), 2 * MB)

# 4. full fwd+grad (the bench stage's body)
def step(x):
    v, g = jax.value_and_grad(ppo_fwd)(x)
    return v * 1e-12 + jnp.sum(g) * 1e-12 + 1.0

p("ppo_error fwd+grad", bench_fn(jax.jit(step), ln), 4 * MB)

# 5. pure HBM reference: copy 2MB through a trivial kernel
p("memcpy 2MB (x+1)", bench_fn(jax.jit(lambda x: x + 1.0), ln), 2 * MB)
