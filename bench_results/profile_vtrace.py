"""Decompose vtrace-grad time on the real TPU (diagnostic, not part of bench).

Times each sub-component of the fused vtrace training path at the bench shape
(T=128, B=512, N=128) to locate the bottleneck keeping vtrace_grad at ~1.1x.
"""
import sys
import jax
import jax.numpy as jnp

from di_hpc_tpu.utils.profiling import bench_fn, roofline
from di_hpc_tpu import ops, origin
from di_hpc_tpu.origin.ppo import categorical_log_prob, categorical_entropy

T, B, N = 128, 512, 128
key = jax.random.PRNGKey(0)
k1, k2, k3, k4, k5 = jax.random.split(key, 5)
t_logits = jax.random.normal(k1, (T, B, N), jnp.float32)
b_logits = jax.random.normal(k2, (T, B, N), jnp.float32)
action = jax.random.randint(k3, (T, B), 0, N)
value = jax.random.normal(k4, (T + 1, B), jnp.float32)
reward = jax.random.normal(k5, (T, B), jnp.float32)

MB = T * B * N * 4 / 1e6  # one logits array in MB


def report(name, sec, nbytes):
    r = roofline(sec, nbytes)
    print(f"{name:<38} {sec*1e6:9.1f} us   {r.achieved_gbps/1e9:6.0f} GB/s "
          f"({r.sol_fraction*100:5.1f}% SoL, floor {r.sol_seconds*1e6:7.1f} us)",
          flush=True)


which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "head"):
    # (the retired Pallas head measured 208us fwd / 550us fwd+bwd here —
    # see bench_results/profile_cat_variants.py for the record)
    from di_hpc_tpu.ops.categorical import logp_entropy as _head
    report("fused logp_entropy fwd",
           bench_fn(lambda x: _head(x, action), t_logits), T * B * N * 4)

    def _g(x):
        lp, ent = _head(x, action)
        return jnp.sum(lp) + 0.01 * jnp.sum(ent)
    report("fused logp_entropy grad", bench_fn(jax.grad(_g), t_logits),
           3 * T * B * N * 4)

    # 3. XLA head forward only
    fx = lambda x: (categorical_log_prob(x, action), categorical_entropy(x))
    report("xla logp_entropy fwd", bench_fn(fx, t_logits), T * B * N * 4)

    def gxf(x):
        lp = categorical_log_prob(x, action)
        ent = categorical_entropy(x)
        return jnp.sum(lp) + 0.01 * jnp.sum(ent)
    report("xla logp_entropy grad", bench_fn(jax.grad(gxf), t_logits),
           3 * T * B * N * 4)

if which in ("all", "vtrace"):
    data = origin.vtrace_data(t_logits, b_logits, action, value, reward, None)

    def fused_step(d):
        return ops.vtrace_error(d)
    report("fused vtrace fwd", bench_fn(fused_step, data), 2 * T * B * N * 4)

    def fused_grad(d):
        def loss(dd):
            l = ops.vtrace_error(dd)
            return l.policy_loss + l.value_loss + 0.01 * l.entropy_loss
        return jax.grad(lambda tl: loss(d._replace(target_output=tl)))(
            d.target_output)
    report("fused vtrace grad", bench_fn(fused_grad, data), 4 * T * B * N * 4)

    def naive_grad(d):
        def loss(dd):
            l = origin.vtrace_error(dd)
            return l.policy_loss + l.value_loss + 0.01 * l.entropy_loss
        return jax.grad(lambda tl: loss(d._replace(target_output=tl)))(
            d.target_output)
    report("naive vtrace grad", bench_fn(naive_grad, data), 4 * T * B * N * 4)

print("done", flush=True)
