"""r5 (VERDICT ask #5): give UPGO the td_lambda treatment — decompose the
bench stage (T=128, B=512, N=128; r4 driver: fused ~66us, 61.9% SoL against
the 33.5MB one-logits-read floor) and adjudicate or close the residual.

Legs: raw logits read (the achievable bandwidth at this size), the logp
head alone (the 3-operand variadic reduce), the advantage kernel alone
(tiny (T, B) planes), the composed op, and the XLA-fallback composition.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python bench_results/profile_upgo_r5.py
"""
import jax
import jax.numpy as jnp

from di_hpc_tpu import ops
from di_hpc_tpu.ops.categorical import logp
from di_hpc_tpu.pallas_kernels.rl_scans import upgo_advantages_pallas
from di_hpc_tpu.utils.profiling import bench_fn

HBM_GBS = 819.0
T, B, N = 128, 512, 128
LOGITS_MB = T * B * N * 4 / 1e6
PLANE_MB = T * B * 4 / 1e6


def p(name, t, mb):
    floor = mb * 1e6 / (HBM_GBS * 1e3)
    print(f"{name:<34} {t*1e6:9.1f} us   floor {floor:7.1f} us "
          f"({100*floor/(t*1e6):5.1f}% SoL)", flush=True)


def main():
    k = jax.random.split(jax.random.PRNGKey(1), 5)
    to = jax.random.normal(k[0], (T, B, N))
    act = jax.random.randint(k[2], (T, B), 0, N)
    val = jax.random.normal(k[3], (T + 1, B))
    rew = jax.random.normal(k[4], (T, B))
    rhos = jnp.exp(jax.random.normal(jax.random.PRNGKey(5), (T, B)) * 0.1)

    t = bench_fn(lambda a: jnp.sum(a[0]), (to,))
    p("raw logits read", t, LOGITS_MB)

    t = bench_fn(lambda a: jnp.sum(logp(a[0], act)), (to,))
    p("logp head alone", t, LOGITS_MB)

    t = bench_fn(lambda a: jnp.sum(upgo_advantages_pallas(a[0], a[1], a[2])),
                 (rhos, rew, val))
    p("advantage kernel alone", t, 4 * PLANE_MB)

    t = bench_fn(lambda a: ops.upgo_loss(a[0], a[1], act, a[2], a[3]),
                 (to, rhos, rew, val))
    p("composed upgo_loss (kernel)", t, LOGITS_MB + 4 * PLANE_MB)

    t = bench_fn(lambda a: ops.upgo_loss(a[0], a[1], act, a[2], a[3],
                                         method="associative"),
                 (to, rhos, rew, val))
    p("composed upgo_loss (xla scan)", t, LOGITS_MB + 4 * PLANE_MB)


if __name__ == "__main__":
    main()
