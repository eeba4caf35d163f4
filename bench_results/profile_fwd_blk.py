"""Measure a forward-only LSTM B-block raise (blk 64 vs 128 at H=512 f32).

DESIGN.md once recorded +9% fwd (850 -> 774 us) from blk=128 at S=32,
B=256, H=512, L=2.  Re-measured 2026-08-19 (this script): NEUTRAL —
blk=64 fwd 851.4 us / fwd+grad 2222 us vs blk=128 fwd 861.0 / 2183; the
old reading did not reproduce, so the shared _pick_blk_b stands
(historical script; monkeypatches the picker).
"""
import jax
import jax.numpy as jnp

from di_hpc_tpu.utils.profiling import bench_fn
from di_hpc_tpu.pallas_kernels import lstm_cell as lc
from di_hpc_tpu import network

S, B, H, L = 32, 256, 512, 2
IN = 512
key = jax.random.split(jax.random.PRNGKey(0), 2)
params = network.init_lstm_params(key[0], IN, H, L, "LN")
x = jax.random.normal(key[1], (S, B, IN))

orig_pick = lc._pick_blk_b


def fwd(xx):
    return network.lstm_fused(params, xx, None, "LN")[0]


def loss(p_, xx):
    return jnp.sum(network.lstm_fused(p_, xx, None, "LN")[0] ** 2)


sums = {}
for blk_override in (None, 128):
    if blk_override:
        lc._pick_blk_b = lambda B_, H_, n_bufs=10, itemsize=4: blk_override
    else:
        lc._pick_blk_b = orig_pick
    lc._layer_impl.clear_cache()
    tag = f"blk={blk_override or orig_pick(B, H)}"
    sums[tag] = float(jnp.sum(fwd(x)))
    print(f"{tag} fwd sum={sums[tag]:.6f}", flush=True)
    t = bench_fn(fwd, x)
    print(f"{tag:<10} fwd        {t*1e6:9.1f} us", flush=True)
    t = bench_fn(lambda xx: jax.grad(loss, argnums=(0, 1))(params, xx)[1], x)
    print(f"{tag:<10} fwd+grad   {t*1e6:9.1f} us", flush=True)
print("sums:", sums)
