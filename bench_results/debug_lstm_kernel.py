"""Bisect the LSTM-layer kernel mismatch on real TPU."""
import jax
jax.config.update("jax_default_matmul_precision", "float32")
import jax.numpy as jnp

from di_hpc_tpu.pallas_kernels.lstm_cell import lstm_layer_fused, _cell_jnp

key = jax.random.PRNGKey(0)


def ref_layer(gx, wh, gln, bln, h0, c0):
    def step(carry, gx_t):
        h, c = carry
        h2, c2 = _cell_jnp(h, c, gx_t, wh, gln, bln, True)
        return (h2, c2), h2
    (hn, cn), y = jax.lax.scan(step, (h0, c0), gx)
    return y, hn, cn


for (S, B, H) in [(8, 3, 384), (64, 3, 384)]:
    ks = jax.random.split(jax.random.fold_in(key, S * 1000 + B * 10 + H), 5)
    gx = jax.random.normal(ks[0], (S, B, 4 * H)) * 0.5
    wh = jax.random.normal(ks[1], (H, 4 * H)) * 0.05
    gln = jnp.ones((4 * H,)) + jax.random.normal(ks[2], (4 * H,)) * 0.01
    bln = jax.random.normal(ks[2], (4 * H,)) * 0.01
    h0 = jax.random.normal(ks[3], (B, H))
    c0 = jax.random.normal(ks[4], (B, H))
    y_r, hn_r, cn_r = ref_layer(gx, wh, gln, bln, h0, c0)
    y, hn, cn = lstm_layer_fused(gx, wh, gln, bln, h0, c0, True)
    ey = float(jnp.abs(y - y_r).max())
    eh = float(jnp.abs(hn - hn_r).max())
    ec = float(jnp.abs(cn - cn_r).max())
    # per-step worst error to see where divergence starts
    per_t = jnp.abs(y - y_r).reshape(S, -1).max(axis=1)
    print(f"S={S:3d} B={B} H={H}: y={ey:.2e} hn={eh:.2e} cn={ec:.2e} "
          f"per_t={[f'{float(v):.1e}' for v in per_t[:8]]}", flush=True)
print("done", flush=True)
