"""Profile scatter_connection on TPU at the reference config
(B=256, M=256, N=256, H=W=16, tests/test_scatter.py:11-15), current
scatter/gather formulation vs one-hot matmul variants."""
import jax
import jax.numpy as jnp

from di_hpc_tpu.utils.profiling import bench_fn
from di_hpc_tpu.network.scatter_connection import scatter_connection

B, M, N, H, W = 256, 256, 256, 16, 16
ks = jax.random.split(jax.random.PRNGKey(0), 3)
x = jax.random.normal(ks[0], (B, M, N))
loc = jnp.stack([jax.random.randint(ks[1], (B, M), 0, H),
                 jax.random.randint(ks[2], (B, M), 0, W)], axis=-1)


import functools


@functools.partial(jax.jit, static_argnames=("prec",))
def add_v2(x, loc, prec="highest"):
    cell = loc[..., 0] * W + loc[..., 1]                      # (B, M)
    hw = jax.lax.broadcasted_iota(jnp.int32, (B, M, H * W), 2)
    onehot = (hw == cell[..., None]).astype(x.dtype)          # (B, M, HW)
    out = jnp.einsum("bmh,bmn->bhn", onehot, x, precision=prec)  # MXU
    return out.reshape(B, H, W, N).transpose(0, 3, 1, 2)


@jax.jit
def cover_v2(x, loc):
    cell = loc[..., 0] * W + loc[..., 1]
    hw = jax.lax.broadcasted_iota(jnp.int32, (B, M, H * W), 2)
    hit = hw == cell[..., None]                               # (B, M, HW)
    m_ids = jnp.arange(M, dtype=jnp.int32)[None, :, None]
    winner = jnp.max(jnp.where(hit, m_ids, -1), axis=1)       # (B, HW)
    sel = (jnp.arange(M, dtype=jnp.int32)[None, :, None] == winner[:, None, :])
    out = jnp.einsum("bmh,bmn->bhn", sel.astype(x.dtype), x, precision="highest")
    return out.reshape(B, H, W, N).transpose(0, 3, 1, 2)


def report(name, sec):
    print(f"{name:<28} {sec*1e6:9.1f} us", flush=True)


for mode in ("add", "cover"):
    want = scatter_connection(x, (H, W), loc, mode)
    got = (add_v2 if mode == "add" else cover_v2)(x, loc)
    assert jnp.allclose(want, got, atol=1e-5), (mode, float(jnp.abs(want-got).max()))
print("parity ok", flush=True)

report("add current fwd", bench_fn(lambda x_: scatter_connection(x_, (H, W), loc, "add"), x))
report("add matmul fwd f32", bench_fn(lambda x_: add_v2(x_, loc), x))
report("add matmul fwd bf16", bench_fn(lambda x_: add_v2(x_, loc, "default"), x))
report("cover current fwd", bench_fn(lambda x_: scatter_connection(x_, (H, W), loc, "cover"), x))
report("cover matmul fwd", bench_fn(lambda x_: cover_v2(x_, loc), x))
report("add current grad", bench_fn(jax.grad(
    lambda x_: jnp.sum(scatter_connection(x_, (H, W), loc, "add") ** 2)), x))
report("add matmul grad", bench_fn(jax.grad(
    lambda x_: jnp.sum(add_v2(x_, loc) ** 2)), x))
print("done", flush=True)
