"""Profile the distributional TD family on TPU at reference test configs.

Suspects: XLA scatter (C51 projection) and take_along_axis gathers serialize
on TPU.  Variant: projection as a one-hot matmul (B, n) @ (B, n, n) and
gathers as sum-of-where(iota==idx).
"""
import jax
import jax.numpy as jnp

from di_hpc_tpu.utils.profiling import bench_fn
from di_hpc_tpu import ops
from di_hpc_tpu.origin.td import dist_nstep_td_data, qrdqn_nstep_td_data

key = jax.random.PRNGKey(0)

# ---- C51 config (reference tests/test_dntd.py:10-16) ----
B, N, n_atom, nstep = 128, 128, 51, 10
v_min, v_max, gamma = -10.0, 10.0, 0.95
ks = jax.random.split(key, 7)
dist = jax.nn.softmax(jax.random.normal(ks[0], (B, N, n_atom)), -1) + 1e-3
dist = dist / dist.sum(-1, keepdims=True)
next_dist = jax.nn.softmax(jax.random.normal(ks[1], (B, N, n_atom)), -1)
act = jax.random.randint(ks[2], (B,), 0, N)
next_act = jax.random.randint(ks[3], (B,), 0, N)
reward = jax.random.normal(ks[4], (nstep, B))
done = (jax.random.uniform(ks[5], (B,)) > 0.9)
data = dist_nstep_td_data(dist, next_dist, act, next_act, reward, done, None)


def onehot_gather_rows(x, idx):
    """x (B, N, A) [idx] -> (B, A) via iota-compare (no dynamic gather)."""
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape[:2], 1)
    mask = (col == idx[:, None])[..., None]
    return jnp.sum(jnp.where(mask, x, 0.0), axis=1)


@jax.jit
def dist_v2(data, gamma=gamma, v_min=v_min, v_max=v_max, n_atom=n_atom,
            nstep=nstep):
    dist, next_n_dist, act, next_n_act, reward, done, weight = data
    Bv = act.shape[0]
    disc = jnp.cumprod(jnp.full((nstep,), gamma))[:, None] / gamma
    r = jnp.sum(reward * disc, axis=0)[:, None]
    done_f = done.astype(dist.dtype)[:, None]
    support = jnp.linspace(v_min, v_max, n_atom, dtype=dist.dtype)
    delta_z = (v_max - v_min) / (n_atom - 1)
    weight = jnp.ones_like(r) if weight is None else weight

    next_dist = jax.lax.stop_gradient(onehot_gather_rows(next_n_dist, next_n_act))
    target_z = jnp.clip(r + (1.0 - done_f) * (gamma ** nstep) * support,
                        v_min, v_max)
    b = (target_z - v_min) / delta_z
    l = jnp.floor(b).astype(jnp.int32)
    u = jnp.ceil(b).astype(jnp.int32)
    # projection matrix M[b, i, j] = (u_i - b_i)[l_i == j] + (b_i - l_i)[u_i == j]
    j = jax.lax.broadcasted_iota(jnp.int32, (Bv, n_atom, n_atom), 2)
    wl = (next_dist * (u.astype(b.dtype) - b))[:, :, None]
    wu = (next_dist * (b - l.astype(b.dtype)))[:, :, None]
    M = jnp.where(j == l[:, :, None], wl, 0.0) + jnp.where(j == u[:, :, None], wu, 0.0)
    proj = jnp.sum(M, axis=1)                                   # (B, n_atom)

    dist_s_a = onehot_gather_rows(dist, act)
    log_p = jnp.log(dist_s_a)
    td = -jnp.sum(log_p * proj, axis=-1)
    loss = -jnp.mean(jnp.sum(log_p * proj * weight, axis=-1))
    return loss, td


# correctness
l1, td1 = ops.dist_nstep_td_error(data, gamma, v_min, v_max, n_atom, nstep)
l2, td2 = dist_v2(data)
assert abs(float(l1) - float(l2)) < 1e-5, (float(l1), float(l2))
assert float(jnp.abs(td1 - td2).max()) < 1e-4
g1 = jax.grad(lambda d: ops.dist_nstep_td_error(
    data._replace(dist=d), gamma, v_min, v_max, n_atom, nstep)[0])(dist)
g2 = jax.grad(lambda d: dist_v2(data._replace(dist=d))[0])(dist)
assert jnp.allclose(g1, g2, rtol=1e-3, atol=1e-4), float(jnp.abs(g1 - g2).max())
print("c51 variant parity ok", flush=True)

t = bench_fn(lambda d: ops.dist_nstep_td_error(d, gamma, v_min, v_max, n_atom, nstep), data)
print(f"c51 current fwd:  {t*1e6:9.1f} us", flush=True)
t = bench_fn(lambda d: dist_v2(d), data)
print(f"c51 matmul fwd:   {t*1e6:9.1f} us", flush=True)
t = bench_fn(jax.grad(lambda d: ops.dist_nstep_td_error(
    data._replace(dist=d), gamma, v_min, v_max, n_atom, nstep)[0]), dist)
print(f"c51 current grad: {t*1e6:9.1f} us", flush=True)
t = bench_fn(jax.grad(lambda d: dist_v2(data._replace(dist=d))[0]), dist)
print(f"c51 matmul grad:  {t*1e6:9.1f} us", flush=True)

# ---- QR-DQN config (reference tests/test_qrdqn_nstep_td_error.py) ----
tau, T, Bq, Nq = 39, 10, 89, 67
kq = jax.random.split(jax.random.PRNGKey(5), 6)
qdata = qrdqn_nstep_td_data(
    jax.random.normal(kq[0], (Bq, Nq, tau)),
    jax.random.normal(kq[1], (Bq, Nq, tau)),
    jax.random.randint(kq[2], (Bq,), 0, Nq),
    jax.random.randint(kq[3], (Bq,), 0, Nq),
    jax.random.normal(kq[4], (T, Bq)),
    (jax.random.uniform(kq[5], (Bq,)) > 0.9),
    tau, None)
vg = jnp.full((Bq,), 0.95 ** T)
t = bench_fn(lambda d: ops.qrdqn_nstep_td_error(d, 0.95, T, vg), qdata)
print(f"qrdqn fwd:        {t*1e6:9.1f} us", flush=True)
t = bench_fn(jax.grad(lambda q: ops.qrdqn_nstep_td_error(
    qdata._replace(q=q), 0.95, T, vg)[0]), qdata.q)
print(f"qrdqn grad:       {t*1e6:9.1f} us", flush=True)
print("done", flush=True)
