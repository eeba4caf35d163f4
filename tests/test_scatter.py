"""Scatter connection: determinism, conservation, collision semantics, VJP
(reference config B=M=N=256, H=W=16, tests/test_scatter.py:11-15)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from di_hpc_tpu import network, origin


def _np_scatter(x, H, W, loc, mode):
    B, M, N = x.shape
    out = np.zeros((B, N, H, W), x.dtype)
    for b in range(B):
        for m in range(M):
            y, xx = int(loc[b, m, 0]), int(loc[b, m, 1])
            if mode == "add":
                out[b, :, y, xx] += x[b, m]
            else:
                out[b, :, y, xx] = x[b, m]  # sequential -> last writer wins
    return out


@pytest.mark.parametrize("mode", ["add", "cover"])
def test_matches_numpy_with_collisions(mode, key):
    B, M, N, H, W = 3, 40, 5, 4, 4  # M >> H*W forces collisions
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (B, M, N))
    loc = jnp.stack([jax.random.randint(k2, (B, M), 0, H),
                     jax.random.randint(k3, (B, M), 0, W)], -1)
    # Exact-f32 parity contract holds under the forced-f32 context (the
    # ambient-default path is X3, ~1.5e-5 — covered by the fast-path test).
    with jax.default_matmul_precision("float32"):
        got = network.scatter_connection(x, (H, W), loc, mode)
    want = _np_scatter(np.asarray(x), H, W, np.asarray(loc), mode)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    got_oracle = origin.scatter_connection(x, (H, W), loc, mode)
    np.testing.assert_allclose(got_oracle, want, rtol=1e-5, atol=1e-6)
    got_fast = network.scatter_connection(x, (H, W), loc, mode)
    np.testing.assert_allclose(got_fast, want, rtol=2e-4, atol=2e-4)


def test_add_conserves_sum(key):
    B, M, N, H, W = 4, 30, 6, 5, 5
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (B, M, N))
    loc = jnp.stack([jax.random.randint(k2, (B, M), 0, H),
                     jax.random.randint(k3, (B, M), 0, W)], -1)
    out = network.scatter_connection(x, (H, W), loc, "add")
    np.testing.assert_allclose(float(jnp.sum(out)), float(jnp.sum(x)), rtol=1e-5)


def test_cover_deterministic(key):
    """Unlike the reference GPU kernel (tests/test_scatter.py:17 admits
    nondeterminism), cover mode is deterministic here."""
    B, M, N, H, W = 2, 50, 4, 3, 3
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (B, M, N))
    loc = jnp.stack([jax.random.randint(k2, (B, M), 0, H),
                     jax.random.randint(k3, (B, M), 0, W)], -1)
    a = network.scatter_connection(x, (H, W), loc, "cover")
    b = network.scatter_connection(x, (H, W), loc, "cover")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_add_gradient(key):
    B, M, N, H, W = 2, 10, 3, 4, 4
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (B, M, N))
    loc = jnp.stack([jax.random.randint(k2, (B, M), 0, H),
                     jax.random.randint(k3, (B, M), 0, W)], -1)

    def f(x_):
        return jnp.sum(network.scatter_connection(x_, (H, W), loc, "add") ** 2)

    g = jax.grad(f)(x)
    eps, d = 1e-3, jax.random.normal(k1, (B, M, N))
    fd = (f(x + eps * d) - f(x - eps * d)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(g, d)), float(fd), rtol=1e-2)


def test_cover_gradient_gathers_at_location(key):
    """Cover-mode VJP: every entity reads grad_out at its own location —
    including collision double-reads, replicating the reference backward
    (scatter_connection_kernel.h:91-106) and torch scatter_'s autograd."""
    B, M, N, H, W = 2, 6, 3, 4, 4
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (B, M, N))
    loc = jnp.stack([jax.random.randint(k2, (B, M), 0, H),
                     jax.random.randint(k3, (B, M), 0, W)], -1)
    # force a collision so double-read semantics are exercised by
    # construction, not seed luck
    loc = loc.at[0, 1].set(loc[0, 0])
    g_out = jax.random.normal(k1, (B, N, H, W))

    def f(x_):
        return jnp.sum(network.scatter_connection(x_, (H, W), loc, "cover") * g_out)

    with jax.default_matmul_precision("float32"):
        g = jax.grad(f)(x)
    want = np.zeros((B, M, N))
    go = np.asarray(g_out)
    for b in range(B):
        for m in range(M):
            y, xx = int(loc[b, m, 0]), int(loc[b, m, 1])
            want[b, m] = go[b, :, y, xx]
    np.testing.assert_allclose(g, want, rtol=1e-5, atol=1e-6)


def test_wrapper_class(key):
    sc = network.ScatterConnection("add")
    x = jax.random.normal(key, (2, 5, 3))
    loc = jnp.zeros((2, 5, 2), jnp.int32)
    out = sc(x, (4, 4), loc)
    assert out.shape == (2, 3, 4, 4)


@pytest.mark.slow
def test_scatter_fuzz_matches_oracle(key):
    """One-hot-contraction scatter (fused) vs the scatter-based oracle across
    random shapes and collision densities, both modes, fwd + grad."""
    from di_hpc_tpu.network import scatter_connection
    from di_hpc_tpu.origin.scatter_connection import scatter_connection as oracle

    for i in range(6):
        cfg_key = jax.random.fold_in(key, 1000 + i)
        ks = jax.random.split(cfg_key, 4)
        B = int(jax.random.randint(ks[0], (), 1, 9))
        M = int(jax.random.randint(ks[1], (), 1, 65))
        N = int(jax.random.randint(ks[2], (), 1, 33))
        H = W = int(2 + i)  # small grids -> dense collisions
        x = jax.random.normal(ks[3], (B, M, N))
        loc = jnp.stack(
            [jax.random.randint(jax.random.fold_in(cfg_key, 7), (B, M), 0, H),
             jax.random.randint(jax.random.fold_in(cfg_key, 8), (B, M), 0, W)],
            axis=-1)
        for mode in ("add", "cover"):
            with jax.default_matmul_precision("float32"):
                got = scatter_connection(x, (H, W), loc, mode)
            want = oracle(x, (H, W), loc, mode)
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5,
                                       err_msg=f"{i}/{mode}")
            gf = jax.grad(lambda x_: jnp.sum(
                scatter_connection(x_, (H, W), loc, mode) ** 2))(x)
            assert bool(jnp.isfinite(gf).all()), (i, mode)
