"""Unit tests for the linear-recurrence scan core (ops/scan.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from di_hpc_tpu.ops.scan import (
    gae_denominators,
    linear_recurrence_forward,
    linear_recurrence_reverse,
)


def _np_reverse(a, b, y_last=0.0):
    T = a.shape[0]
    y = np.zeros_like(a)
    carry = np.full(a.shape[1:], y_last, a.dtype)
    for t in reversed(range(T)):
        carry = a[t] + b[t] * carry
        y[t] = carry
    return y


def _np_forward(a, b, y_first=0.0):
    T = a.shape[0]
    y = np.zeros_like(a)
    carry = np.full(a.shape[1:], y_first, a.dtype)
    for t in range(T):
        carry = a[t] + b[t] * carry
        y[t] = carry
    return y


@pytest.mark.parametrize("T", [1, 2, 3, 7, 64, 100])
@pytest.mark.parametrize("method", ["associative", "scan"])
def test_reverse_matches_numpy(T, method, key):
    k1, k2 = jax.random.split(key)
    a = jax.random.normal(k1, (T, 5))
    b = jax.random.uniform(k2, (T, 5), minval=-1.0, maxval=1.0)
    got = linear_recurrence_reverse(a, b, method=method)
    want = _np_reverse(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("T", [1, 2, 17, 64])
@pytest.mark.parametrize("method", ["associative", "scan"])
def test_forward_matches_numpy(T, method, key):
    k1, k2 = jax.random.split(key)
    a = jax.random.normal(k1, (T, 4))
    b = jax.random.uniform(k2, (T, 4), minval=-1.0, maxval=1.0)
    got = linear_recurrence_forward(a, b, method=method)
    want = _np_forward(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("direction", ["fwd", "rev"])
def test_nonzero_init(direction, key):
    k1, k2 = jax.random.split(key)
    a = jax.random.normal(k1, (11, 3))
    b = jax.random.uniform(k2, (11, 3), minval=0.1, maxval=0.9)
    if direction == "rev":
        got = linear_recurrence_reverse(a, b, y_last=2.5, method="associative")
        want = _np_reverse(np.asarray(a), np.asarray(b), 2.5)
    else:
        got = linear_recurrence_forward(a, b, y_first=-1.5, method="associative")
        want = _np_forward(np.asarray(a), np.asarray(b), -1.5)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_scalar_b_broadcast(key):
    a = jax.random.normal(key, (16, 4))
    got = linear_recurrence_reverse(a, 0.9, method="associative")
    want = _np_reverse(np.asarray(a), np.full((16, 4), 0.9, np.float32))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_zero_coefficient_cuts_recurrence(key):
    a = jax.random.normal(key, (8, 2))
    b = jnp.zeros((8, 2))
    got = linear_recurrence_reverse(a, b, method="associative")
    np.testing.assert_allclose(got, a, rtol=1e-6)


@pytest.mark.parametrize("lam", [0.0, 0.5, 0.97, 1.0])
def test_gae_denominators_closed_form(lam):
    T = 13
    denom = np.asarray(gae_denominators(T, lam))
    # Eager recurrence: denom updated once per backward step from 0.
    d, want = 0.0, np.zeros(T)
    for t in reversed(range(T)):
        d = 1.0 + lam * d
        want[t] = d
    np.testing.assert_allclose(denom, want, rtol=1e-6)


# 64 = flat scan; 128 = chunked; 192 = chunked with an odd chunk count.
@pytest.mark.parametrize("T", [64, 128, 192])
def test_pallas_interpret_mode(T, key):
    """Pallas kernel correctness via the interpreter (runs on CPU); T>=128
    exercises the two-level chunked composition in both directions."""
    import di_hpc_tpu.pallas_kernels.linear_scan as ls

    k1, k2 = jax.random.split(key)
    B = 256
    a = jax.random.normal(k1, (T, B), jnp.float32)
    b = jax.random.uniform(k2, (T, B), jnp.float32, minval=0.5, maxval=0.99)

    ls.INTERPRET = True
    try:
        got_r = ls.linear_scan_reverse_pallas(a, b)
        got_f = ls.linear_scan_forward_pallas(a, b, y_first=1.0)
    finally:
        ls.INTERPRET = False
    np.testing.assert_allclose(
        got_r, _np_reverse(np.asarray(a), np.asarray(b)), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        got_f, _np_forward(np.asarray(a), np.asarray(b), 1.0), rtol=2e-5, atol=2e-5)
