"""Examples smoke tests (the examples are documentation that must not rot)."""

import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"))


@pytest.mark.slow
def test_impala_training_runs():
    from impala_training import main
    main(steps=3, T=8, B=16)


@pytest.mark.slow
def test_impala_actor_learner_runs():
    from impala_actor_learner import run
    params = run(steps=3, T=4, env_batch=8, learn_batch=8)
    assert jax.tree.leaves(params)


@pytest.mark.slow
def test_impala_training_bf16_runs():
    from impala_training import main
    main(steps=3, T=8, B=16, bf16=True)


def test_ppo_training_runs():
    from ppo_training import main
    params = main(steps=2, epochs=2, T=8, B=16)
    assert all(bool(jax.numpy.isfinite(p).all()) for p in jax.tree.leaves(params))


def test_c51_training_runs():
    from c51_training import main
    params = main(steps=4, B=32)
    assert all(bool(jax.numpy.isfinite(p).all()) for p in jax.tree.leaves(params))


def test_r2d2_training_runs():
    from r2d2_training import main
    params = main(steps=3, S=12, burn_in=3, B=8, hidden=32, nstep=2)
    assert all(bool(jax.numpy.isfinite(p).all()) for p in jax.tree.leaves(params))


@pytest.mark.slow
def test_alphastar_policy_training_runs():
    from alphastar_policy_training import main
    params = main(steps=2, T=6, B=4, M=16, Hc=128, max_selections=4)
    assert all(bool(jax.numpy.isfinite(p).all()) for p in jax.tree.leaves(params))


def test_quantile_dqn_training_runs():
    from quantile_dqn_training import main
    out = main(steps=3, B=16, n_tau=8, n_tau_prime=9, n_cos=16)
    for params in out.values():
        assert all(bool(jax.numpy.isfinite(p).all())
                   for p in jax.tree.leaves(params))


def test_episodic_a2c_padding_runs():
    from episodic_a2c_padding import main
    params = main(steps=3, n_eps=16, l_max=24)
    assert all(bool(jax.numpy.isfinite(p).all()) for p in jax.tree.leaves(params))
