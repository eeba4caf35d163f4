"""Op-named trace-time input validation (SURVEY.md §5.3: the TPU-native
equivalent of the reference's CHECK_INPUT guards, status.h:15-17).

Malformed shapes must raise a ValueError naming the op and the offending
argument — not a cryptic XLA broadcast error deep inside the fusion."""

import jax
import jax.numpy as jnp
import pytest

from di_hpc_tpu import ops, origin

T, B, N = 6, 4, 5


def z(*s):
    return jnp.zeros(s)


def zi(*s):
    return jnp.zeros(s, jnp.int32)


def test_gae_value_shape():
    with pytest.raises(ValueError, match="gae: value"):
        ops.gae(ops.gae_data(z(T, B), z(T, B)))   # value must be (T+1, B)


def test_td_lambda_weight_shape():
    with pytest.raises(ValueError, match="td_lambda_error: weight"):
        ops.td_lambda_error(ops.td_lambda_data(z(T + 1, B), z(T, B),
                                               z(T + 1, B)))


def test_vtrace_behaviour_mismatch():
    with pytest.raises(ValueError, match="vtrace_error: behaviour_output"):
        ops.vtrace_error(ops.vtrace_data(
            z(T, B, N), z(T, B, N + 1), zi(T, B), z(T + 1, B), z(T, B), None))


def test_vtrace_float_action():
    with pytest.raises(ValueError, match="vtrace_error: action"):
        ops.vtrace_error(ops.vtrace_data(
            z(T, B, N), z(T, B, N), z(T, B), z(T + 1, B), z(T, B), None))


def test_upgo_bootstrap_shape():
    with pytest.raises(ValueError, match="upgo_loss: bootstrap_values"):
        ops.upgo_loss(z(T, B, N), z(T, B), zi(T, B), z(T, B), z(T, B))


def test_ppo_value_shape():
    with pytest.raises(ValueError, match="ppo_error: value_old"):
        ops.ppo_error(ops.ppo_data(z(B, N), z(B, N), zi(B), z(B), z(B + 1),
                                   z(B), z(B), None))


def test_q_nstep_reward_nstep_mismatch():
    with pytest.raises(ValueError, match="q_nstep_td_error: reward"):
        ops.q_nstep_td_error(
            origin.q_nstep_td_data(z(B, N), z(B, N), zi(B), zi(B), z(2, B),
                                   z(B), None), gamma=0.99, nstep=3)


def test_rescale_action_shape():
    with pytest.raises(ValueError,
                       match="q_nstep_td_error_with_rescale: action"):
        ops.q_nstep_td_error_with_rescale(
            origin.q_nstep_td_data(z(B, N), z(B, N), zi(B + 1), zi(B),
                                   z(1, B), z(B), None), gamma=0.99)


def test_dist_nstep_n_atom_mismatch():
    with pytest.raises(ValueError, match="dist_nstep_td_error: dist"):
        ops.dist_nstep_td_error(
            origin.dist_nstep_td_data(z(B, N, 11), z(B, N, 11), zi(B), zi(B),
                                      z(1, B), z(B), None),
            gamma=0.99, v_min=-5.0, v_max=5.0, n_atom=21)


def test_qrdqn_rank():
    with pytest.raises(ValueError, match="qrdqn_nstep_td_error: q"):
        ops.qrdqn_nstep_td_error(
            origin.qrdqn_nstep_td_data(z(B, N), z(B, N), zi(B), zi(B),
                                       z(1, B), z(B), z(3), None), gamma=0.99)


def test_iqn_replay_quantiles():
    tau = 3
    with pytest.raises(ValueError,
                       match="iqn_nstep_td_error: replay_quantiles"):
        ops.iqn_nstep_td_error(
            origin.iqn_nstep_td_data(z(tau, B, N), z(tau, B, N), zi(B), zi(B),
                                     z(1, B), z(B), z(tau + 1, B), None),
            gamma=0.99)


def test_valid_calls_still_work():
    """The happy paths must be untouched (and checks are trace-time only)."""
    adv = ops.gae(ops.gae_data(z(T + 1, B), z(T, B)))
    assert adv.shape == (T, B)
    losses = ops.vtrace_error(ops.vtrace_data(
        z(T, B, N), z(T, B, N), zi(T, B), z(T + 1, B), z(T, B), None))
    assert jnp.isfinite(losses.policy_loss)


def test_vmapped_q_nstep_still_works():
    """Relative-shape checks hold under vmap (the R2D2 window pattern)."""
    W = 3
    data = origin.q_nstep_td_data(z(W, B, N), z(W, B, N), zi(W, B), zi(W, B),
                                  z(W, 2, B), z(W, B), None)
    loss, td = jax.vmap(
        lambda q, nq, a, na, r, d: ops.q_nstep_td_error(
            origin.q_nstep_td_data(q, nq, a, na, r, d, None),
            gamma=0.99, nstep=2)
    )(data.q, data.next_n_q, data.action, data.next_n_action, data.reward,
      data.done)
    assert loss.shape == (W,) and td.shape == (W, B)


def test_scatter_connection_location_shape():
    from di_hpc_tpu import network
    with pytest.raises(ValueError, match="scatter_connection: location"):
        network.scatter_connection(z(B, 8, N), (4, 4), zi(B, 8, 3), "add")


def test_scatter_connection_float_location():
    from di_hpc_tpu import network
    with pytest.raises(ValueError, match="scatter_connection: location"):
        network.scatter_connection(z(B, 8, N), (4, 4), z(B, 8, 2), "add")


def test_lstm_fused_state_shape():
    from di_hpc_tpu import network
    params = network.init_lstm_params(jax.random.PRNGKey(0), 8, 16, 1, "LN")
    with pytest.raises(ValueError, match="lstm_fused: prev_state"):
        network.lstm_fused(params, z(4, B, 8), (z(1, B, 8), z(1, B, 8)), "LN")


def test_lstm_fused_input_dim():
    from di_hpc_tpu import network
    params = network.init_lstm_params(jax.random.PRNGKey(0), 8, 16, 1, "LN")
    with pytest.raises(ValueError, match="lstm_fused: inputs feature"):
        network.lstm_fused(params, z(4, B, 9), None, "LN")


def test_q_nstep_col_weight_rejected():
    """(B, 1) weight would outer-broadcast against the (B,) per-sample
    errors and silently change the loss — must be rejected (dist_nstep,
    which expands 1-D weight itself, still accepts it)."""
    with pytest.raises(ValueError, match="q_nstep_td_error: weight"):
        ops.q_nstep_td_error(
            origin.q_nstep_td_data(z(B, N), z(B, N), zi(B), zi(B), z(1, B),
                                   z(B), z(B, 1)), gamma=0.99)
    loss, _ = ops.dist_nstep_td_error(
        origin.dist_nstep_td_data(jnp.full((B, N, 11), 1 / 11.0),
                                  jnp.full((B, N, 11), 1 / 11.0), zi(B),
                                  zi(B), z(1, B), z(B), z(B, 1) + 1.0),
        gamma=0.99, v_min=-5.0, v_max=5.0, n_atom=11)
    assert jnp.isfinite(loss)


def test_iqn_accepts_reference_quantile_layouts():
    """(tau, B, 1) and flat layouts reshape to (tau, B) (origin td.py:342)."""
    tau = 3
    base = origin.iqn_nstep_td_data(
        z(tau, B, N) + 0.1, z(tau, B, N), zi(B), zi(B), z(1, B), z(B),
        jnp.full((tau, B), 0.5), None)
    l0, _ = ops.iqn_nstep_td_error(base, gamma=0.99)
    for shape in ((tau, B, 1), (tau * B,)):
        l, _ = ops.iqn_nstep_td_error(
            base._replace(replay_quantiles=jnp.full(shape, 0.5)), gamma=0.99)
        assert float(l) == float(l0)


def test_stack_ragged_mask_name_collision():
    from di_hpc_tpu.data import stack_trajectories
    import numpy as np
    trajs = [{"x": np.zeros((3,), np.float32), "x_mask": np.ones((3,), np.float32)},
             {"x": np.zeros((5,), np.float32), "x_mask": np.ones((5,), np.float32)}]
    with pytest.raises(ValueError, match="already contain"):
        stack_trajectories(trajs)
