"""Pure-jnp oracle implementations (the ground truth the fused ops match).

Mirrors the reference's two-tier design: hpc_rll/origin (torch oracles) vs
hpc_rll/rl_utils (fused CUDA).  Here: di_hpc_tpu.origin (naive jnp) vs
di_hpc_tpu.ops (fused TPU).
"""

from .gae import gae, gae_data
from .td import (
    value_transform,
    value_inv_transform,
    nstep_return,
    nstep_return_data,
    td_lambda_data,
    td_lambda_error,
    generalized_lambda_returns,
    multistep_forward_view,
    q_nstep_td_data,
    q_nstep_td_error,
    q_nstep_td_error_with_rescale,
    dist_nstep_td_data,
    dist_nstep_td_error,
    qrdqn_nstep_td_data,
    qrdqn_nstep_td_error,
    iqn_nstep_td_data,
    iqn_nstep_td_error,
)
from .ppo import ppo_data, ppo_loss, ppo_info, ppo_error
from .vtrace import (
    vtrace_data,
    vtrace_loss,
    vtrace_error,
    compute_importance_weights,
    vtrace_nstep_return,
    vtrace_advantage,
)
from .upgo import upgo_loss, upgo_returns, tb_cross_entropy
from .rnn import (
    LSTMParams,
    init_lstm_params,
    lstm,
    get_lstm,
    sequence_mask,
    layer_norm,
)
from .padding import (
    Padding1D,
    Padding2D,
    Padding3D,
    UnPadding1D,
    UnPadding2D,
    UnPadding3D,
    oracle_split_group,
)
from .scatter_connection import ScatterConnection, scatter_connection
