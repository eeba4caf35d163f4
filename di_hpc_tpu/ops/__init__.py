"""Fused TPU-native RL ops (the product layer; reference: hpc_rll/rl_utils)."""

from .scan import (
    linear_recurrence_reverse,
    linear_recurrence_forward,
    gae_denominators,
)
from .gae import gae, gae_data, GAE
from .td import (
    td_lambda_error, td_lambda_data, TDLambda,
    generalized_lambda_returns, multistep_forward_view,
    q_nstep_td_error, q_nstep_td_data, QNStepTD,
    q_nstep_td_error_with_rescale, QNStepTDRescale,
    dist_nstep_td_error, dist_nstep_td_data, DistNStepTD,
    qrdqn_nstep_td_error, qrdqn_nstep_td_data, QRDQNNStepTDError,
    iqn_nstep_td_error, iqn_nstep_td_data, IQNNStepTDError,
)
from .categorical import logp, logp_entropy
from .ppo import (
    ppo_error, ppo_error_with_logp_old, ppo_data, ppo_fast_data,
    ppo_loss, ppo_info, PPO,
)
from .vtrace import vtrace_error, vtrace_data, vtrace_loss, VTrace
from .upgo import upgo_loss, upgo_returns, UPGO
from .padding import (
    Padding1D, Padding2D, Padding3D,
    UnPadding1D, UnPadding2D, UnPadding3D,
    oracle_split_group, sample_split_group,
)
