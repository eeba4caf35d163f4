"""Fused network ops (reference: hpc_rll/torch_utils/network)."""

from .lstm import (
    LSTM,
    LSTMParams,
    flatten_lstm_params,
    init_lstm_params,
    lstm_fused,
    unflatten_lstm_params,
)
from .scatter_connection import ScatterConnection, scatter_connection
