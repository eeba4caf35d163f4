"""Fused network ops (reference: hpc_rll/torch_utils/network)."""

from .lstm import LSTM, LSTMParams, init_lstm_params, lstm_fused
from .scatter_connection import ScatterConnection, scatter_connection
