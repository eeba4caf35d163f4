"""Model-level ops (reference: hpc_models extension) and reference models."""

from .actor_critic import update_ae, lstm_activation, pre_sample
