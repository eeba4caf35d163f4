"""Model-level ops (reference: hpc_models extension) and reference models."""

from .actor_critic import update_ae, lstm_activation, pre_sample
from .actor_critic_lstm import (
    ActorCriticConfig,
    ActorCriticParams,
    TrainBatch,
    actor_critic_forward,
    actor_step,
    init_actor_critic,
    make_train_step,
)
from .entity_selection import (
    EntitySelectionParams,
    init_entity_selection,
    select_entities,
)
