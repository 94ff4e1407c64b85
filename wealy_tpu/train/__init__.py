"""Training layer: config, train state, pjit train step, checkpointing, loop.

The reference ships no training driver (SURVEY.md layer T, "absent") — its
contracts (OmegaConf ``conf`` keys, the ``(loss, logdict)`` channel, the
clique-positive batch construction) define this layer's API surface.
"""

from wealy_tpu.train.config import Config, PathConfig, DataConfig, ModelConfig, TrainConfig
from wealy_tpu.train.state import TrainState, create_train_state
from wealy_tpu.train.step import make_train_step, make_eval_embed_step

__all__ = [
    "Config",
    "PathConfig",
    "DataConfig",
    "ModelConfig",
    "TrainConfig",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_embed_step",
]
