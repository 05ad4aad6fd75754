from grappa_tpu.train.loss import LossWeights, molwise_loss
from grappa_tpu.train.evaluator import StreamingEvaluator, early_stopping_loss
from grappa_tpu.statistics import (
    get_default_statistics, param_statistics_from_graphs)
from grappa_tpu.train.trainer import Trainer, make_optimizer, make_train_step
from grappa_tpu.train.config import default_config

__all__ = [
    "LossWeights", "molwise_loss", "StreamingEvaluator",
    "early_stopping_loss", "get_default_statistics",
    "param_statistics_from_graphs", "Trainer", "make_optimizer",
    "make_train_step", "default_config",
]
