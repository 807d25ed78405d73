from rankpo_tpu.train.config import TrainConfig
from rankpo_tpu.train.state import TrainState
from rankpo_tpu.train.trainer import Trainer
from rankpo_tpu.train.steps import (
    make_contrastive_loss_fn,
    make_rankpo_loss_fn,
)
from rankpo_tpu.train.gradcache import make_contrastive_gradcache_grad_fn

__all__ = [
    "TrainConfig",
    "TrainState",
    "Trainer",
    "make_contrastive_loss_fn",
    "make_rankpo_loss_fn",
    "make_contrastive_gradcache_grad_fn",
]
