"""Training: losses, optimizer, jitted train step, driver, checkpointing."""

from gsjax.train.loss import l1_loss, l2_loss, ssim
from gsjax.train.optim import make_optimizer, adam_moments, with_adam_moments
from gsjax.train.step import TrainConfig, make_train_step, make_render_fn

__all__ = [
    "l1_loss",
    "l2_loss",
    "ssim",
    "make_optimizer",
    "adam_moments",
    "with_adam_moments",
    "TrainConfig",
    "make_train_step",
    "make_render_fn",
]
