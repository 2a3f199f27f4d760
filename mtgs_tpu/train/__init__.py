"""Training engine: losses, per-group optimizers, densify control, train step."""

from mtgs_tpu.train.losses import (
    LossConfig,
    compute_losses,
    masked_mean,
    ssim,
)
from mtgs_tpu.train.optim import build_optimizer, OptimConfig
from mtgs_tpu.train.control import ControlConfig, DensifyState, refine_node
from mtgs_tpu.train.trainer import Trainer, TrainerConfig
