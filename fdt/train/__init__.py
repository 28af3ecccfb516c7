from fdt.train.multibox_loss import multibox_loss, MultiBoxLossConfig
from fdt.train.loops import PyramidTrainer, TrainState, sgd_optimizer, pad_targets

__all__ = ["multibox_loss", "MultiBoxLossConfig",
           "PyramidTrainer", "TrainState", "sgd_optimizer", "pad_targets"]
