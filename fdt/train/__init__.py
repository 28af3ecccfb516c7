from fdt.train.multibox_loss import (multibox_loss, multibox_loss_from_targets,
                                     MultiBoxLossConfig)
from fdt.train.loops import PyramidTrainer, TrainState, sgd_optimizer, pad_targets
from fdt.train.facebox_train import FaceBoxTrainer

__all__ = ["multibox_loss", "multibox_loss_from_targets", "MultiBoxLossConfig",
           "PyramidTrainer", "FaceBoxTrainer", "TrainState", "sgd_optimizer",
           "pad_targets"]
