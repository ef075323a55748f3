from nerf_tpu.train.checkpoint import (
    find_latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from nerf_tpu.train.trainer import NeRFTrainer, TrainState, make_train_step

__all__ = [
    "NeRFTrainer",
    "TrainState",
    "make_train_step",
    "save_checkpoint",
    "restore_checkpoint",
    "find_latest_checkpoint",
]
