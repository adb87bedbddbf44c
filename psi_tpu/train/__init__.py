from psi_tpu.train.objective import SceneAssets, cvae_loss
from psi_tpu.train.loop import TrainOP, make_train_step, make_epoch_step, TrainState
from psi_tpu.train.checkpoint import save_checkpoint, load_newest_checkpoint

__all__ = [
    "SceneAssets",
    "cvae_loss",
    "TrainOP",
    "make_train_step",
    "make_epoch_step",
    "TrainState",
    "save_checkpoint",
    "load_newest_checkpoint",
]
