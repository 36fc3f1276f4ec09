from fm3dgan.train.config import TrainConfig
from fm3dgan.train.state import TrainState, make_d_optimizer, make_g_enc_optimizer
from fm3dgan.train.steps import forward_full, make_step_fns
from fm3dgan.train.loop import Trainer

__all__ = [
    "TrainConfig",
    "TrainState",
    "make_d_optimizer",
    "make_g_enc_optimizer",
    "forward_full",
    "make_step_fns",
    "Trainer",
]
