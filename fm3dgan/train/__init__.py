from fm3dgan.train.config import TrainConfig
from fm3dgan.train.state import TrainState, make_d_optimizer, make_g_enc_optimizer
from fm3dgan.train.steps import forward_full, make_step_fns
from fm3dgan.train.loop import Trainer
from fm3dgan.train.loop2 import Trainer2
from fm3dgan.train.eval_hook import QuantEvalHook

__all__ = [
    "QuantEvalHook",
    "TrainConfig",
    "TrainState",
    "make_d_optimizer",
    "make_g_enc_optimizer",
    "forward_full",
    "make_step_fns",
    "Trainer",
]
