from fm3dgan.losses.gan import (
    d_logistic_loss,
    d_r1_penalty,
    g_nonsaturating_loss,
)
from fm3dgan.losses.path_reg import path_regularize
from fm3dgan.losses.recon import l1_loss
from fm3dgan.losses.geometry import face_regional_loss, get_render_mask

__all__ = [
    "d_logistic_loss",
    "d_r1_penalty",
    "g_nonsaturating_loss",
    "path_regularize",
    "l1_loss",
    "face_regional_loss",
    "get_render_mask",
]
