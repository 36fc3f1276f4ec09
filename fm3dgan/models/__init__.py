from fm3dgan.models.generator import Generator, channel_table, default_net_shape
from fm3dgan.models.discriminator import Discriminator

__all__ = ["Generator", "Discriminator", "channel_table", "default_net_shape"]
