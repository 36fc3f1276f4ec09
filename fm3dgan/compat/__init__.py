from fm3dgan.compat import torch_port

__all__ = ["torch_port"]
