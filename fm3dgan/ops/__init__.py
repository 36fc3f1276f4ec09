"""TPU-native core ops.

The reference implements these as CUDA kernels (``/root/reference/op/``); here the
canonical implementations are single fused XLA ops (`upfirdn2d` = one pad + one
depthwise dilated convolution; `fused_leaky_relu` = one fused elementwise
expression), with Pallas TPU kernels selectable for the hot configurations.
"""

from fm3dgan.ops.upfirdn2d import upfirdn2d, make_kernel, upfirdn2d_out_shape
from fm3dgan.ops.fused_act import fused_leaky_relu

__all__ = ["upfirdn2d", "make_kernel", "upfirdn2d_out_shape", "fused_leaky_relu"]
