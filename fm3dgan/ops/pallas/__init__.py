"""Pallas TPU kernels for the framework's hot ops.

These are the TPU-native counterparts of the reference's CUDA kernels
(``/root/reference/op/fused_bias_act_kernel.cu``, ``op/upfirdn2d_kernel.cu``).
Each module exposes a ``*_pallas_maybe`` entry point that returns ``None`` for
unsupported configurations so the caller can fall back to the XLA path.
"""
