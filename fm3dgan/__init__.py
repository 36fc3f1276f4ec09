"""fm3dgan — TPU-native (JAX/XLA/Pallas) 3D-controllable face manipulation framework.

A from-scratch rebuild of the capabilities of adobe/3D-FM-GAN (ECCV 2022,
arXiv:2208.11257) designed for TPU hardware:

* NHWC layouts everywhere (TPU-native; the reference is NCHW).
* ``upfirdn2d`` / ``fused_leaky_relu`` as XLA-fused primitives with Pallas TPU
  kernels for the hot configurations (the reference uses CUDA kernels, see
  ``/root/reference/op/``).
* Modulated convolutions formulated as input-scale / shared-weight / output-demod
  (exact, MXU-friendly) instead of the reference's ``groups=batch`` grouped conv
  (``stylegan2.py:264-293``) which does not map onto the MXU.
* SPMD data parallelism over a ``jax.sharding.Mesh`` in place of
  ``nn.DataParallel`` (``train_3_encoder.py:355-362``).
* Explicit PRNG threading for noise injection, pure jitted train steps, Optax
  optimizers, Orbax checkpoints.
"""

__version__ = "0.1.0"
