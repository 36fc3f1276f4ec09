"""Pallas TPU kernel for upfirdn2d hot modes (StyleGAN2 blur / up / down).

TPU counterpart of the reference CUDA fast paths
(``/root/reference/op/upfirdn2d_kernel.cu:107-207``, mode dispatch ``:250-309``).

The XLA path (one pad + depthwise dilated conv) is the canonical
implementation; this module specializes the configurations that dominate the
generator/discriminator wall-clock.  ``upfirdn2d_pallas_maybe`` returns None
for unsupported configs so callers fall back.
"""

from __future__ import annotations

from typing import Optional

import jax

# Implemented incrementally; currently all modes fall back to XLA.  See
# fm3dgan/ops/upfirdn2d.py for the canonical op.


def upfirdn2d_pallas_maybe(
    x: jax.Array,
    kernel: jax.Array,
    up_x: int,
    up_y: int,
    down_x: int,
    down_y: int,
    pad_x0: int,
    pad_x1: int,
    pad_y0: int,
    pad_y1: int,
) -> Optional[jax.Array]:
    return None
