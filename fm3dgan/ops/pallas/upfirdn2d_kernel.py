"""Pallas TPU kernels for upfirdn2d hot modes.

TPU counterpart of the reference CUDA fast paths
(``/root/reference/op/upfirdn2d_kernel.cu:107-207``, mode dispatch ``:250-309``).

Implemented modes:
  * blur (up=down=1, small k, C % 128 == 0): the dominant StyleGAN2 config
    (post-conv-transpose blur, discriminator pre-conv blur).  XLA's depthwise
    conv lowering reaches only ~30% of HBM roofline on v5e; this kernel tiles
    rows with halo DMA from HBM and does k*k shifted multiply-adds in VMEM.
Everything else falls back to the XLA path (fm3dgan/ops/upfirdn2d.py), which
also provides the C<128 polyphase upsample specialization.

Gradient: blur's adjoint is blur with the flipped kernel and complementary
pads (the reference's flip-kernel/swap-pad backward, op/upfirdn2d.py:120-151),
wired as a jax.custom_vjp below.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_C_TILE = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _blur_kernel_body(
    x_hbm, o_ref, scratch, sem, *, kf, T, H, W, OW, p0, p1, kh, kw, n_h_tiles
):
    n = pl.program_id(0)
    h = pl.program_id(1)
    c = pl.program_id(2)
    halo = kh - 1
    w_lo = p0  # input columns land at scratch[:, p0 : p0 + W, :]

    # Zero the W-axis padding strips (and any alignment tail).
    if w_lo > 0:
        scratch[:, 0:w_lo, :] = jnp.zeros_like(scratch[:, 0:w_lo, :])
    if scratch.shape[1] > w_lo + W:
        scratch[:, w_lo + W :, :] = jnp.zeros_like(scratch[:, w_lo + W :, :])

    first = h == 0
    last = h == n_h_tiles - 1

    # Valid input rows for this tile: [h*T - p0, h*T - p0 + T + halo).
    # Top tile misses p0 rows at the start; bottom tile misses p1 at the end.
    def dma(rows_off_scratch, row_start, n_rows):
        cp = pltpu.make_async_copy(
            x_hbm.at[n, pl.ds(row_start, n_rows), :, pl.ds(c * _C_TILE, _C_TILE)],
            scratch.at[pl.ds(rows_off_scratch, n_rows), pl.ds(w_lo, W), :],
            sem,
        )
        cp.start()
        cp.wait()

    if n_h_tiles == 1:
        # Single tile: zero both row borders, copy all H rows.
        if p0 > 0:
            scratch[0:p0, :, :] = jnp.zeros_like(scratch[0:p0, :, :])
        if T + halo > p0 + H:
            scratch[p0 + H :, :, :] = jnp.zeros_like(scratch[p0 + H :, :, :])
        dma(p0, 0, H)
    else:

        @pl.when(first)
        def _():
            if p0 > 0:
                scratch[0:p0, :, :] = jnp.zeros_like(scratch[0:p0, :, :])
            dma(p0, 0, T + halo - p0)

        @pl.when(last)
        def _():
            if p1 > 0:
                scratch[T + halo - p1 :, :, :] = jnp.zeros_like(
                    scratch[T + halo - p1 :, :, :]
                )
            dma(0, h * T - p0, T + halo - p1)

        @pl.when(jnp.logical_and(jnp.logical_not(first), jnp.logical_not(last)))
        def _():
            dma(0, h * T - p0, T + halo)

    acc = jnp.zeros((T, OW, _C_TILE), scratch.dtype)
    for i in range(kh):
        for j in range(kw):
            acc = acc + float(kf[i][j]) * scratch[i : i + T, j : j + OW, :]
    o_ref[0, :, :, :] = acc


@functools.partial(
    jax.jit, static_argnames=("kf", "p0", "p1")
)
def _blur_pallas(x, kf: Tuple[Tuple[float, ...], ...], p0: int, p1: int):
    n, h, w, c = x.shape
    kh = len(kf)
    kw = len(kf[0])
    oh = h + p0 + p1 - kh + 1
    ow = w + p0 + p1 - kw + 1
    halo = kh - 1

    # Row tile: divide OH evenly; keep scratch ~<= 4MB.
    T = oh
    max_rows = max(8, (4 * 1024 * 1024) // ((w + 8) * _C_TILE * x.dtype.itemsize))
    for cand in range(min(oh, max_rows), 0, -1):
        if oh % cand == 0:
            T = cand
            break
    n_h_tiles = oh // T
    w_pad = _round_up(w + p0 + p1, 8)

    body = functools.partial(
        _blur_kernel_body,
        kf=kf,
        T=T,
        H=h,
        W=w,
        OW=ow,
        p0=p0,
        p1=p1,
        kh=kh,
        kw=kw,
        n_h_tiles=n_h_tiles,
    )
    return pl.pallas_call(
        body,
        grid=(n, n_h_tiles, c // _C_TILE),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, T, ow, _C_TILE),
            lambda n_, h_, c_: (n_, h_, 0, c_),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, oh, ow, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((T + halo, w_pad, _C_TILE), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=_interpret(),
    )(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def blur_pallas(x, kf, p0: int, p1: int):
    """Blur (up=down=1) via the Pallas kernel.  kf: nested tuple kernel
    (NOT flipped; flipping happens here to match true convolution)."""
    kflip = tuple(tuple(reversed(row)) for row in reversed(kf))
    return _blur_pallas(x, kflip, p0, p1)


def _blur_fwd(x, kf, p0, p1):
    return blur_pallas(x, kf, p0, p1), None


def _blur_bwd(kf, p0, p1, _, g):
    kh = len(kf)
    kw = len(kf[0])
    # Adjoint: correlate grad with the kernel (un-flipped) and complementary
    # pads (kh-1-p0, kw-1-p1) — the reference's UpFirDn2dBackward for
    # up=down=1 (op/upfirdn2d.py:120-151).
    kflip = tuple(tuple(reversed(row)) for row in reversed(kf))
    dx = blur_pallas(g, kflip, kh - 1 - p0, kw - 1 - p1)
    return (dx,)


blur_pallas.defvjp(_blur_fwd, _blur_bwd)


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
    """Dispatch supported configs to Pallas; None -> XLA fallback."""
    if (up_x, up_y, down_x, down_y) != (1, 1, 1, 1):
        return None
    if (pad_x0, pad_x1) != (pad_y0, pad_y1):
        return None
    n, h, w, c = x.shape
    if c % _C_TILE != 0:
        return None
    kh, kw = kernel.shape
    if kh != kw or kh > 8:
        return None
    if pad_y0 < 0 or pad_y1 < 0 or pad_y0 >= kh or pad_y1 >= kh:
        return None
    if h + pad_y0 + pad_y1 - kh + 1 <= 0:
        return None
    # Kernel values must be static for the shifted-multiply-add unrolling
    # (blur kernels are module constants; traced kernels fall back).
    try:
        kernel_np = np.asarray(jax.lax.stop_gradient(kernel))
    except Exception:
        return None
    kf = tuple(tuple(float(v) for v in row) for row in kernel_np)
    return blur_pallas(x, kf, int(pad_y0), int(pad_y1))
