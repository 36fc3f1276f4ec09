"""Pallas TPU kernels for upfirdn2d hot modes.

TPU counterpart of the reference CUDA fast paths
(``/root/reference/op/upfirdn2d_kernel.cu:107-207``, mode dispatch ``:250-309``).

Implemented mode: blur (up=down=1, separable or small 2D kernel,
C % 128 == 0) — the dominant StyleGAN2 config (post-conv-transpose blur,
discriminator pre-conv blur).

Kernel structure:
  * 1-D grid over (N x row-tiles x C-tiles) with a DOUBLE-BUFFERED halo DMA
    pipeline: the copy for grid step g+1 is issued before computing step g,
    overlapping HBM reads with VPU work.
  * separable kernels (StyleGAN2's [1,3,3,1] outer product is rank-1) filter
    rows first — shifts along the leading (row) axis are free — then columns
    (kw sublane shifts), i.e. kh+kw shifted MADs instead of kh*kw.
  * edge zeroing reproduces the op's implicit zero padding.

Gradient: blur's adjoint is blur with the flipped kernel and complementary
pads (the reference's flip-kernel/swap-pad backward, op/upfirdn2d.py:120-151),
wired as a jax.custom_vjp.
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


def _separate(kf) -> Optional[Tuple[Tuple[float, ...], Tuple[float, ...]]]:
    """Rank-1 factorization kf = kcol (x) krow, or None."""
    a = np.asarray(kf, np.float64)
    if np.linalg.matrix_rank(a, tol=1e-9) != 1:
        return None
    u, s, vt = np.linalg.svd(a)
    kcol = u[:, 0] * s[0]
    krow = vt[0, :]
    if abs(kcol.sum()) > 1e-12:  # normalize sign for reproducibility
        if kcol.sum() < 0:
            kcol, krow = -kcol, -krow
    return tuple(float(v) for v in kcol), tuple(float(v) for v in krow)


def _blur_body(
    x_hbm, o_ref, scratch, sems, *,
    kf, sep, T, H, W, OW, p0, p1, kh, kw, n_h_tiles, n_c_tiles, n_steps,
):
    g = pl.program_id(0)
    halo = kh - 1
    rows = T + halo

    def coords(step):
        c = step % n_c_tiles
        h = (step // n_c_tiles) % n_h_tiles
        n = step // (n_c_tiles * n_h_tiles)
        return n, h, c

    def issue(step, slot):
        """Zero borders of `slot` and start its halo DMA."""
        n, h, c = coords(step)
        sl = scratch.at[slot]
        if p0 > 0:
            sl[:, 0:p0, :] = jnp.zeros_like(sl[:, 0:p0, :])
        if scratch.shape[2] > p0 + W:
            sl[:, p0 + W :, :] = jnp.zeros_like(sl[:, p0 + W :, :])

        def start(rows_off, row_start, n_rows):
            pltpu.make_async_copy(
                x_hbm.at[
                    n, pl.ds(row_start, n_rows), :, pl.ds(c * _C_TILE, _C_TILE)
                ],
                sl.at[pl.ds(rows_off, n_rows), pl.ds(p0, W), :],
                sems.at[slot],
            ).start()

        if n_h_tiles == 1:
            if p0 > 0:
                sl[0:p0, :, :] = jnp.zeros_like(sl[0:p0, :, :])
            if rows > p0 + H:
                sl[p0 + H :, :, :] = jnp.zeros_like(sl[p0 + H :, :, :])
            start(p0, 0, H)
        else:
            first = h == 0
            last = h == n_h_tiles - 1

            @pl.when(first)
            def _():
                if p0 > 0:
                    sl[0:p0, :, :] = jnp.zeros_like(sl[0:p0, :, :])
                start(p0, 0, T + halo - p0)

            @pl.when(last)
            def _():
                if p1 > 0:
                    sl[rows - p1 :, :, :] = jnp.zeros_like(sl[rows - p1 :, :, :])
                start(0, h * T - p0, T + halo - p1)

            @pl.when(jnp.logical_and(~first, ~last))
            def _():
                start(0, h * T - p0, T + halo)

    def wait(step, slot):
        n, h, c = coords(step)
        # Matching wait: the copy shape must match the started one.
        def w_(rows_off, row_start, n_rows):
            pltpu.make_async_copy(
                x_hbm.at[
                    n, pl.ds(row_start, n_rows), :, pl.ds(c * _C_TILE, _C_TILE)
                ],
                scratch.at[slot].at[pl.ds(rows_off, n_rows), pl.ds(p0, W), :],
                sems.at[slot],
            ).wait()

        if n_h_tiles == 1:
            w_(p0, 0, H)
        else:
            first = h == 0
            last = h == n_h_tiles - 1

            @pl.when(first)
            def _():
                w_(p0, 0, T + halo - p0)

            @pl.when(last)
            def _():
                w_(0, h * T - p0, T + halo - p1)

            @pl.when(jnp.logical_and(~first, ~last))
            def _():
                w_(0, h * T - p0, T + halo)

    slot = jax.lax.rem(g, 2)
    nxt = jax.lax.rem(g + 1, 2)

    @pl.when(g == 0)
    def _():
        issue(g, slot)

    @pl.when(g + 1 < n_steps)
    def _():
        issue(g + 1, nxt)

    wait(g, slot)

    s0 = scratch.at[slot]
    if sep is not None:
        kcol, krow = sep
        # Rows pass: shifts along the (free) leading axis.
        tmp = jnp.zeros((T, scratch.shape[2], _C_TILE), o_ref.dtype)
        for i in range(kh):
            tmp = tmp + float(kcol[kh - 1 - i]) * s0[i : i + T, :, :]
        # Cols pass: kw sublane shifts.
        acc = jnp.zeros((T, OW, _C_TILE), o_ref.dtype)
        for j in range(kw):
            acc = acc + float(krow[kw - 1 - j]) * tmp[:, j : j + OW, :]
    else:
        acc = jnp.zeros((T, OW, _C_TILE), o_ref.dtype)
        for i in range(kh):
            for j in range(kw):
                acc = acc + float(kf[kh - 1 - i][kw - 1 - j]) * s0[
                    i : i + T, j : j + OW, :
                ]
    o_ref[0, :, :, :] = acc


@functools.partial(jax.jit, static_argnames=("kf", "p0", "p1"))
def _blur_pallas(x, kf: Tuple[Tuple[float, ...], ...], p0: int, p1: int):
    """kf is the UNFLIPPED kernel; flipping is folded into the tap indexing
    (kf[kh-1-i]) inside the body, matching true convolution."""
    n, h, w, c = x.shape
    kh = len(kf)
    kw = len(kf[0])
    oh = h + p0 + p1 - kh + 1
    ow = w + p0 + p1 - kw + 1
    halo = kh - 1

    # Row tile: divide OH evenly; keep the two scratch slots ~<= 2x3MB.
    T = oh
    max_rows = max(8, (3 * 1024 * 1024) // ((w + 8) * _C_TILE * x.dtype.itemsize))
    for cand in range(min(oh, max_rows), 0, -1):
        if oh % cand == 0:
            T = cand
            break
    n_h_tiles = oh // T
    n_c_tiles = c // _C_TILE
    n_steps = n * n_h_tiles * n_c_tiles
    w_pad = _round_up(w + p0 + p1, 8)

    body = functools.partial(
        _blur_body,
        kf=kf,
        sep=_separate(kf),
        T=T,
        H=h,
        W=w,
        OW=ow,
        p0=p0,
        p1=p1,
        kh=kh,
        kw=kw,
        n_h_tiles=n_h_tiles,
        n_c_tiles=n_c_tiles,
        n_steps=n_steps,
    )

    def out_index(g):
        c_ = g % n_c_tiles
        h_ = (g // n_c_tiles) % n_h_tiles
        n_ = g // (n_c_tiles * n_h_tiles)
        return (n_, h_, 0, c_)

    return pl.pallas_call(
        body,
        grid=(n_steps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, T, ow, _C_TILE), out_index, memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, oh, ow, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, T + halo, w_pad, _C_TILE), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
    )(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def blur_pallas(x, kf, p0: int, p1: int):
    """Blur (up=down=1) via the Pallas kernel; true convolution with kf."""
    return _blur_pallas(x, kf, p0, p1)


def _blur_fwd(x, kf, p0, p1):
    return blur_pallas(x, kf, p0, p1), None


def _blur_bwd(kf, p0, p1, _, g):
    kh = len(kf)
    kw = len(kf[0])
    # Adjoint: convolution with the flipped kernel and complementary pads
    # (kh-1-p0, kw-1-p1) — the reference's UpFirDn2dBackward for up=down=1
    # (op/upfirdn2d.py:120-151).
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
