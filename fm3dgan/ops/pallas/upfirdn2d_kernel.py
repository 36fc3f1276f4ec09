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


# ---------------------------------------------------------------------------
# up=2 / down=2 resampling kernels (the remaining CUDA fast-path modes,
# op/upfirdn2d_kernel.cu:250-309) — separable kernels only (StyleGAN2's
# [1,3,3,1] outer product is rank-1).
#
# Polyphase formulation: for up=2 each output phase a in {0,1} is a small
# shifted-MAD filter over the UN-stuffed input (2 taps/axis for k=4) — no
# zero-stuffed intermediate, no wasted MACs on structural zeros (the XLA
# fallback convolves the dilated input with the full k*k kernel, doing 4x
# the arithmetic).  For down=2 the stride-2 decimation happens at read time
# via an even/odd reshape view — no full-rate intermediate is written.
# ---------------------------------------------------------------------------


def _pick_tile(total: int, limit: int) -> int:
    """Largest divisor of `total` that is <= limit (1 if none)."""
    for cand in range(min(total, limit), 0, -1):
        if total % cand == 0:
            return cand
    return 1


def _max_rows_for(w: int, itemsize: int, per_out_row: int) -> int:
    """Row-tile budget keeping each of the 2 scratch slots ~<= 2MB."""
    return max(
        2 if per_out_row > 1 else 4,
        (2 * 1024 * 1024) // (per_out_row * (w + 8) * _C_TILE * itemsize),
    )


def _phase_taps(k1d, up: int, p0: int):
    """For output phase a in [0, up): list of (input offset, weight).

    out[up*y + a] = sum_t k1d_flipped[t] * z[up*y + a - p0 + t] with
    z[up*i] = x[i]: taps where (a - p0 + t) % up == 0 hit x[y + (a-p0+t)//up].
    """
    k = len(k1d)
    kf = tuple(reversed(tuple(k1d)))  # true convolution
    phases = []
    for a in range(up):
        taps = []
        for t in range(k):
            idx = a - p0 + t
            if idx % up == 0:
                taps.append((idx // up, float(kf[t])))
        phases.append(taps)
    return phases


def _updown_body(
    x_hbm, o_ref, scratch, sems, *,
    mode, taps_r, taps_c, T, H, W, OT, OW,
    omin_r, omax_r, omin_c, row_step,
    n_h_tiles, n_c_tiles, n_steps,
):
    """Shared body for the up2/down2 kernels.

    mode: 'up2' (T input rows -> OT=2T output rows) or 'down2'
    (OT output rows read row_step*OT + span input rows).
    Scratch row r holds input row (tile_row_lo + r); scratch col j holds
    input col (j + omin_c); out-of-range rows/cols are zeroed.
    row_step: input rows consumed per output row block (1 for up2, 2 down2).
    """
    g = pl.program_id(0)
    R = scratch.shape[1]  # rows per slot
    Wp = scratch.shape[2]
    n_valid_c = W  # input cols
    c_span = Wp  # padded

    def coords(step):
        c = step % n_c_tiles
        h = (step // n_c_tiles) % n_h_tiles
        n = step // (n_c_tiles * n_h_tiles)
        return n, h, c

    def row_lo(h):
        # Global input row held in scratch row 0 for tile h (static per branch
        # only through first/last flags; value itself is traced).
        return h * (T * row_step if mode == "down2" else T) + omin_r

    # Number of clamped rows at the head of the first tile / tail of the last.
    head_clip = max(0, -omin_r)
    tail_rows_last = (
        H - ((n_h_tiles - 1) * (T * row_step if mode == "down2" else T) + omin_r)
    )
    tail_clip = max(0, R - tail_rows_last)

    def issue_or_wait(step, slot, start: bool):
        n, h, c = coords(step)
        sl = scratch.at[slot]
        lo = row_lo(h)

        def go(rows_off, row_start, n_rows, lanes):
            cp = pltpu.make_async_copy(
                x_hbm.at[
                    n, pl.ds(row_start, n_rows), :,
                    pl.ds(c * _C_TILE, lanes),
                ],
                sl.at[
                    pl.ds(rows_off, n_rows), pl.ds(-omin_c, W), pl.ds(0, lanes)
                ],
                sems.at[slot],
            )
            cp.start() if start else cp.wait()

        def zero_borders():
            # Cols outside [0, W) and (when lanes are partial) nothing extra —
            # garbage lanes are masked by the output block write.
            if -omin_c > 0:
                sl[:, 0 : -omin_c, :] = jnp.zeros_like(sl[:, 0 : -omin_c, :])
            if Wp > W - omin_c:
                sl[:, W - omin_c :, :] = jnp.zeros_like(sl[:, W - omin_c :, :])

        def branches(lanes):
            first = h == 0
            last = h == n_h_tiles - 1
            if n_h_tiles == 1:
                if start:
                    zero_borders()
                    if head_clip > 0:
                        sl[0:head_clip, :, :] = jnp.zeros_like(
                            sl[0:head_clip, :, :]
                        )
                    if tail_clip > 0:
                        sl[R - tail_clip :, :, :] = jnp.zeros_like(
                            sl[R - tail_clip :, :, :]
                        )
                go(head_clip, 0, R - head_clip - tail_clip, lanes)
                return

            @pl.when(first)
            def _():
                if start:
                    zero_borders()
                    if head_clip > 0:
                        sl[0:head_clip, :, :] = jnp.zeros_like(
                            sl[0:head_clip, :, :]
                        )
                go(head_clip, 0, R - head_clip, lanes)

            @pl.when(last)
            def _():
                if start:
                    zero_borders()
                    if tail_clip > 0:
                        sl[R - tail_clip :, :, :] = jnp.zeros_like(
                            sl[R - tail_clip :, :, :]
                        )
                go(0, lo, R - tail_clip, lanes)

            @pl.when(jnp.logical_and(~first, ~last))
            def _():
                if start:
                    zero_borders()
                go(0, lo, R, lanes)

        # Lanes are always full tiles: the wrapper zero-pads C to a multiple
        # of _C_TILE (Mosaic requires HBM slices lane-aligned to 128).
        branches(_C_TILE)

    slot = jax.lax.rem(g, 2)
    nxt = jax.lax.rem(g + 1, 2)

    @pl.when(g == 0)
    def _():
        issue_or_wait(g, slot, True)

    @pl.when(g + 1 < n_steps)
    def _():
        issue_or_wait(g + 1, nxt, True)

    issue_or_wait(g, slot, False)

    s0 = scratch.at[slot]
    C = _C_TILE
    if mode == "up2":
        # Rows pass per output phase, then interleave along the leading axis.
        ph_rows = []
        for taps in taps_r:
            acc = jnp.zeros((T, Wp, C), o_ref.dtype)
            for o, wgt in taps:
                acc = acc + wgt * s0[o - omin_r : o - omin_r + T, :, :]
            ph_rows.append(acc)
        r2 = jnp.stack(ph_rows, axis=1).reshape(2 * T, Wp, C)
        # Cols pass per phase, interleave along sublanes.
        OWh = OW // 2
        ph_cols = []
        for taps in taps_c:
            acc = jnp.zeros((2 * T, OWh, C), o_ref.dtype)
            for o, wgt in taps:
                acc = acc + wgt * r2[:, o - omin_c : o - omin_c + OWh, :]
            ph_cols.append(acc)
        out = jnp.stack(ph_cols, axis=2).reshape(2 * T, OW, C)
        o_ref[0, :, :, :] = out
    else:  # down2
        (taps,) = taps_r  # single phase
        tmp = jnp.zeros((OT, Wp, C), o_ref.dtype)
        for t, wgt in taps:
            # rows t, t+2, ..., t+2(OT-1): even-phase view of a 2*OT window.
            v = s0[t : t + 2 * OT, :, :].reshape(OT, 2, Wp, C)[:, 0]
            tmp = tmp + wgt * v
        (ctaps,) = taps_c
        acc = jnp.zeros((OT, OW, C), o_ref.dtype)
        for u, wgt in ctaps:
            v = tmp[:, u : u + 2 * OW, :].reshape(OT, OW, 2, C)[:, :, 0, :]
            acc = acc + wgt * v
        o_ref[0, :, :, :] = acc


def _updown_pallas(x, kcol, krow, up: int, down: int, p0: int, p1: int):
    """Separable 2x resample (up=2,down=1) or (up=1,down=2); the 2-D FIR
    kernel is outer(kcol, krow)."""
    n, h, w, c = x.shape
    k = len(kcol)
    assert len(krow) == k
    oh = (h * up + p0 + p1 - k) // down + 1
    ow = (w * up + p0 + p1 - k) // down + 1

    if up == 2:
        taps_r = _phase_taps(kcol, 2, p0)
        taps_c = _phase_taps(krow, 2, p0)
        offs = [o for ph in taps_r + taps_c for (o, _) in ph]
        omin_r, omax_r = min(offs), max(offs)
        # Tile over input rows; each tile of T input rows yields 2T out rows.
        assert oh == 2 * h and ow == 2 * w, (oh, ow, h, w)
        mode = "up2"
        row_step = 1
        T = _pick_tile(h, _max_rows_for(w, x.dtype.itemsize, 1))
        n_h_tiles = h // T
        R = T + omax_r - omin_r
        OT = 2 * T
        omin_c = omin_r
        wp = _round_up(w + (omax_r - omin_r), 8)
    else:
        assert down == 2
        kfc = tuple(reversed(tuple(kcol)))
        kfr = tuple(reversed(tuple(krow)))
        mode = "down2"
        row_step = 2
        omin_r = -p0
        T = _pick_tile(oh, _max_rows_for(w, x.dtype.itemsize, 2))
        n_h_tiles = oh // T
        OT = T
        # Scratch rows: the taps reshape view needs t + 2*OT <= R.
        R = 2 * T + k - 1
        omin_c = -p0
        wp = _round_up(max(w + p0 + p1, k - 1 + 2 * ow, w) + 1, 8)
        taps_r = [[(t, float(kfc[t])) for t in range(k)]]
        taps_c = [[(t, float(kfr[t])) for t in range(k)]]
        omax_r = R + omin_r - 1  # unused beyond clamps
        # Middle/first tiles DMA R rows from row 2hT-p0; the worst overrun
        # past H is p1+1-2T rows (see tail_clip derivation in the body).
        assert n_h_tiles == 1 or 2 * T >= p1 + 1, (T, p1)

    # Zero-pad lanes to full 128-tiles: Mosaic rejects HBM slices whose lane
    # extent isn't 128-aligned, so partial-C DMAs can't exist in the kernel.
    c_pad = _round_up(c, _C_TILE)
    if c_pad != c:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, c_pad - c)))
    n_c_tiles = c_pad // _C_TILE
    n_steps = n * n_h_tiles * n_c_tiles

    body = functools.partial(
        _updown_body,
        mode=mode,
        taps_r=taps_r,
        taps_c=taps_c,
        T=T,
        H=h,
        W=w,
        OT=OT,
        OW=ow,
        omin_r=omin_r,
        omax_r=omax_r,
        omin_c=omin_c,
        row_step=row_step,
        n_h_tiles=n_h_tiles,
        n_c_tiles=n_c_tiles,
        n_steps=n_steps,
    )

    def out_index(g):
        c_ = g % n_c_tiles
        h_ = (g // n_c_tiles) % n_h_tiles
        n_ = g // (n_c_tiles * n_h_tiles)
        return (n_, h_, 0, c_)

    ot_block = OT if mode == "down2" else 2 * T
    out = pl.pallas_call(
        body,
        grid=(n_steps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, ot_block, ow, _C_TILE), out_index, memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, oh, ow, c_pad), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, R, wp, _C_TILE), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
    )(x)
    return out[..., :c] if c_pad != c else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6))
def resample2x_pallas(x, kcol, krow, up: int, down: int, p0: int, p1: int):
    """2x separable up/down resample via Pallas; true convolution with
    outer(kcol, krow)."""
    return _updown_pallas(x, kcol, krow, up, down, p0, p1)


def _resample_fwd(x, kcol, krow, up, down, p0, p1):
    return resample2x_pallas(x, kcol, krow, up, down, p0, p1), x.shape


def _resample_bwd(kcol, krow, up, down, p0, p1, in_shape, g):
    # Reference adjoint (op/upfirdn2d.py:120-151): flipped kernel, swapped
    # up/down, pads g0 = k - p0 - 1, g1 = in*up - out*down + p0 - up + 1.
    k = len(kcol)
    h = in_shape[1]
    oh = (h * up + p0 + p1 - k) // down + 1
    g0 = k - p0 - 1
    g1 = h * up - oh * down + p0 - up + 1
    dx = resample2x_pallas(
        g,
        tuple(reversed(tuple(kcol))),
        tuple(reversed(tuple(krow))),
        down,
        up,
        g0,
        g1,
    )
    return (dx,)


resample2x_pallas.defvjp(_resample_fwd, _resample_bwd)


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
    """Dispatch supported configs to Pallas; None -> XLA fallback.

    Covered modes (the CUDA fast-path set, op/upfirdn2d_kernel.cu:250-309):
      * up=down=1 blur, square kernel <= 8, C % 128 == 0
      * up=2 (separable kernel, out = 2*in per axis)
      * down=2 (separable kernel), any C (lanes padded/masked)
    """
    factors = (up_x, up_y, down_x, down_y)
    if factors not in ((1, 1, 1, 1), (2, 2, 1, 1), (1, 1, 2, 2)):
        return None
    if (pad_x0, pad_x1) != (pad_y0, pad_y1):
        return None
    n, h, w, c = x.shape
    kh, kw = kernel.shape
    if kh != kw or kh > 8:
        return None
    if pad_y0 < 0 or pad_y1 < 0:
        return None
    # Kernel values must be static for the shifted-multiply-add unrolling
    # (blur kernels are module constants; traced kernels fall back).
    try:
        kernel_np = np.asarray(jax.lax.stop_gradient(kernel))
    except Exception:
        return None

    p0, p1 = int(pad_y0), int(pad_y1)

    if factors == (1, 1, 1, 1):
        if c % _C_TILE != 0:
            return None
        if p0 >= kh or p1 >= kh:
            return None
        if h + p0 + p1 - kh + 1 <= 0:
            return None
        kf = tuple(tuple(float(v) for v in row) for row in kernel_np)
        return blur_pallas(x, kf, p0, p1)

    sep = _separate(kernel_np)
    if sep is None:
        return None
    kcol, krow = sep

    if factors == (2, 2, 1, 1):
        # The kernel tiles output rows 2:1 to input rows: exact 2x only.
        if p0 + p1 != kh - 1:
            return None
        offs = [
            o
            for ph in _phase_taps(kcol, 2, p0) + _phase_taps(krow, 2, p0)
            for (o, _) in ph
        ]
        T = _pick_tile(h, _max_rows_for(w, x.dtype.itemsize, 1))
        if h // T > 1 and (max(offs) > T or T + max(offs) - min(offs) > h):
            return None
    else:
        oh = (h + p0 + p1 - kh) // 2 + 1
        ow = (w + p0 + p1 - kw) // 2 + 1
        if oh <= 0 or ow <= 0:
            return None
        T = _pick_tile(oh, _max_rows_for(w, x.dtype.itemsize, 2))
        if oh // T > 1 and 2 * T < p1 + 1:
            return None
        # First-tile DMA reads 2T+kh-1-p0 rows from row 0.
        if oh // T > 1 and 2 * T + kh - 1 - p0 > h:
            return None
    up = 2 if factors[0] == 2 else 1
    down = 2 if factors[2] == 2 else 1
    return resample2x_pallas(x, kcol, krow, up, down, p0, p1)
