"""Training configuration.

One dataclass replacing the reference's two-level hyperparams-module +
argparse scheme (train_3_encoder_hyperparams.py:20-79 feeding
train_3_encoder.py:43-117) — and fixing its ``type=bool`` CLI pitfalls.
Defaults are the shipped 3-encoder config values.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

DATASET_TYPE = ("FFHQ", "Synthetic")
MODULATION_SPACE = ("W", "W+")


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    # Model (train_3_encoder_hyperparams.py:23-27)
    size: int = 256
    channel_multiplier: int = 2
    latent: int = 512
    n_mlp: int = 8
    use_separate_d: bool = True
    # Uniform width scale for G/D/encoders (smoke/dryrun knob; no reference
    # counterpart).  Sharding and step semantics are width-independent, so
    # tiny widths prove the multi-chip program at ~1/wm^2 the FLOPs and a
    # fraction of the XLA-CPU compile bill.  ``latent`` must be set to
    # 512*width_mult alongside (FaceManipulator.create asserts it).
    width_mult: float = 1.0

    # Encoders (train_3_encoder_hyperparams.py:29-37)
    tsr_encode: str = "Render Image"
    tsr_train: bool = True
    w_encode: str = "Render Image"
    w_train: bool = True
    w_plus_encode: str = "Photo Image"
    w_plus_encoder_layer_num: int = 18
    w_plus_sliced_layer: Optional[Tuple[int, ...]] = None
    w_plus_train: bool = True
    use_tanh: bool = False

    # Schedule (train_3_encoder_hyperparams.py:46-53)
    training_iters: int = 420_001
    ds_freq: int = 2  # 1 dual-supervision step every ds_freq iters
    ex_ds_freq: int = 3  # 1 extreme-DS step every ex_ds_freq DS steps
    rec_batch: int = 16
    ds_batch: int = 16
    lr: float = 1e-3

    # Regularizers (train_3_encoder_hyperparams.py:55-60)
    use_g_reg: bool = True
    g_reg_every: int = 4
    path_reg_weight: float = 2.0
    path_reg_batch_shrink: int = 2
    r1: float = 10.0
    d_reg_every: int = 16

    # Loss weights (train_3_encoder_hyperparams.py:62-71)
    lpips_loss_lambda: float = 3.0
    l1_loss_lambda: float = 3.0
    ep_lpips_l1_weight_shrink: float = 10.0
    face_id_loss_lambda: float = 30.0
    face_id_loss_type: str = "MSE"
    hmap_loss_lambda: float = 0.0
    hmap_iter_thres: float = math.inf
    rec_face_reg_loss_lambda: float = 0.0
    ds_face_reg_loss_lambda: float = 20.0
    ep_face_reg_loss_lambda: float = 100.0

    # EMA (train_3_encoder.py:776)
    ema_decay: float = 0.5 ** (32 / 10_000)

    # Eval / checkpoint cadence (train_3_encoder_hyperparams.py:73-79)
    model_save_freq: int = 10_000
    val_sample_freq: int = 1_000
    quant_eval_batch_size: int = 64

    # Precision / parallelism (TPU-native knobs; no reference counterpart)
    compute_dtype: str = "float32"  # or "bfloat16"
    data_axis: str = "data"
    # Rematerialization: recompute frozen-net (LPIPS/ArcFace/FAN) and
    # regularizer (R1/PPL double-backward) forward activations in the
    # backward pass instead of keeping them live — the frozen nets only need
    # input gradients, so storing their internals is pure HBM waste.  This
    # is what lets the R1/PPL iterations join the one-dispatch fused
    # iteration at bs16/256px (fuse_reg_iters).
    remat_frozen: bool = True
    remat_reg: bool = True
    # Auto-fuse threshold: run the whole iteration as ONE jitted dispatch
    # when per-chip img-equivalents (batch * (size/256)^2) <= this.  bs32
    # fused does NOT fit v5e HBM (measured 65MB over even with remat) — 16
    # is the v5e production setting.
    fuse_img_equiv_limit: int = 16
    # Fuse PPL regularizer iterations (every g_reg_every) into the single
    # dispatch too.  R1 iterations (every d_reg_every) get their own flag —
    # R1 fires only 1/16 iterations, so its dispatch saving is negligible.
    fuse_reg_iters: bool = True
    fuse_r1_iters: bool = False
    # (A remat_g_forward knob — two-segment encode/generate checkpointing of
    # the G step — was removed after measurement: it was SLOWER at bs16
    # (54.6 vs 62.8 img/s, BENCH_CAMPAIGN_r03.jsonl), still OOMed at
    # bs24/32, and segment-level jax.checkpoint cannot shrink the
    # within-segment backward peak that actually binds on v5e.  Frozen-net
    # and regularizer remat (above) are the knobs that pay.)
    # Use the SAME noise RNG for the D-step and G-step generator forwards
    # within an iteration.  The reference draws fresh noise for each
    # (train_3_encoder.py:460,507 both call Forward_Inference_3_Encoder);
    # with a shared key the two forwards are identical computations over the
    # same (unchanged) G/encoder params, so XLA CSEs the ~whole second
    # forward out of the fused one-dispatch program — a pure device-time
    # saving.  Off by default for exact reference-cadence parity; training
    # semantics with shared noise are otherwise standard GAN alternation.
    share_dg_noise: bool = False

    @property
    def g_reg_ratio(self) -> float:
        return self.g_reg_every / (self.g_reg_every + 1)

    @property
    def d_reg_ratio(self) -> float:
        return self.d_reg_every / (self.d_reg_every + 1)

    @property
    def n_latent(self) -> int:
        return 2 * int(math.log2(self.size)) - 2

    def is_ds_iter(self, i: int) -> bool:
        """ds_flag = (i % ds_freq == ds_freq - 1) (train_3_encoder.py:783)."""
        return i % self.ds_freq == self.ds_freq - 1

    def is_extreme_ds_iter(self, i: int) -> bool:
        """extreme_ds = (ds_count % ex_ds_freq == ex_ds_freq - 1) where
        ds_count is the number of earlier DS iters (train_3_encoder.py:783-789).
        """
        if not self.is_ds_iter(i):
            return False
        ds_count = i // self.ds_freq  # DS iters before this one
        return ds_count % self.ex_ds_freq == self.ex_ds_freq - 1

    # --- auto-fuse HBM heuristic, shared by Trainer and Trainer2 ---

    def fuse_fits_hbm(self, per_chip_imgs: int) -> bool:
        """One-dispatch iteration fits HBM at this per-chip load?

        Measured on v5e: bs32/256px fused is ~65MB over HBM even with
        remat_frozen/remat_reg, so the cap is ``fuse_img_equiv_limit``
        img-equivalents (batch * (size/256)^2); without both remat flags
        the cap is also 16.
        """
        limit = self.fuse_img_equiv_limit
        if not (self.remat_frozen and self.remat_reg):
            limit = min(limit, 16)
        return per_chip_imgs * self.size ** 2 <= limit * 256 ** 2

    def fuse_allows_regs(self, do_r1: bool, will_g_reg: bool) -> bool:
        """May this iteration's regularizers join the fused dispatch?

        PPL joins when fuse_reg_iters (needs remat_reg); R1 is gated
        separately by fuse_r1_iters (fusing it measured SLOWER — its
        in-program bloat outweighs 1/16-cadence dispatch savings).
        """
        if not self.fuse_reg_iters or not self.remat_reg:
            return not (do_r1 or will_g_reg)
        if not self.fuse_r1_iters:
            return not do_r1
        return True
