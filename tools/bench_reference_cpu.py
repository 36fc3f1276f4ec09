"""Measured reference baseline: same-host CPU-vs-CPU throughput.

BASELINE.md's contract requires measured numbers from THIS harness on both
sides.  No A100 exists in this environment, but the reference stack runs
CUDA-free through its own documented CPU-fallback semantics
(/root/reference/op/fused_act.py:113-128, op/upfirdn2d.py:168-209 — the same
stub the golden-parity tests use), so the one ratio measurable here is
framework-vs-framework on identical hardware: the reference's torch
``Forward_Inference_3_Encoder`` (/root/reference/Util/network_util.py:293-338)
vs our jitted ``forward_3_encoder``, same batch/size/fp32, one CPU core.

Also measures ONE training iteration on each side when ``--train`` is given:
reference = D-step + G-step with the L1 reconstruction loss (the every-
iteration core of train_3_encoder.py:756-828, regularizers excluded on both
sides since they are cadenced); ours = the same two steps via Trainer.

Writes BASELINE_MEASURED.json at the repo root; bench.py picks it up to turn
``vs_baseline`` into a measured ratio instead of the historical A100 estimate.

Usage:
    python tools/bench_reference_cpu.py --side ref --batch 4 --iters 3
    python tools/bench_reference_cpu.py --side ours --batch 4 --iters 3
    python tools/bench_reference_cpu.py --merge   # combine side JSONs
Each side runs in its own interpreter so torch and jax never share the
process (thread pools + import-order effects would contaminate timings).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
OUT = os.path.join(REPO, "BASELINE_MEASURED.json")


def _side_path(side: str) -> str:
    return os.path.join(REPO, f".baseline_{side}.json")


def bench_ref(batch: int, size: int, iters: int, train: bool) -> dict:
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import types

    import torch

    from golden_utils import ref_stylegan2

    torch.manual_seed(0)
    res: dict = {"framework": "torch-cpu (reference)", "batch": batch,
                 "size": size}
    with ref_stylegan2(torch, with_network_util=True) as ns:
        sys.path.insert(0, REF)
        import psp_encoder_model.encoders.psp_encoders as ref_psp
        import resnet_encoder as ref_resnet

        # Exactly train_3_encoder.py:318-349's construction.
        e_tsr = ref_resnet.resnet18(tensor_encoding=True).eval()
        e_w = ref_resnet.resnet18(tensor_encoding=False).eval()
        opts = types.SimpleNamespace(input_nc=3, n_styles=14)
        e_w_plus = ref_psp.GradualStyleEncoder(18, "ir_se", opts).eval()
        g_ema = torch.nn.DataParallel(
            ns.sg2.Generator(size, 512, 8, channel_multiplier=2).eval()
        )
        fwd = ns.network_util.Forward_Inference_3_Encoder

        p = torch.randn(batch, 3, size, size)
        r = torch.randn(batch, 3, size, size)
        with torch.no_grad():
            fwd(p, r, e_tsr, e_w, e_w_plus, g_ema)  # warmup
            times = []
            for _ in range(iters):
                t0 = time.perf_counter()
                out = fwd(p, r, e_tsr, e_w, e_w_plus, g_ema)
                float(out.sum())
                times.append(time.perf_counter() - t0)
        res["inference_s_per_iter"] = statistics.median(times)
        res["inference_img_per_s"] = batch / res["inference_s_per_iter"]
        print(f"[ref] inference: {res['inference_s_per_iter']:.2f}s/iter "
              f"({res['inference_img_per_s']:.3f} img/s)", file=sys.stderr)

        if train:
            # Core every-iteration training work (train_3_encoder.py:756-828
            # minus the cadenced R1/PPL regularizers): D step on (real, fake)
            # + G step with softplus NSGAN loss + L1 recon, Adam updates.
            from stylegan2 import Discriminator  # via ref_stylegan2 ctx

            d = Discriminator(size).train()
            for m in (e_tsr, e_w, e_w_plus, g_ema):
                m.train()
            g_params = (
                list(g_ema.parameters()) + list(e_tsr.parameters())
                + list(e_w.parameters()) + list(e_w_plus.parameters())
            )
            opt_g = torch.optim.Adam(g_params, lr=2e-3, betas=(0.0, 0.99))
            opt_d = torch.optim.Adam(d.parameters(), lr=2e-3,
                                     betas=(0.0, 0.99))
            F = torch.nn.functional

            def one_iter():
                fake = fwd(p, r, e_tsr, e_w, e_w_plus, g_ema)
                d_loss = (F.softplus(d(fake.detach())).mean()
                          + F.softplus(-d(p)).mean())
                opt_d.zero_grad(); d_loss.backward(); opt_d.step()
                fake = fwd(p, r, e_tsr, e_w, e_w_plus, g_ema)
                g_loss = (F.softplus(-d(fake)).mean()
                          + F.l1_loss(fake, p))
                opt_g.zero_grad(); g_loss.backward(); opt_g.step()

            one_iter()  # warmup
            times = []
            for _ in range(max(1, iters // 2)):
                t0 = time.perf_counter()
                one_iter()
                times.append(time.perf_counter() - t0)
            res["train_s_per_iter"] = statistics.median(times)
            res["train_img_per_s"] = batch / res["train_s_per_iter"]
            print(f"[ref] train: {res['train_s_per_iter']:.2f}s/iter "
                  f"({res['train_img_per_s']:.3f} img/s)", file=sys.stderr)
    return res


def bench_ours(batch: int, size: int, iters: int, train: bool) -> dict:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import numpy as np

    assert jax.default_backend() == "cpu", jax.default_backend()
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(REPO, ".cache", "jax"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fm3dgan.pipeline import FaceManipulator, forward_3_encoder

    res: dict = {"framework": "fm3dgan jax-cpu", "batch": batch, "size": size}
    models = FaceManipulator.create(size=size, input_size=size)
    variables = models.init_variables_fast(seed=0)

    @jax.jit
    def step(variables, photo, render):
        img, _ = forward_3_encoder(models, variables, photo, render)
        return img

    rng = np.random.RandomState(0)
    p = rng.uniform(-1, 1, (batch, size, size, 3)).astype(np.float32)
    r = rng.uniform(-1, 1, (batch, size, size, 3)).astype(np.float32)
    step(variables, p, r).block_until_ready()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        step(variables, p, r).block_until_ready()
        times.append(time.perf_counter() - t0)
    res["inference_s_per_iter"] = statistics.median(times)
    res["inference_img_per_s"] = batch / res["inference_s_per_iter"]
    print(f"[ours] inference: {res['inference_s_per_iter']:.2f}s/iter "
          f"({res['inference_img_per_s']:.3f} img/s)", file=sys.stderr)

    if train:
        from fm3dgan.train import TrainConfig, Trainer

        # Match the reference leg: D step + G step with L1 only (the
        # cadenced R1/PPL regularizers excluded on BOTH sides).
        cfg = TrainConfig(
            size=size, rec_batch=batch, ds_batch=batch,
            ds_freq=1_000_000, d_reg_every=1_000_000,
            g_reg_every=1_000_000, lpips_loss_lambda=0.0,
            face_id_loss_lambda=0.0, rec_face_reg_loss_lambda=0.0,
            ds_face_reg_loss_lambda=0.0, ep_face_reg_loss_lambda=0.0,
        )
        trainer = Trainer(cfg, seed=0, mesh=None, use_lpips=False,
                          use_arcface=False, input_size=size)
        ref_im = rng.uniform(-1, 1, (batch, size, size, 3)).astype(np.float32)
        trainer.train_iteration(0, p, r, ref_im, fused=False)  # warmup
        times = []
        for i in range(max(1, iters // 2)):
            t0 = time.perf_counter()
            trainer.train_iteration(i + 1, p, r, ref_im, fused=False)
            times.append(time.perf_counter() - t0)
        res["train_s_per_iter"] = statistics.median(times)
        res["train_img_per_s"] = batch / res["train_s_per_iter"]
        print(f"[ours] train: {res['train_s_per_iter']:.2f}s/iter "
              f"({res['train_img_per_s']:.3f} img/s)", file=sys.stderr)
    return res


def merge() -> None:
    with open(_side_path("ref")) as f:
        ref = json.load(f)
    with open(_side_path("ours")) as f:
        ours = json.load(f)
    rec = {
        "protocol": (
            "Forward_Inference_3_Encoder (reference torch, shipped CPU-"
            "fallback op semantics) vs fm3dgan forward_3_encoder (jax cpu), "
            "identical batch/size/fp32, one host CPU core; train = D step + "
            "G step with L1 recon, regularizers excluded on both sides"
        ),
        "host": os.uname().nodename,
        "date": time.strftime("%Y-%m-%d"),
        "reference": ref,
        "ours": ours,
        "cpu_speedup_inference": round(
            ours["inference_img_per_s"] / ref["inference_img_per_s"], 3
        ),
    }
    if "train_img_per_s" in ref and "train_img_per_s" in ours:
        rec["cpu_speedup_train"] = round(
            ours["train_img_per_s"] / ref["train_img_per_s"], 3
        )
    with open(OUT, "w") as f:
        json.dump(rec, f, indent=2)
        f.write("\n")
    print(json.dumps(rec, indent=2))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", choices=["ref", "ours", "all"], default="all")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--merge", action="store_true")
    args = ap.parse_args()

    if args.merge:
        merge()
        return
    if args.side == "all":
        # Fresh interpreter per side: torch and jax must not share a process.
        # The jax side must run under the scrubbed env — a plain
        # JAX_PLATFORMS=cpu is defeated by this container's axon
        # sitecustomize and the "cpu" benchmark silently crawls over the
        # remote TPU tunnel (verify SKILL.md).
        sys.path.insert(0, REPO)
        from __graft_entry__ import scrubbed_cpu_env

        for side in ("ref", "ours"):
            cmd = [sys.executable, os.path.abspath(__file__), "--side", side,
                   "--batch", str(args.batch), "--size", str(args.size),
                   "--iters", str(args.iters)]
            if args.train:
                cmd.append("--train")
            env = None
            if side == "ours":
                env = scrubbed_cpu_env(1)
                # Full XLA optimization for the throughput measurement
                # (scrubbed_cpu_env pins LLVM -O0 for the dryrun's
                # compile-bound use case; here compile time is excluded
                # and runtime speed is the metric).
                env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
            subprocess.run(cmd, check=True, cwd=REPO, env=env)
        merge()
        return

    fn = bench_ref if args.side == "ref" else bench_ours
    rec = fn(args.batch, args.size, args.iters, args.train)
    with open(_side_path(args.side), "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec))


if __name__ == "__main__":
    sys.path.insert(0, REPO)
    main()
