"""Training-log analysis and checkpoint->model builders.

Counterpart of /root/reference/Util/analysis_util.py: the reference parses
free-text log lines into loss curves (:24-132) and rebuilds inference stacks
from checkpoint dicts (:135-243).  Here logs are JSONL so parsing is a
one-liner, and checkpoints are Orbax train states.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np


def load_training_log(path: str) -> List[Dict[str, Any]]:
    """Read a training_log.jsonl into a list of per-iteration dicts."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


def metric_curve(
    log: List[Dict[str, Any]], key: str, smooth: int = 1
) -> Tuple[np.ndarray, np.ndarray]:
    """(iters, values) for one metric; optional moving-average smoothing
    (the reference's curve extraction, analysis_util.py:59-132)."""
    iters = np.asarray([r["iter"] for r in log if key in r])
    vals = np.asarray([float(r[key]) for r in log if key in r])
    if smooth > 1 and len(vals) >= smooth:
        kernel = np.ones(smooth) / smooth
        vals = np.convolve(vals, kernel, mode="valid")
        iters = iters[smooth - 1 :]
    return iters, vals


def build_manipulator_from_checkpoint(
    ckpt_dir: str, step: int, use_ema: bool = True
):
    """Rebuild (models, variables) for inference from a Trainer checkpoint
    (counterpart of Model_Building_Func_3_Encoder, analysis_util.py:204-243).

    Returns (FaceManipulator, variables-dict, meta-dict)."""
    import jax
    import orbax.checkpoint as ocp

    from fm3dgan.pipeline.forward import FaceManipulator
    from fm3dgan.train.config import TrainConfig
    from fm3dgan.train.loop import Trainer

    with open(os.path.join(ckpt_dir, f"{step:06d}.json")) as f:
        meta = json.load(f)
    cfg = TrainConfig(
        size=meta["size"],
        tsr_encode=meta["tsr_encode"],
        use_tanh=meta["use_tanh"],
        w_plus_sliced_layer=(
            tuple(meta["sliced_layer"]) if meta["sliced_layer"] else None
        ),
    )
    trainer = Trainer(
        cfg, use_lpips=False, use_arcface=False,
        input_size=meta.get("input_size"),
    )
    trainer.load_checkpoint(ckpt_dir, step)
    state = trainer.state
    g_params = state.g_ema_params if use_ema else state.params["g"]
    variables = {
        "g": {"params": g_params, **state.stats["g"]},
        "e_tsr": {"params": state.params["e_tsr"], **state.stats["e_tsr"]},
        "e_w": {"params": state.params["e_w"], **state.stats["e_w"]},
        "e_w_plus": {
            "params": state.params["e_w_plus"],
            **state.stats["e_w_plus"],
        },
    }
    return trainer.models, variables, meta
