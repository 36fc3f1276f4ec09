"""Visual evaluation utilities.

Parity with /root/reference/Evaluation/visual_eval.py: tensor->image
conversion (:24-38), photo x render editing grids (Get_Batch_Eval_Result,
:120-142), and the GIF/video reanimation pipelines (:147-341) — one identity
photo re-rendered with a sequence of renders, or photo-sequence x
render-sequence video reconstruction.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import numpy as np


def tensor_to_image(arr) -> np.ndarray:
    """NHWC [-1,1] float -> uint8 (visual_eval.py:24-38)."""
    arr = np.asarray(arr)
    arr = (np.clip(arr, -1.0, 1.0) + 1.0) / 2.0
    return (arr * 255.0 + 0.5).clip(0, 255).astype(np.uint8)


def get_batch_eval_result(
    forward_fn: Callable,
    photos: np.ndarray,
    renders: np.ndarray,
) -> np.ndarray:
    """Editing grid (visual_eval.py:120-142): rows = photos, cols = renders;
    cell (i, j) = edit(photo_i, render_j).  Returns
    [n_photos, n_renders, H, W, 3] uint8."""
    n_p, n_r = photos.shape[0], renders.shape[0]
    rows = []
    for i in range(n_p):
        photo_rep = np.repeat(photos[i : i + 1], n_r, axis=0)
        out = forward_fn(photo_rep, renders)
        rows.append(tensor_to_image(out))
    return np.stack(rows)


def grid_to_image(grid: np.ndarray, pad: int = 2) -> np.ndarray:
    """[R, C, H, W, 3] uint8 -> one [R*(H+pad), C*(W+pad), 3] image."""
    r, c, h, w, _ = grid.shape
    canvas = np.zeros((r * (h + pad) + pad, c * (w + pad) + pad, 3), np.uint8)
    for i in range(r):
        for j in range(c):
            y = pad + i * (h + pad)
            x = pad + j * (w + pad)
            canvas[y : y + h, x : x + w] = grid[i, j]
    return canvas


def save_image(path: str, img: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(img).save(path)


def render_sequence_gif(
    forward_fn: Callable,
    photo: np.ndarray,
    render_frames: Sequence[np.ndarray],
    out_path: Optional[str] = None,
    duration_ms: int = 100,
) -> List[np.ndarray]:
    """One photo x a render GIF -> edited frame sequence
    (Test_Single_Factor_Editing / GIF pipeline, visual_eval.py:147-227)."""
    frames = []
    photo_b = photo[None] if photo.ndim == 3 else photo
    for r in render_frames:
        r_b = r[None] if r.ndim == 3 else r
        out = forward_fn(photo_b, r_b)
        frames.append(tensor_to_image(out)[0])
    if out_path is not None:
        from PIL import Image

        pil = [Image.fromarray(f) for f in frames]
        pil[0].save(
            out_path, save_all=True, append_images=pil[1:],
            duration=duration_ms, loop=0,
        )
    return frames


def video_reconstruction_reanimation(
    forward_fn: Callable,
    photo_frames: Sequence[np.ndarray],
    render_frames: Sequence[np.ndarray],
    out_path: Optional[str] = None,
    duration_ms: int = 100,
) -> List[np.ndarray]:
    """Photo GIF x render GIF video reconstruction/reanimation
    (Test_Video_Reconstruction_Reanimation, visual_eval.py:304-341)."""
    assert len(photo_frames) == len(render_frames)
    frames = []
    for p, r in zip(photo_frames, render_frames):
        out = forward_fn(p[None], r[None])
        frames.append(tensor_to_image(out)[0])
    if out_path is not None:
        from PIL import Image

        pil = [Image.fromarray(f) for f in frames]
        pil[0].save(
            out_path, save_all=True, append_images=pil[1:],
            duration=duration_ms, loop=0,
        )
    return frames


def load_gif_as_image_list(path: str, size: int = 256) -> List[np.ndarray]:
    """GIF -> list of NHWC [-1,1] frames (Load_GIF_As_Img_List,
    visual_eval.py:188-205)."""
    from PIL import Image, ImageSequence

    gif = Image.open(path)
    frames = []
    for frame in ImageSequence.Iterator(gif):
        f = frame.convert("RGB").resize((size, size), Image.BILINEAR)
        arr = np.asarray(f, np.float32) / 255.0 * 2.0 - 1.0
        frames.append(arr)
    return frames


# ------------------------------------------------------------------------
# Visual val-sample builders (visual_eval.py:40-83): fixed held-out sets the
# in-training sample grids render from, instead of the current train batch.
# ------------------------------------------------------------------------


def get_real_img_val_sample(
    real_img_val_list: Sequence[str],
    num_faces: int,
    size: int = 256,
    rng: Optional[np.random.RandomState] = None,
) -> List[np.ndarray]:
    """Real-image val samples from .npy bundles
    (Get_Real_Img_Val_Sample, visual_eval.py:40-56).

    Each bundle (built by visual_test_img_generation.py:73-76) stacks
    [real img, own render, edit render 1..4] as uint8 HWC frames.  Returns a
    flat [photo, own render, one random edit render] triple per chosen
    bundle, as [1,H,W,3] float arrays in [-1,1].
    """
    rng = rng or np.random.RandomState()
    chosen = rng.choice(
        np.asarray(real_img_val_list), size=num_faces, replace=False
    )
    out: List[np.ndarray] = []
    for path in chosen:
        frames = list(np.load(path))
        test_set = frames[:2] + [frames[2:][rng.randint(len(frames) - 2)]]
        for img in test_set:
            arr = _to_normalized(img, size)
            out.append(arr[None])
    return out


def get_syn_img_val_sample(
    synface_dataset,
    num_faces: int,
    n_img_per_id: int = 7,
    rng: Optional[np.random.RandomState] = None,
) -> List[np.ndarray]:
    """Synthetic-identity val samples (Get_Syn_Img_Val_Sample,
    visual_eval.py:59-83): per sampled identity, [gan img, own render,
    another variation's render] from a SyntheticPairDataset."""
    rng = rng or np.random.RandomState()
    num_id = len(synface_dataset) // n_img_per_id
    load_idx: List[int] = []
    for person_id in rng.choice(num_id, num_faces):
        idx = person_id * n_img_per_id + rng.choice(n_img_per_id, num_faces)
        load_idx += list(idx)
    out: List[np.ndarray] = []
    for i, idx in enumerate(load_idx):
        g_img, r_img = synface_dataset[int(idx)]
        if i % 2 == 0:
            out += [np.asarray(g_img)[None], np.asarray(r_img)[None]]
        else:
            out += [np.asarray(r_img)[None]]
    return out


def _to_normalized(img: np.ndarray, size: int) -> np.ndarray:
    """uint8 HWC -> [-1,1] float HWC at the given size."""
    from PIL import Image

    pil = Image.fromarray(np.asarray(img, np.uint8)).resize(
        (size, size), Image.BILINEAR
    )
    return np.asarray(pil, np.float32) / 255.0 * 2.0 - 1.0


def get_val_sample_grid(
    forward_fn: Callable, val_sets: Sequence[np.ndarray], set_len: int = 3
) -> np.ndarray:
    """Fixed-val-set grid (Get_Batch_Eval_Result over VAL_SET_LEN groups,
    visual_eval.py:120-142): for each [photo, render_1, render_2, ...] group
    of set_len entries, rows = [photo, render_i, edit(photo, render_i)...].
    Returns [n_sets, 1 + 2*(set_len-1), H, W, 3] uint8."""
    n_sets = len(val_sets) // set_len
    rows = []
    for i in range(n_sets):
        group = val_sets[i * set_len : (i + 1) * set_len]
        photo, renders = group[0], group[1:]
        cells = [tensor_to_image(photo)[0]]
        for r in renders:
            cells.append(tensor_to_image(r)[0])
            out = forward_fn(photo, r)
            cells.append(tensor_to_image(out)[0])
        rows.append(np.stack(cells))
    return np.stack(rows)
