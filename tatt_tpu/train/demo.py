"""Demo + visualization utilities.

Rebuilds:
  - ``TextSR.demo`` (``interfaces/super_resolution.py:1788-1876``): run SR
    over a directory of images, print LR->SR predictions + fps.
  - ``tripple_display`` (``interfaces/base.py:565-619``): LR/SR/HR triptych
    dumps for qualitative inspection.
"""

from __future__ import annotations

import os
import time
from typing import Callable

import numpy as np
from PIL import Image

from tatt_tpu.data.collate import resize_normalize


def _to_pil(chw: np.ndarray) -> Image.Image:
    rgb = np.clip(chw[:3].transpose(1, 2, 0) * 255.0, 0, 255).astype(np.uint8)
    return Image.fromarray(rgb)


def triptych(
    lr: np.ndarray, sr: np.ndarray, hr: np.ndarray, out_path: str
) -> None:
    """Stack LR (upscaled), SR, HR vertically into one PNG."""
    h, w = hr.shape[-2:]
    lr_img = _to_pil(lr).resize((w, h), Image.BICUBIC)
    sr_img = _to_pil(sr)
    hr_img = _to_pil(hr)
    canvas = Image.new("RGB", (w, h * 3))
    for i, im in enumerate((lr_img, sr_img, hr_img)):
        canvas.paste(im, (0, i * h))
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    canvas.save(out_path)


def attention_grid(
    pr_weights: np.ndarray,
    lr_image: np.ndarray,
    out_path: str,
    feat_hw: tuple[int, int] = (16, 64),
    grid: tuple[int, int] = (8, 4),
) -> None:
    """TP-Interpreter attention visualization: one tile per text slot,
    mirroring the reference's debug dump (``super_resolution.py:925-1020``).

    ``pr_weights``: [HW, T] attention of one sample; ``lr_image``: [C,h,w].
    """
    h_tiles, w_tiles = grid
    fh, fw = feat_hw
    canvas = np.full(((fh + 1) * h_tiles, (fw + 1) * w_tiles), 255, np.uint8)
    t = 0
    for i in range(h_tiles):
        for j in range(w_tiles):
            if t >= pr_weights.shape[-1]:
                break
            att = pr_weights[:, t].reshape(fh, fw)
            att = att / (att.max() + 1e-10)
            canvas[
                i * (fh + 1) : i * (fh + 1) + fh,
                j * (fw + 1) : j * (fw + 1) + fw,
            ] = (att * 255).astype(np.uint8)
            t += 1
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    Image.fromarray(canvas).save(out_path)


def run_demo(
    demo_dir: str,
    sr_fn: Callable[[np.ndarray], np.ndarray],
    judge_fn: Callable[[np.ndarray], list[str]],
    out_dir: str,
    width: int = 128,
    height: int = 32,
    scale: int = 2,
    mask: bool = True,
    log=print,
) -> dict:
    """``sr_fn``: batch [N,C,h,w] -> [N,C,H,W]; ``judge_fn``: images -> text."""
    names = sorted(
        f
        for f in os.listdir(demo_dir)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp"))
    )
    os.makedirs(out_dir, exist_ok=True)
    n_done = 0
    t0 = time.time()
    results = []
    for name in names:
        img = Image.open(os.path.join(demo_dir, name)).convert("RGB")
        lr = resize_normalize(img, (width // scale, height // scale), mask)[None]
        sr = np.asarray(sr_fn(lr))
        pred_lr = judge_fn(lr)[0]
        pred_sr = judge_fn(sr)[0]
        _to_pil(sr[0]).save(os.path.join(out_dir, name))
        results.append({"image": name, "pred_lr": pred_lr, "pred_sr": pred_sr})
        log(f"{name}: LR='{pred_lr}' -> SR='{pred_sr}'")
        n_done += 1
    dt = time.time() - t0
    fps = n_done / dt if dt > 0 else 0.0
    log(f"demo: {n_done} images, fps={fps:.2f}")
    return {"results": results, "fps": fps}
