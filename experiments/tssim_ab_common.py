"""Shared fixture for the rotate+tssim stall A/B (VERDICT round-1 item #2).

Exports one fixed batch-32 of synthetic crops (4-channel: RGB + mask) that
both arms memorize:
  - experiments/tssim_ab_jax.py    — this framework, TPU
  - experiments/tssim_ab_torch.py  — the reference recipe in torch, CPU

PSNR convention shared by both arms: -10*log10(MSE) on the RGB channels
in [0, 1], eval-mode forward on the ORIGINAL (un-rotated) LR batch.
"""

import os

import numpy as np

FIXTURE = "/tmp/tssim_ab_batch.npz"
BATCH = 32
ITERS = int(os.environ.get("AB_ITERS", 150))
EVAL_EVERY = int(os.environ.get("AB_EVAL_EVERY", 10))


def make_fixture(path: str = FIXTURE) -> str:
    if os.path.exists(path):
        return path
    from tatt_tpu.data.collate import collate
    from tatt_tpu.data.synthetic import SyntheticTextDataset

    ds = SyntheticTextDataset(n=BATCH, seed=1)
    batch = collate([ds[i] for i in range(BATCH)], mask=True)
    np.savez(
        path,
        images_hr=batch.images_hr.astype(np.float32),
        images_lr=batch.images_lr.astype(np.float32),
    )
    return path


def psnr_rgb(sr: np.ndarray, hr: np.ndarray) -> float:
    mse = float(np.mean((sr[:, :3] - hr[:, :3]) ** 2))
    return -10.0 * np.log10(max(mse, 1e-10))
