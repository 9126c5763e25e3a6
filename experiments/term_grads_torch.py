"""Torch side of the tri_ssim input-gradient comparison: load the
tensors dumped by term_grads_jax.py at each step, compute
(1 - TRI_SSIM(sr_ret_rot, sr, hr)) * 10 and its gradients w.r.t. the two
SR tensors with the REFERENCE TRI_SSIM, print loss + grad norms.

Run: python experiments/term_grads_torch.py
"""

import os
import sys
import types

os.environ.setdefault("OMP_NUM_THREADS", "1")

import numpy as np
import torch

_tv = types.ModuleType("torchvision")
_tr = types.ModuleType("torchvision.transforms")
_tm = types.ModuleType("torchvision.models")
_tr.ToTensor = object
_tv.transforms = _tr
_tv.models = _tm
sys.modules.setdefault("torchvision", _tv)
sys.modules.setdefault("torchvision.transforms", _tr)
sys.modules.setdefault("torchvision.models", _tm)
sys.path.insert(0, "/root/reference")

from utils.ssim_psnr import TRI_SSIM  # noqa: E402

tri_ssim = TRI_SSIM()

for it in range(10):
    path = f"/tmp/tssim_tensors_step{it}.npz"
    if not os.path.exists(path):
        continue
    d = np.load(path)
    sr = torch.from_numpy(d["sr"]).requires_grad_(True)
    srr = torch.from_numpy(d["sr_ret_rot"]).requires_grad_(True)
    hr = torch.from_numpy(d["hr"])
    loss = (1 - tri_ssim(srr, sr, hr).mean()) * 10.0
    loss.backward()
    print(
        f"step {it}: loss {float(loss):.4f} "
        f"|grad sr| {float(sr.grad.norm()):.2f} "
        f"|grad sr_ret| {float(srr.grad.norm()):.2f} "
        f"sr range [{float(sr.min()):.3f},{float(sr.max()):.3f}] "
        f"srr range [{float(srr.min()):.3f},{float(srr.max()):.3f}]",
        flush=True,
    )
