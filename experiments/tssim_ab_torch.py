"""Reference-torch arm of the rotate+tssim A/B (VERDICT round-1 item #2).

Runs the REFERENCE code itself (imported from /root/reference — models,
losses, rotation aug) on the same fixed batch the JAX arm memorizes, with
the train_TATT.sh recipe: image(MSE+gradient)x100 + distill x100 +
TSSIM x10, rotation 5°, Adam(lr 1e-3, beta1 0.5), grad clip 0.25.

Arms: `tssim` (rotate+tssim) and `plain` (rotate only).  If torch stalls
at ~10 dB like the JAX arm, the instability is the reference recipe's own
sensitivity on this data, not an implementation gap.

Run: python experiments/tssim_ab_torch.py [tssim|plain]   (CPU, slow)
"""

import math
import os
import sys
import time
import types

os.environ.setdefault("OMP_NUM_THREADS", "1")

import numpy as np
import torch
import torch.nn.functional as F

# torchvision is not installed; the reference only needs transforms.ToTensor
# in dead helper functions and an unused `torchvision.models` binding.
_tv = types.ModuleType("torchvision")
_tr = types.ModuleType("torchvision.transforms")
_tm = types.ModuleType("torchvision.models")
_tr.ToTensor = object
_tv.transforms = _tr
_tv.models = _tm
sys.modules.setdefault("torchvision", _tv)
sys.modules.setdefault("torchvision.transforms", _tr)
sys.modules.setdefault("torchvision.models", _tm)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")

from experiments.tssim_ab_common import EVAL_EVERY, ITERS, make_fixture, psnr_rgb  # noqa: E402


def torch_rotate_img(batches, arc, rand_offs, off_range=0.2):
    """Verbatim semantics of ``super_resolution.py:126-157``."""
    n, c, h, w = batches.shape
    ratios = h / float(w)
    ratios_mul = ratios + (rand_offs.unsqueeze(1) * off_range * 2) - off_range
    a11, a12 = torch.cos(arc), torch.sin(arc)
    a21, a22 = -torch.sin(arc), torch.cos(arc)
    zero = torch.zeros_like(arc)
    mat = torch.cat(
        [
            a11.unsqueeze(1), a12.unsqueeze(1) * ratios_mul, zero.unsqueeze(1),
            a21.unsqueeze(1) / ratios_mul, a22.unsqueeze(1), zero.unsqueeze(1),
        ],
        dim=1,
    ).reshape(n, 2, 3)
    grid = F.affine_grid(mat, batches.shape)
    return F.grid_sample(batches, grid)


def parse_crnn_data(imgs):
    """``base.py:797-815``: bicubic to 32x100, RGB->gray."""
    x = F.interpolate(imgs[:, :3], (32, 100), mode="bicubic", align_corners=True)
    r, g, b = x[:, 0:1], x[:, 1:2], x[:, 2:3]
    return 0.299 * r + 0.587 * g + 0.114 * b


def main(arm: str = "tssim") -> None:
    torch.manual_seed(0)
    np.random.seed(0)

    from loss.image_loss import ImageLoss
    from loss.semantic_loss import SemanticLoss
    from model.crnn.crnn import CRNN
    from model.tsrn import TSRN_TL_TRANS
    from utils.ssim_psnr import TRI_SSIM

    data = np.load(make_fixture())
    images_hr0 = torch.from_numpy(data["images_hr"])
    images_lr0 = torch.from_numpy(data["images_lr"])

    model = TSRN_TL_TRANS(
        scale_factor=2, width=128, height=32,
        STN=(os.environ.get("AB_STN", "1") == "1"), srb_nums=5,
        mask=True, hidden_units=32,
    )
    stu = CRNN(32, 1, 37, 256)
    tea = CRNN(32, 1, 37, 256).eval()
    image_crit = ImageLoss(gradient=True, loss_weight=[1, 1e-4])
    sem_loss = SemanticLoss()
    tri_ssim = TRI_SSIM()

    opt = torch.optim.Adam(
        list(model.parameters()) + list(stu.parameters()),
        lr=1e-3, betas=(0.5, 0.999),
    )

    print(f"arm={arm} iters={ITERS}", flush=True)
    t0 = time.time()
    for it in range(ITERS + 1):
        if it % EVAL_EVERY == 0:
            model.eval()
            stu.eval()
            with torch.no_grad():
                luma = parse_crnn_data(images_lr0)
                lv = torch.nn.functional.softmax(stu(luma), -1)
                prior = lv.permute(1, 0, 2).unsqueeze(1).permute(0, 3, 1, 2)
                sr_eval = model(images_lr0, prior)
                if isinstance(sr_eval, tuple):
                    sr_eval = sr_eval[0]
            p = psnr_rgb(sr_eval.numpy(), data["images_hr"])
            print(
                f"iter {it:4d} eval_psnr {p:6.2f}  ({time.time()-t0:.0f}s)",
                flush=True,
            )
            model.train()
            stu.train()

        # rotation aug exactly as super_resolution.py:637-654
        b = images_lr0.shape[0]
        angle = np.random.rand(b) * 5.0 * 2 - 5.0
        arc = torch.tensor(angle / 180.0 * math.pi).float()
        rand_offs = torch.tensor(np.random.rand(b)).float()
        images_lr = torch_rotate_img(images_lr0, arc, rand_offs)
        images_hr = torch_rotate_img(images_hr0, arc, rand_offs)
        images_lr_ret = torch_rotate_img(images_lr.clone(), -arc, rand_offs)

        # teacher prior on HR (super_resolution.py:772-774)
        with torch.no_grad():
            label_vecs_hr = torch.nn.functional.softmax(
                tea(parse_crnn_data(images_hr)), -1
            )
        # student prior on LR (:794-799)
        label_vecs = torch.nn.functional.softmax(
            stu(parse_crnn_data(images_lr)), -1
        )
        label_vecs_final = (
            label_vecs.permute(1, 0, 2).unsqueeze(1).permute(0, 3, 1, 2)
        )

        sr, _ = model(images_lr, label_vecs_final.detach())
        loss_img = image_crit(sr, images_hr).mean() * 100.0
        loss_distill = sem_loss(label_vecs, label_vecs_hr) * 100.0

        if arm == "tssim":
            sr_ret, _ = model(images_lr_ret, label_vecs_final.detach())
            sr_ret_rot = torch_rotate_img(sr_ret, arc, rand_offs)
            loss_tssim = (1 - tri_ssim(sr_ret_rot, sr, images_hr).mean()) * 10.0
            loss_img = loss_img + loss_tssim

        loss = loss_img + loss_distill
        if it < 3 or it % 50 == 0:
            lt = float(loss_tssim) if arm == "tssim" else 0.0
            print(
                f"  step {it}: total {float(loss):.3f} "
                f"sr {float(loss_img) - lt:.3f} tssim {lt:.3f} "
                f"distill {float(loss_distill):.3f}",
                flush=True,
            )
        opt.zero_grad()
        loss.backward()
        for group in opt.param_groups:
            torch.nn.utils.clip_grad_norm_(group["params"], 0.25)
        opt.step()
    print("done", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "tssim")
