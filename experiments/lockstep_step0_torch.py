"""Torch side of the step-0 loss comparison: load the lockstep dump,
run ONE train-mode forward + loss stack with the same rotation draws the
JAX lockstep arm used, print the loss terms.

JAX lockstep arm printed at step 0:
  total 63.788  sr 53.850  tssim 9.849  distill 0.090

Run: python experiments/lockstep_step0_torch.py [n_steps]
"""

import math
import os
import sys
import types

os.environ.setdefault("OMP_NUM_THREADS", "1")

import numpy as np
import torch
import torch.nn.functional as F

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

from experiments.tssim_ab_common import make_fixture  # noqa: E402
from experiments.tssim_ab_torch import parse_crnn_data, torch_rotate_img  # noqa: E402
from experiments.tssim_lockstep_jax import WEIGHTS, dump_torch_init, load_sd  # noqa: E402


def main(n_steps: int = 3) -> None:
    dump_torch_init()
    from loss.image_loss import ImageLoss
    from loss.semantic_loss import SemanticLoss
    from model.crnn.crnn import CRNN
    from model.tsrn import TSRN_TL_TRANS
    from utils.ssim_psnr import TRI_SSIM

    data = np.load(make_fixture())
    images_hr0 = torch.from_numpy(data["images_hr"])
    images_lr0 = torch.from_numpy(data["images_lr"])
    b = images_lr0.shape[0]

    model = TSRN_TL_TRANS(
        scale_factor=2, width=128, height=32, STN=True, srb_nums=5,
        mask=True, hidden_units=32,
    )
    stu = CRNN(32, 1, 37, 256)
    tea = CRNN(32, 1, 37, 256).eval()
    model.load_state_dict({k: torch.from_numpy(v) for k, v in load_sd("model").items()})
    stu.load_state_dict({k: torch.from_numpy(v) for k, v in load_sd("stu").items()})
    tea.load_state_dict({k: torch.from_numpy(v) for k, v in load_sd("tea").items()})
    model.train()
    stu.train()

    image_crit = ImageLoss(gradient=True, loss_weight=[1, 1e-4])
    sem_loss = SemanticLoss()
    tri_ssim = TRI_SSIM()
    opt = torch.optim.Adam(
        list(model.parameters()) + list(stu.parameters()),
        lr=1e-3, betas=(0.5, 0.999),
    )

    np.random.seed(0)
    for it in range(n_steps):
        angle = np.random.rand(b) * 5.0 * 2 - 5.0
        arc = torch.tensor(angle / 180.0 * math.pi).float()
        rand_offs = torch.tensor(np.random.rand(b)).float()
        images_lr = torch_rotate_img(images_lr0, arc, rand_offs)
        images_hr = torch_rotate_img(images_hr0, arc, rand_offs)
        images_lr_ret = torch_rotate_img(images_lr.clone(), -arc, rand_offs)

        with torch.no_grad():
            label_vecs_hr = torch.nn.functional.softmax(
                tea(parse_crnn_data(images_hr)), -1
            )
        label_vecs = torch.nn.functional.softmax(
            stu(parse_crnn_data(images_lr)), -1
        )
        label_vecs_final = (
            label_vecs.permute(1, 0, 2).unsqueeze(1).permute(0, 3, 1, 2)
        )

        sr, _ = model(images_lr, label_vecs_final.detach())
        loss_sr = image_crit(sr, images_hr).mean() * 100.0
        loss_distill = sem_loss(label_vecs, label_vecs_hr) * 100.0
        sr_ret, _ = model(images_lr_ret, label_vecs_final.detach())
        sr_ret_rot = torch_rotate_img(sr_ret, arc, rand_offs)
        loss_tssim = (1 - tri_ssim(sr_ret_rot, sr, images_hr).mean()) * 10.0
        loss = loss_sr + loss_tssim + loss_distill
        print(
            f"  step {it}: total {float(loss):.3f} sr {float(loss_sr):.3f} "
            f"tssim {float(loss_tssim):.3f} distill {float(loss_distill):.3f} "
            f"| sr_out mean {float(sr[:, :3].mean()):.4f} "
            f"min {float(sr[:, :3].min()):.3f} max {float(sr[:, :3].max()):.3f}",
            flush=True,
        )
        opt.zero_grad()
        loss.backward()
        groups = {}
        for name, p in model.named_parameters():
            if p.grad is None:
                continue
            top = name.split(".")[0]
            groups[top] = groups.get(top, 0.0) + float(p.grad.pow(2).sum())
        gn = torch.nn.utils.clip_grad_norm_(model.parameters(), 0.25)
        print(f"    grad_norm(model) pre-clip {float(gn):.3f}", flush=True)
        top8 = sorted(groups.items(), key=lambda kv: -kv[1])[:8]
        print(
            "    " + " ".join(f"{k}={v**0.5:.1f}" for k, v in top8),
            flush=True,
        )
        opt.step()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
