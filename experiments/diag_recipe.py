"""Recipe-flag bisection for the round-4 soak divergence.

Both 6k-iter judge soaks plateaued at ~15 dB val PSNR — BELOW the 20.8 dB
the bicubic LR input scores — while the loss kept falling.  This harness
trains the flagship TATT for a short burst under ONE flag configuration
(from argv) on the unique-sample stream and reports the val PSNR curve,
so the pathological flag (or a structural data/eval issue, if even the
plain-MSE config plateaus) can be isolated.

Usage:
  python experiments/diag_recipe.py NAME [iters] [flag=val ...]
  e.g. python experiments/diag_recipe.py plain 1200
       python experiments/diag_recipe.py full 1200 STN=1 mask=1 \
           gradient=1 use_distill=1 tssim_loss=1 rotate_train=5
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_tpu")

ASSET = os.path.join(
    os.path.dirname(__file__), "..", "tests", "assets", "fixture_crnn.npz"
)


def main() -> None:
    from tatt_tpu.core.checkpoint import load_variables_npz
    from tatt_tpu.core.config import Config
    from tatt_tpu.data.synthetic import SyntheticTextDataset
    from tatt_tpu.models.recognizers.crnn import CRNN
    from tatt_tpu.train.loop import Trainer

    name = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 1200
    flags: dict[str, float] = {}
    for kv in sys.argv[3:]:
        k, v = kv.split("=")
        flags[k] = float(v)

    variables, meta = load_variables_npz(os.path.abspath(ASSET))
    judge = CRNN(nh=int(meta["nh"]), nm=tuple(int(v) for v in meta["nm"]))

    cfg = Config()
    cfg.args.arch = "tatt"
    cfg.args.batch_size = 64
    cfg.TRAIN.batch_size = 64
    cfg.args.val_batch_size = 64
    cfg.args.lr = 1e-3
    cfg.args.log_dir = ""
    cfg.args.vis_dir = ""
    cfg.args.sr_share = True
    cfg.args.device_collate = bool(flags.pop("device_collate", 1))
    cfg.TRAIN.VAL.valInterval = 300
    cfg.TRAIN.saveInterval = 10**9  # no checkpoints for diag runs
    cfg.TRAIN.ckpt_dir = f"/tmp/diag_{name}"
    cfg.TRAIN.displayInterval = 100
    if "lr" in flags:
        cfg.args.lr = flags.pop("lr")
    misalign = float(flags.pop("misalign", 0.0))
    for k, v in flags.items():
        cur = getattr(cfg.args, k)
        setattr(cfg.args, k, type(cur)(v) if cur is not None else v)

    train_ds = SyntheticTextDataset(
        n=1_000_000, seed=1, cache=False, misalign=misalign
    )
    val_ds = SyntheticTextDataset(n=256, seed=2, misalign=misalign)

    trainer = Trainer(
        cfg,
        train_ds,
        {"val": val_ds},
        teacher_variables=variables,
        judge_variables=variables,
        crnn=judge,
        judge_crnn=judge,
    )
    t0 = time.time()
    trainer.train(max_iters=iters)
    final = trainer.evaluate(val_ds)
    curve = [
        (c["iterator"], round(float(c["results"]["val"]["psnr_avg"]), 2),
         round(float(c["results"]["val"]["accuracy"]), 4))
        for c in trainer.converge_list
    ]
    print(json.dumps({
        "name": name,
        "iters": iters,
        "flags": {k: getattr(cfg.args, k) for k in (
            "STN", "mask", "gradient", "use_distill", "tssim_loss",
            "rotate_train", "device_collate", "lr")},
        "curve_psnr_acc": curve,
        "final_psnr": round(float(final["psnr_avg"]), 3),
        "final_acc_sr": round(float(final["accuracy"]), 4),
        "final_acc_lr": round(float(final["accuracy_lr"]), 4),
        "psnr_lr": round(float(final["psnr_avg_lr"]), 3),
        "wall_s": round(time.time() - t0, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
