"""Two-stage finetune demonstration (VERDICT r2 Next #7).

Stage 1 was the round-2 soak: full train_TATT.sh recipe, 1024-sample
synthetic set, 1500 iters at lr 1e-3 (checkpoint at
ckpt/soak_r2_full/checkpoint.ckpt).  This script is stage 2
(`train_TATT.sh:2`): resume that checkpoint with lr 2e-4 and run 500
more iters, recording eval PSNR every 100 iters to see whether the
lower lr damps the +-2 dB oscillation the round-2 curve showed.

Run on the real chip:
  PYTHONPATH=/root/repo:$PYTHONPATH python experiments/finetune_soak.py
"""

from __future__ import annotations

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_tpu")

from tatt_tpu.core.config import Config
from tatt_tpu.data.synthetic import SyntheticTextDataset
from tatt_tpu.train.loop import Trainer

CKPT = "ckpt/soak_r2_full/checkpoint.ckpt"
ITERS = 500
VAL_EVERY = 100


def main() -> None:
    cfg = Config()
    # mirror the round-2 soak invocation (full train_TATT.sh recipe)
    cfg.args.arch = "tatt"
    cfg.args.STN = True
    cfg.args.mask = True
    cfg.args.gradient = True
    cfg.args.use_distill = True
    cfg.args.sr_share = True
    cfg.args.tssim_loss = True
    cfg.args.rotate_train = 5.0
    cfg.args.batch_size = 64
    cfg.TRAIN.batch_size = 64
    cfg.args.log_dir = ""
    cfg.args.vis_dir = "soak_r3_finetune"
    cfg.TRAIN.VAL.valInterval = 0  # manual eval cadence below
    cfg.TRAIN.saveInterval = 10_000_000
    cfg.args.lr = 2e-4  # the finetune stage's lr (train_TATT.sh:2)

    train_ds = SyntheticTextDataset(n=1024, seed=1)
    val_ds = SyntheticTextDataset(n=256, seed=2)

    trainer = Trainer(cfg, train_ds, {"val": val_ds})
    trainer.resume(CKPT)
    start = int(trainer.state.step)
    lr = float(
        jax.numpy.asarray(
            trainer.state.opt_state.hyperparams["learning_rate"]
        )
    )
    print(f"resumed at step {start}, lr {lr}", flush=True)
    assert abs(lr - 2e-4) < 1e-9

    curve = []
    t0 = time.time()
    for k in range(ITERS // VAL_EVERY):
        trainer.train(max_iters=start + (k + 1) * VAL_EVERY)
        summary = trainer.evaluate(val_ds, batch_size=64)
        point = {
            "iter": int(trainer.state.step),
            "psnr": round(summary["psnr_avg"], 3),
            "ssim": round(summary["ssim_avg"], 4),
            "acc": round(summary["accuracy"], 4),
        }
        curve.append(point)
        print(json.dumps(point), flush=True)
    print(
        json.dumps(
            {
                "curve": curve,
                "wall_s": round(time.time() - t0, 1),
                "lr": lr,
                "resumed_from": CKPT,
                "start_step": start,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
