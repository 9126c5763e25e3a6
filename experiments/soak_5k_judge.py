"""5k-iteration soak at the reference cadence with the TRAINED judge.

VERDICT r3 Next #6: training-at-length evidence for the checkpoint
machinery with a real accuracy signal.  Full canonical recipe
(``train_TATT.sh:1-2``: STN + mask + distill + gradient + tssim +
rotate 5), valInterval=400 / saveInterval=200 like the reference yaml,
best-acc + rolling checkpoints, converge history — and the judge is the
in-repo-pretrained fixture CRNN (tests/assets/fixture_crnn.npz), so the
accuracy column is meaningful: SR accuracy must rise above LR accuracy,
and the best-acc checkpoint must be *selected by accuracy*
(``interfaces/super_resolution.py:1111-1195``).

Run on the real chip:
  PYTHONPATH=/root/repo python experiments/soak_5k_judge.py [iters]
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


def set_lr(trainer, new_lr: float) -> None:
    """Stage-2 lr drop without a checkpoint round-trip: the same
    opt-state hyperparams surgery Trainer.resume performs for the
    reference's ``--resume`` + new-lr stage (``train_TATT.sh:2``)."""
    import jax.numpy as jnp

    opt = trainer.state.opt_state
    hp = dict(opt.hyperparams)
    hp["learning_rate"] = jnp.asarray(
        new_lr, jnp.asarray(hp["learning_rate"]).dtype
    )
    trainer.state = trainer.state.replace(
        opt_state=opt._replace(hyperparams=hp)
    )
    trainer.cfg.args.lr = new_lr


def main(iters: int = 5000) -> None:
    from tatt_tpu.core.checkpoint import load_variables_npz
    from tatt_tpu.core.config import Config
    from tatt_tpu.data.synthetic import SyntheticTextDataset
    from tatt_tpu.models.recognizers.crnn import CRNN
    from tatt_tpu.train.loop import Trainer

    variables, meta = load_variables_npz(os.path.abspath(ASSET))
    judge = CRNN(nh=int(meta["nh"]), nm=tuple(int(v) for v in meta["nm"]))
    print(
        f"judge: hr_acc {float(meta['hr_acc']):.4f} "
        f"lr_acc {float(meta['lr_acc']):.4f}",
        flush=True,
    )

    cfg = Config()
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
    cfg.args.val_batch_size = 64
    cfg.args.lr = 1e-3
    cfg.args.log_dir = ""
    run_name = os.environ.get("SOAK_NAME", "soak_r5_judge")
    cfg.args.vis_dir = run_name
    cfg.args.device_collate = True  # the uint8 fast path, at length
    cfg.TRAIN.VAL.valInterval = 400   # reference yaml cadence
    cfg.TRAIN.saveInterval = 200
    cfg.TRAIN.ckpt_dir = f"ckpt/{run_name}"
    cfg.TRAIN.displayInterval = 100

    # a unique-sample STREAM: the first soak attempt trained 78 epochs
    # over 4096 fixed crops and memorized their per-pixel HR noise — val
    # PSNR peaked at epoch ~6 then declined.  n >> iters*batch means no
    # sample repeats (the reference trains one pass over 17k+ real crops
    # per epoch, hundreds of epochs — repeats of REAL noise, which is
    # exactly what our fixed-fixture repeats failed to emulate).
    #
    # misalign (SOAK_MISALIGN, default 0 = registered pairs): the
    # round-4/5 misalign=2.0 soaks FAILED BY CONSTRUCTION — the LR-vs-HR
    # shift is random per sample and unobservable from the LR, so the
    # MSE-optimal SR hedges over shifts with blur, PSNR caps ~18.4 dB
    # below the bicubic floor, and the judge reads SR WORSE than LR
    # (10k run: acc 0.27 vs 0.52).  The "aligned fixtures make the STN
    # random-walk" probes that motivated misalign=2.0 ran while the TPS
    # solve was still bf16-broken (4d2ff1c); with the fixed solve a
    # warped SR vs a registered HR costs loss, which IS the identity
    # anchor.  BENCH_NOTES "Round 5: convergence soak" has both curves.
    misalign = float(os.environ.get("SOAK_MISALIGN", "0"))
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

    # SOAK_RESUME=1: extend a previous soak from its rolling checkpoint
    # (opt state + converge history restored; the reference's own
    # --resume continuation, train_TATT.sh:2)
    if os.environ.get("SOAK_RESUME") == "1":
        # the Trainer nests a run-name dir under ckpt_dir; continue from
        # the ROLLING checkpoint (step + opt state), not the best-acc one
        trainer.resume(
            os.path.join(
                cfg.TRAIN.ckpt_dir, cfg.args.vis_dir, "checkpoint.ckpt"
            )
        )
    start = int(trainer.state.step)

    # pre-train baseline: the untrained generator's SR accuracy
    base = trainer.evaluate(val_ds)
    print(f"iter {start} eval: "
          + json.dumps({k: round(float(v), 4) for k, v in base.items()
                        if isinstance(v, (int, float))}), flush=True)

    # two-stage schedule (train_TATT.sh:1-2): lr 1e-3 for the first ~2/3,
    # then the finetune stage at 2e-4 (both train() calls no-op when a
    # resumed step is already past their bound)
    stage1 = (iters * 2) // 3
    t0 = time.time()
    trainer.train(max_iters=stage1)
    set_lr(trainer, 2e-4)
    print(f"stage 2: lr -> 2e-4 at iter {max(stage1, start)}", flush=True)
    trainer.train(max_iters=iters)
    wall = time.time() - t0

    final = trainer.evaluate(val_ds)
    curve = [
        {
            "iter": c["iterator"],
            **{
                name: {
                    "acc": round(float(r["accuracy"]), 4),
                    "psnr": round(float(r["psnr_avg"]), 3),
                    "ssim": round(float(r["ssim_avg"]), 4),
                }
                for name, r in c["results"].items()
            },
        }
        for c in trainer.converge_list
    ]
    print(json.dumps({"curve": curve}, indent=1), flush=True)
    summary = {
        "iters": iters,
        "wall_s": round(wall, 1),
        "img_per_s": round((iters - start) * 64 / wall, 1),
        "best_sum_acc": round(float(trainer.best_sum_acc), 4),
        "final_acc_sr": round(float(final["accuracy"]), 4),
        "final_acc_lr": round(float(final["accuracy_lr"]), 4),
        "final_acc_hr": round(float(final["accuracy_hr"]), 4),
        "final_psnr": round(float(final["psnr_avg"]), 3),
        "final_ssim": round(float(final["ssim_avg"]), 4),
        "base_acc_sr": round(float(base["accuracy"]), 4),
        "ckpts": sorted(os.listdir(cfg.TRAIN.ckpt_dir)),
    }
    print(json.dumps(summary), flush=True)
    assert summary["final_acc_sr"] > summary["final_acc_lr"], (
        "SR must read better than LR with the trained judge"
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5000)
