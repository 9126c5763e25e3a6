"""CLI entry mirroring the reference's ``main.py:22-145`` flag surface.

Usage matches ``train_TATT.sh``:

  python -m tatt_tpu.cli.main --arch=tatt --batch_size=64 --STN --mask \
      --use_distill --gradient --sr_share --stu_iter=1 --vis_dir=vis \
      --rotate_train=5.0 --tssim_loss --test_model=CRNN

plus TPU-stack additions: ``--synthetic N`` trains on the synthetic
fixture dataset when no LMDB dirs are available, ``--max_iters`` bounds
the run.
"""

from __future__ import annotations

import argparse
import os
import sys

from tatt_tpu.core.config import Config, Flags, load_config


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="tatt_tpu — TPU-native TATT")
    p.add_argument(
        "--arch",
        default="tatt",
        choices=[
            "tatt",
            "tsrn",
            "sem_tsrn",
            "tsrn_c2f",
            "tsrn_tl_cascade",
            "tsrn_tl_cascade_sft",
            "srcnn",
            "srcnn_tl",
            "vdsr",
            "vdsr_tl",
            "srres",
            "srresnet_tl",
            "edsr",
            "rdn",
            "rdn_tl",
            "lapsrn",
            "esrgan",
            "esrgan_tl",
            "scgan",
            "scgan_tl",
            "han",
            "pcan",
            "pcan_tl",
            "tbsrn",
            "tbsrn_tl",
            "bicubic",
        ],
    )
    p.add_argument("--test_model", default="CRNN", choices=["CRNN", "ASTER", "MORAN"])
    p.add_argument("--config", default=None, help="YAML config path")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--val_batch_size", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--vis_dir", type=str, default=None)
    p.add_argument("--rec", default="crnn", choices=["crnn", "aster", "moran"])
    p.add_argument("--STN", action="store_true")
    p.add_argument("--mask", action="store_true")
    p.add_argument("--gradient", action="store_true")
    p.add_argument("--use_distill", action="store_true")
    p.add_argument("--use_label", action="store_true")
    p.add_argument("--ssim_loss", action="store_true")
    p.add_argument("--tssim_loss", action="store_true")
    p.add_argument("--fused_tssim", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="run the tssim counter-rotated copy in the same "
                        "forward (faster; BN stats computed per-copy, so "
                        "numerics match the two-forward path — default on; "
                        "--no-fused_tssim restores two forwards)")
    p.add_argument("--color_loss", action="store_true")
    p.add_argument("--sr_share", action="store_true")
    p.add_argument("--tpg_share", action="store_true")
    p.add_argument("--for_cascading", action="store_true")
    p.add_argument("--y_domain", action="store_true")
    p.add_argument("--learning_STN", action="store_true")
    p.add_argument("--training_stablize", action="store_true")
    p.add_argument("--stu_iter", type=int, default=1)
    p.add_argument("--rotate_train", type=float, default=0.0)
    p.add_argument("--rotate_test", type=float, default=0.0)
    p.add_argument("--results_rotate", action="store_true")
    p.add_argument("--results_rotate_angle", type=float, default=5.0)
    p.add_argument("--syn", action="store_true")
    p.add_argument("--mixed", action="store_true")
    p.add_argument("--ic15sr", action="store_true")
    p.add_argument("--badset", action="store_true")
    p.add_argument("--tpg", default="CRNN", choices=["CRNN", "OPT"])
    p.add_argument("--text_focus", action="store_true")
    p.add_argument("--prob_insert", type=float, default=1.0)
    p.add_argument("--test_distorted_fusing", type=int, default=0)
    p.add_argument("--mse_fuse", action="store_true")
    p.add_argument("--BiSR", action="store_true")
    p.add_argument("--test", action="store_true")
    p.add_argument("--go_test", action="store_true")
    p.add_argument("--demo", action="store_true")
    p.add_argument("--demo_dir", type=str, default="./demo")
    p.add_argument("--srb", type=int, default=5)
    p.add_argument("--hd_u", type=int, default=32)
    p.add_argument("--CHNSR", action="store_true")
    p.add_argument("--test_data_dir", type=str, default=None)
    p.add_argument("--learning_rate", "--lr", dest="lr", type=float, default=None)
    # TPU-stack additions
    p.add_argument("--dp_devices", type=int, default=0)
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="K>1 runs K optimizer steps inside one jitted "
                        "lax.scan dispatch (TPU-native; amortizes host "
                        "dispatch latency — val/save events crossed inside "
                        "a chunk fire at the chunk boundary, up to K-1 "
                        "iters late)")
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--device_collate", action="store_true",
                   help="ship uint8 crops and normalize inside the jitted "
                        "step (4x less H2D, near-zero host arithmetic; "
                        "RGB recipes only)")
    p.add_argument("--bn_per_replica", action="store_true",
                   help="compute BatchNorm batch stats per mesh shard "
                        "(DataParallel per-replica semantics, "
                        "interfaces/base.py:390) instead of the sync-BN "
                        "default")
    p.add_argument("--log_dir", default="tensorboard")
    p.add_argument("--vis", action="store_true",
                   help="dump LR/SR/HR triptychs during eval")
    p.add_argument("--tiny_tpg", action="store_true",
                   help="shrink the CRNN text-prior generator (smoke runs)")
    p.add_argument("--synthetic", type=int, default=0, metavar="N",
                   help="train on N synthetic fixture samples (no LMDB needed)")
    p.add_argument("--max_iters", type=int, default=None)
    p.add_argument("--crnn_pretrained", type=str, default=None,
                   help=".pth or .ckpt weights for the teacher/judge CRNN")
    p.add_argument("--rec_pretrained", type=str, default=None,
                   help=".pth weights for the ASTER judge (--test_model=ASTER)")
    p.add_argument("--moran_pretrained", type=str, default=None,
                   help=".pth weights for the MORAN judge (--test_model=MORAN)")
    p.add_argument("--vgg16_pretrained", type=str, default=None,
                   help="torchvision vgg16 .pth (enables LPIPS eval metric)")
    p.add_argument("--lpips_pretrained", type=str, default=None,
                   help="lpips package vgg.pth linear heads (with --vgg16_pretrained)")
    return p


def parse_config(argv=None) -> Config:
    args = build_parser().parse_args(argv)
    flag_fields = {f.name for f in Flags.__dataclass_fields__.values()}
    flags = Flags(**{k: v for k, v in vars(args).items() if k in flag_fields})
    cfg = load_config(args.config, flags=flags)
    cfg._cli = args  # stash non-Flags extras (synthetic, max_iters, ...)
    return cfg


def warn_dead_flags(cfg) -> None:
    """Flags the reference parses but never consumes anywhere (verified:
    no reads of args.text_focus / args.test_distorted_fusing / args.BiSR;
    args.prob_insert only inside an ``if False`` block,
    ``super_resolution.py:346-371``). Accepted for CLI compatibility."""
    dead = []
    if cfg.args.text_focus:
        dead.append("--text_focus")
    if cfg.args.test_distorted_fusing:
        dead.append("--test_distorted_fusing")
    if cfg.args.BiSR:
        dead.append("--BiSR")
    if cfg.args.prob_insert != 1.0:
        dead.append("--prob_insert")
    if cfg.args.rotate_test:
        # parsed into dataset constructors which compute-then-discard the
        # rotation (dataset.py:665-666) — no effect, matching the reference
        dead.append("--rotate_test")
    if cfg.args.results_rotate:
        # passes feature_arcs/rand_offs into the generator forward, which
        # accepts and never uses them (model/tsrn.py:646, no reads)
        dead.append("--results_rotate")
    for flag in dead:
        print(
            f"WARNING: {flag} is dead code in the reference and has no "
            "effect here (accepted for CLI compatibility)",
            file=sys.stderr,
        )


def main(argv=None) -> int:
    cfg = parse_config(argv)
    cli = cfg._cli
    warn_dead_flags(cfg)

    from tatt_tpu.data.synthetic import SyntheticTextDataset
    from tatt_tpu.train.loop import Trainer

    if cli.synthetic > 0:
        train_ds = SyntheticTextDataset(n=cli.synthetic, seed=1)
        val_sets = {
            "easy": SyntheticTextDataset(n=max(cli.synthetic // 4, 8), seed=2),
        }
    elif cfg.TRAIN.train_data_dir:
        from tatt_tpu.data.lmdb_dataset import (
            ConcatDataset,
            LmdbTextDataset,
            MixDataset,
        )

        def make_train(d):
            ds = LmdbTextDataset(d, voc_type=cfg.TRAIN.voc_type)
            return MixDataset(ds) if cfg.args.mixed else ds

        def make_val(d):
            # --badset / --ic15sr swap the eval corpus (the reference
            # parses these but never consumes them; here they select the
            # matching reader from data/variants.py)
            if cfg.args.badset:
                from tatt_tpu.data.variants import BadSetFolderDataset

                return BadSetFolderDataset(d, voc_type=cfg.TRAIN.voc_type, test=True)
            if cfg.args.ic15sr:
                from tatt_tpu.data.variants import IC15TextSRDataset

                return IC15TextSRDataset(d, voc_type=cfg.TRAIN.voc_type, test=True)
            return LmdbTextDataset(d, voc_type=cfg.TRAIN.voc_type, test=True)

        train_ds = ConcatDataset(
            [make_train(d) for d in cfg.TRAIN.train_data_dir]
        )
        val_sets = {
            os.path.basename(d.rstrip("/")): make_val(d)
            for d in cfg.TRAIN.VAL.val_data_dir
        }
    else:
        print(
            "no data: pass --synthetic N or a --config with train_data_dir",
            file=sys.stderr,
        )
        return 2

    # Teacher CRNN: CLI flag, else the YAML path (reference always loads
    # crnn.pth via CRNN_init, base.py:712-744). Training distillation
    # against a random teacher is meaningless — warn loudly.
    crnn_path = cli.crnn_pretrained or cfg.TRAIN.VAL.crnn_pretrained
    teacher_vars = None
    if crnn_path:
        if not os.path.exists(crnn_path):
            print(f"teacher CRNN weights not found: {crnn_path}", file=sys.stderr)
            return 2
        from tatt_tpu.core.torch_import import import_crnn

        teacher_vars = import_crnn(crnn_path)
    elif cfg.args.use_distill and not cli.synthetic:
        print(
            "WARNING: --use_distill with a RANDOMLY-INITIALIZED teacher CRNN "
            "(no --crnn_pretrained / TRAIN.VAL.crnn_pretrained). The distill "
            "loss will pull the student toward random logits and the CRNN "
            "judge makes best-acc selection noise. Supply crnn.pth weights "
            "for meaningful training.",
            file=sys.stderr,
        )

    # Judge per --test_model (reference test_bible, super_resolution.py:
    # 485-513): ASTER <- rec_pretrained, MORAN <- moran_pretrained,
    # CRNN <- the teacher. Trainer hard-errors on a weightless non-CRNN judge.
    judge_vars = None
    if cfg.args.test_model == "ASTER":
        rec_path = cli.rec_pretrained or cfg.TRAIN.VAL.rec_pretrained
        if rec_path:
            if not os.path.exists(rec_path):
                print(f"ASTER judge weights not found: {rec_path}", file=sys.stderr)
                return 2
            from tatt_tpu.core.torch_import import import_aster

            judge_vars = import_aster(rec_path)
    elif cfg.args.test_model == "MORAN":
        moran_path = cli.moran_pretrained or cfg.TRAIN.VAL.moran_pretrained
        if moran_path:
            if not os.path.exists(moran_path):
                print(f"MORAN judge weights not found: {moran_path}", file=sys.stderr)
                return 2
            from tatt_tpu.core.torch_import import import_moran

            judge_vars = import_moran(moran_path)

    # LPIPS eval metric when both checkpoints are configured
    # (super_resolution.py:41-43, 1409-1420)
    lpips_vars = None
    vgg16_path = cli.vgg16_pretrained or cfg.TRAIN.VAL.vgg16_pretrained
    lpips_path = cli.lpips_pretrained or cfg.TRAIN.VAL.lpips_pretrained
    if vgg16_path and lpips_path:
        for pth in (vgg16_path, lpips_path):
            if not os.path.exists(pth):
                print(f"LPIPS weights not found: {pth}", file=sys.stderr)
                return 2
        from tatt_tpu.losses.perceptual import import_lpips

        lpips_vars = import_lpips(vgg16_path, lpips_path)

    trainer = Trainer(
        cfg,
        train_ds,
        val_sets,
        teacher_variables=teacher_vars,
        judge_variables=judge_vars,
        lpips_variables=lpips_vars,
    )
    if cfg.resume:
        trainer.resume(cfg.resume)

    def build_rec_fn():
        """Recognizer selected by --rec for test()/demo(), mirroring the
        reference's per-rec construction (super_resolution.py:1702-1786,
        1788-1876).  Same policy as the judges: a non-CRNN recognizer
        REQUIRES its weights — silently substituting another model would
        make the printed predictions non-comparable."""
        rec = cfg.args.rec.lower()
        if rec == "crnn":
            return trainer._judge_crnn_fn()
        from tatt_tpu.train.judge import make_judge

        if rec == "aster":
            rec_path = cli.rec_pretrained or cfg.TRAIN.VAL.rec_pretrained
            if not rec_path or not os.path.exists(rec_path):
                raise SystemExit(
                    "--rec=aster requires ASTER weights: pass "
                    "--rec_pretrained or set TRAIN.VAL.rec_pretrained"
                )
            from tatt_tpu.core.torch_import import import_aster

            return make_judge("ASTER", import_aster(rec_path), cfg.TRAIN.voc_type)
        if rec == "moran":
            moran_path = cli.moran_pretrained or cfg.TRAIN.VAL.moran_pretrained
            if not moran_path or not os.path.exists(moran_path):
                raise SystemExit(
                    "--rec=moran requires MORAN weights: pass "
                    "--moran_pretrained or set TRAIN.VAL.moran_pretrained"
                )
            from tatt_tpu.core.torch_import import import_moran

            return make_judge("MORAN", import_moran(moran_path), cfg.TRAIN.voc_type)
        raise SystemExit(f"unknown --rec={cfg.args.rec}")

    if cfg.args.demo:
        import numpy as np

        from tatt_tpu.train.demo import run_demo

        def sr_fn(lr):
            import jax.numpy as jnp

            sr, _ = trainer._eval_step(trainer.state, {"images_lr": jnp.asarray(lr)})
            return np.asarray(sr)

        run_demo(
            cfg.args.demo_dir,
            sr_fn,
            build_rec_fn(),
            out_dir=os.path.join("demo_out", cfg.vis_dir),
            width=cfg.TRAIN.width,
            height=cfg.TRAIN.height,
            scale=cfg.scale_factor,
            mask=cfg.args.mask,
        )
        return 0

    if cfg.args.test:
        # reference test(): single recognizer chosen by --rec
        # (super_resolution.py:1702-1786; we feed LR, not its HR-feeding
        # bug at :1734)
        trainer._judge_fn = build_rec_fn()

    if cfg.args.go_test or cfg.args.test:
        for name, ds in val_sets.items():
            summary = trainer.evaluate(ds)
            print(f"[{name}] {summary}")
        return 0

    trainer.train(max_iters=cli.max_iters)
    return 0


if __name__ == "__main__":
    sys.exit(main())
