#!/bin/bash
# Canonical TATT training recipe (mirrors reference train_TATT.sh:1).
# Stage 1: lr 1e-3; finetune by re-running with --resume and --lr 2e-4.
python -m tatt_tpu.cli.main --arch=tatt --batch_size=64 --STN --mask \
    --use_distill --gradient --sr_share --stu_iter=1 --vis_dir=vis_TATT \
    --rotate_train=5.0 --tssim_loss --test_model=CRNN --dtype=bfloat16 \
    --config=config/super_resolution.yaml "$@"
