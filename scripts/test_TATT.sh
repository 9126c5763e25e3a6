#!/bin/bash
# Canonical eval (mirrors reference test_TATT.sh:1): --go_test on the best ckpt.
python -m tatt_tpu.cli.main --arch=tatt --batch_size=50 --mask --go_test \
    --vis_dir=vis_TATT --test_model=CRNN \
    --resume=ckpt/vis_TATT/model_best_acc_0.ckpt \
    --config=config/super_resolution.yaml "$@"
