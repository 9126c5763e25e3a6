"""The trained fixture judge: a real accuracy signal end-to-end.

The reference's core deliverable is judge accuracy on SR output
(``super_resolution.py:1518-1560``) with best-sum-accuracy checkpoint
selection (``:1111-1195``).  Its pretrained crnn.pth cannot enter this
environment, so ``tests/assets/fixture_crnn.npz`` is a compact CRNN
trained IN-REPO (tatt_tpu/train/pretrain.py, driven by
experiments/train_fixture_judge.py) on the synthetic fixture charset.
These tests light up the accuracy half of the framework with it.
"""

import os

import jax
import numpy as np
import pytest

ASSET = os.path.join(os.path.dirname(__file__), "assets", "fixture_crnn.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ASSET), reason="fixture judge asset not trained yet"
)


def _load_judge():
    from tatt_tpu.core.checkpoint import load_variables_npz
    from tatt_tpu.models.recognizers.crnn import CRNN

    variables, meta = load_variables_npz(ASSET)
    model = CRNN(nh=int(meta["nh"]), nm=tuple(int(x) for x in meta["nm"]))
    return model, variables, meta


def _word_acc(model, variables, images_nchw, labels):
    import jax.numpy as jnp

    from tatt_tpu.core.charset import CRNN_ALPHABET, ctc_greedy_decode, str_filt
    from tatt_tpu.models.recognizers.crnn import parse_crnn_input

    logits = model.apply(
        variables, parse_crnn_input(jnp.asarray(images_nchw)), train=False
    )
    preds = ctc_greedy_decode(np.asarray(logits), CRNN_ALPHABET)
    return float(
        np.mean(
            [
                str_filt(p, "lower") == str_filt(t, "lower")
                for p, t in zip(preds, labels)
            ]
        )
    )


def test_judge_reads_clean_hr_above_90pct():
    """>90% word accuracy on held-out clean HR crops; the LR domain reads
    far worse — that gap is the SR>LR signal the eval loop selects on."""
    from tatt_tpu.data.synthetic import SyntheticTextDataset

    model, variables, meta = _load_judge()
    assert float(meta["hr_acc"]) > 0.9  # recorded at training time

    # independent re-verification on a fresh slice (different seed from
    # both the training set and the training-time held-out set)
    ds = SyntheticTextDataset(n=64, seed=20260818)
    hr = np.stack(
        [np.asarray(ds[i][0].convert("RGB"), np.float32) / 255.0 for i in range(64)]
    ).transpose(0, 3, 1, 2)
    lr = np.stack(
        [np.asarray(ds[i][1].convert("RGB"), np.float32) / 255.0 for i in range(64)]
    ).transpose(0, 3, 1, 2)
    labels = [ds[i][2] for i in range(64)]

    acc_hr = _word_acc(model, variables, hr, labels)
    acc_lr = _word_acc(model, variables, lr, labels)
    assert acc_hr > 0.85, f"judge reads clean HR at only {acc_hr:.3f}"
    assert acc_hr > acc_lr + 0.2, (
        f"HR/LR accuracy gap too small: {acc_hr:.3f} vs {acc_lr:.3f}"
    )


def test_trainer_eval_reports_real_accuracy():
    """The full eval protocol (judge on SR/LR/HR, str_filt match, NED)
    produces nonzero accuracy_hr and sane ordering with the trained judge
    wired as teacher + judge."""
    from tatt_tpu.core.config import Config
    from tatt_tpu.data.synthetic import SyntheticTextDataset
    from tatt_tpu.train.loop import Trainer

    model, variables, _ = _load_judge()
    cfg = Config()
    cfg.args.batch_size = 8
    cfg.args.val_batch_size = 8
    cfg.args.mask = True
    cfg.args.arch = "tatt"
    cfg.MODEL.srb_nums = 1
    cfg.MODEL.hidden_units = 4
    cfg.MODEL.out_text_channels = 8
    cfg.args.rotate_train = 0.0
    cfg.args.tssim_loss = False

    ds = SyntheticTextDataset(n=16, seed=77)
    trainer = Trainer(
        cfg,
        ds,
        teacher_variables=variables,
        judge_variables=variables,
        crnn=model,
        judge_crnn=model,
        log_fn=lambda *_: None,
    )
    summary = trainer.evaluate(ds)
    # judge reads the ground-truth HR well even through the eval plumbing
    assert summary["accuracy_hr"] > 0.5, summary
    # an untrained SR model cannot beat ground truth
    assert summary["accuracy_hr"] >= summary["accuracy"], summary
    assert 0.0 <= summary["accuracy"] <= 1.0
    assert summary["ned"] >= 0.0


def test_best_acc_checkpoint_selects_on_accuracy(monkeypatch, tmp_path):
    """Best-checkpoint selection follows max sum-accuracy, not recency
    (``super_resolution.py:1111-1195``)."""
    from tatt_tpu.core.checkpoint import restore_checkpoint
    from tatt_tpu.core.config import Config
    from tatt_tpu.data.synthetic import SyntheticTextDataset
    from tatt_tpu.train.loop import Trainer

    cfg = Config()
    cfg.args.batch_size = 8
    cfg.args.mask = True
    cfg.args.tiny_tpg = True
    cfg.MODEL.srb_nums = 1
    cfg.MODEL.hidden_units = 4
    cfg.MODEL.out_text_channels = 8
    cfg.TRAIN.ckpt_dir = str(tmp_path)
    cfg.TRAIN.VAL.vis_dir = "selftest"

    ds = SyntheticTextDataset(n=8, seed=5)
    trainer = Trainer(cfg, ds, val_datasets={"easy": ds}, log_fn=lambda *_: None)

    # scripted accuracy trajectory: rises then falls — best is step 2
    scripted = iter([0.10, 0.40, 0.25])

    def fake_evaluate(dataset, batch_size=None):
        return {
            "accuracy": next(scripted),
            "accuracy_lr": 0.0,
            "accuracy_hr": 0.5,
            "psnr_avg": 20.0,
            "ssim_avg": 0.8,
            "ned": 0.1,
        }

    monkeypatch.setattr(trainer, "evaluate", fake_evaluate)
    for step in (100, 200, 300):
        trainer._validate_and_checkpoint(step, epoch=0)

    assert trainer.best_sum_acc == pytest.approx(0.40)
    ckpt = os.path.join(trainer.ckpt_dir, "model_best_acc_0.ckpt")
    assert os.path.exists(ckpt)
    _, info = restore_checkpoint(ckpt, trainer.state)
    assert info["iters"] == 200  # the 0.40 step, not the last one
    assert info["_best_history"]["easy"]["accuracy"] == pytest.approx(0.40)
    # converge history records all three evals (super_resolution.py:1169)
    assert [c["iterator"] for c in trainer.converge_list] == [100, 200, 300]
