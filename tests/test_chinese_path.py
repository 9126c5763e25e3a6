"""End-to-end Chinese path (--CHNSR --tpg OPT): the reference wires the
NAVER TPG recognizer with the 3965-char alphabet from ``al_chinese.txt``
(``main.py:127-144``, ``interfaces/super_resolution.py:488``).  Round-2
shipped the model code but not the alphabet; this smoke proves the path
trains a step and evaluates with NED on a synthetic Chinese fixture.
"""

import numpy as np
import pytest

from tatt_tpu.core.charset import ctc_greedy_decode, str_filt, voc_table


def test_chinese_alphabet_packaged():
    """al_chinese.txt resolves without a CWD copy (train/loop.py builds
    num_class from it) and matches the reference's 3965-char table."""
    table = voc_table("chinese")
    assert len(table) == 3965
    # the table embeds printable ASCII first (dataset.py:1660-1667)
    assert table.startswith(" !\"#")
    assert "中" in table and "国" in table
    # relative path that doesn't exist falls back to the packaged file
    assert voc_table("chinese", "al_chinese.txt") == table


def test_chinese_str_filt():
    assert str_filt("中国abc!@#", "chinese") == "中国abc"


def test_chinese_ctc_decode_roundtrip():
    """blank + table decode: ids follow the CTCLabelConverter shift."""
    alphabet = "-" + voc_table("chinese")
    ids = [alphabet.index("中"), 0, alphabet.index("国")]
    t, n = len(ids), 1
    logits = np.full((t, n, len(alphabet) - 1), -10.0, np.float32)
    for step, idx in enumerate(ids):
        logits[step, 0, idx] = 10.0
    assert ctc_greedy_decode(logits, alphabet) == ["中国"]


def test_chnsr_opt_trains_and_evaluates():
    """--CHNSR --tpg OPT end-to-end: one train step + NED eval."""
    from tatt_tpu.core.config import Config
    from tatt_tpu.data.synthetic import SyntheticTextDataset
    from tatt_tpu.train.loop import Trainer

    chinese = voc_table("chinese")
    # common characters only so rendering stays trivial
    charset = chinese[200:264]
    train_ds = SyntheticTextDataset(n=8, seed=1, charset=charset)
    val_ds = SyntheticTextDataset(n=8, seed=2, charset=charset)

    cfg = Config()
    cfg.args.CHNSR = True
    cfg.args.tpg = "OPT"
    cfg.args.tiny_tpg = True
    cfg.args.log_dir = ""
    cfg.args.tssim_loss = False
    cfg.args.rotate_train = 0.0
    cfg.args.batch_size = 8  # divisible by the 8-device test mesh
    cfg.TRAIN.batch_size = 8
    cfg.TRAIN.voc_type = "chinese"
    cfg.TRAIN.VAL.valInterval = 0
    cfg.MODEL.srb_nums = 1
    cfg.MODEL.hidden_units = 4
    cfg.MODEL.out_text_channels = 8
    cfg.args.hd_u = 4
    cfg.args.srb = 1

    trainer = Trainer(cfg, train_ds, {"val": val_ds})
    assert cfg.MODEL.text_emb == 3965  # prior width follows the alphabet
    out = trainer.train(max_iters=1)
    assert out["iters"] == 1

    summary = trainer.evaluate(val_ds, batch_size=8)
    assert np.isfinite(summary["psnr_avg"])
    assert 0.0 <= summary["ned"] <= 1.0
    assert 0.0 <= summary["accuracy"] <= 1.0
