"""Eval-report completeness: LPIPS metric keys, attention-grid dumps,
converge-list persistence (VERDICT round-1 item #4)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tatt_tpu.core.checkpoint import restore_checkpoint, save_checkpoint
from tatt_tpu.core.config import Config
from tatt_tpu.data.synthetic import SyntheticTextDataset
from tatt_tpu.train.loop import Trainer


def _tiny_cfg(tmp_path) -> Config:
    cfg = Config()
    cfg.args.tiny_tpg = True
    cfg.args.log_dir = ""
    cfg.MODEL.srb_nums = 1
    cfg.MODEL.hidden_units = 4
    cfg.MODEL.out_text_channels = 8
    cfg.args.val_batch_size = 8
    cfg.TRAIN.ckpt_dir = str(tmp_path)
    return cfg


def _tiny_lpips():
    """Randomly-initialized LPIPS stack (structure test, not a metric)."""
    from tatt_tpu.losses.perceptual import LPIPS_TAPS, VGG16Features

    vgg = VGG16Features()
    variables = vgg.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 64)))
    taps = vgg.apply(variables, jnp.zeros((1, 3, 32, 64)))
    lins = [np.abs(np.random.default_rng(i).normal(size=(taps[t].shape[1],))).astype(np.float32)
            for i, t in enumerate(LPIPS_TAPS)]
    return variables, lins


def test_evaluate_reports_lpips_and_attention(tmp_path):
    cfg = _tiny_cfg(tmp_path)
    cfg.args.vis = True
    cfg.TRAIN.VAL.n_vis = 2
    cfg.TRAIN.VAL.vis_dir = f"evaltest_{os.getpid()}"
    ds = SyntheticTextDataset(n=8)
    trainer = Trainer(cfg, ds, lpips_variables=_tiny_lpips())
    summary = trainer.evaluate(SyntheticTextDataset(n=8, seed=5))
    assert "lpips_vgg_sr" in summary and "lpips_vgg_lr" in summary
    assert np.isfinite(summary["lpips_vgg_sr"])
    out_root = os.path.join("demo", cfg.vis_dir)
    pngs = os.listdir(out_root)
    assert any(f.startswith("att_") for f in pngs), pngs
    assert any(not f.startswith("att_") for f in pngs)


def test_converge_list_round_trips_through_checkpoint(tmp_path):
    cfg = _tiny_cfg(tmp_path)
    ds = SyntheticTextDataset(n=8)
    trainer = Trainer(cfg, ds)
    trainer.converge_list = [
        {"iterator": 5, "results": {"easy": {"accuracy": 0.5, "psnr_avg": 20.0}}}
    ]
    path = os.path.join(str(tmp_path), "c.ckpt")
    save_checkpoint(
        path, trainer.state, info={"iters": 5}, converge=trainer.converge_list
    )
    trainer2 = Trainer(cfg, ds)
    trainer2.resume(path)
    assert trainer2.converge_list == trainer.converge_list
