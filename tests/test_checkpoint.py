import os

import jax
import jax.numpy as jnp
import numpy as np

from tatt_tpu.core.checkpoint import restore_checkpoint, save_checkpoint
from tatt_tpu.models.tsrn import TSRN
from tatt_tpu.train.state import TrainState, make_optimizer


def test_checkpoint_roundtrip(tmp_path):
    model = TSRN(srb_nums=1, hidden_units=4)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 16, 64)))
    tx = make_optimizer(1e-3)
    state = TrainState.create([variables], [{"params": {}}], tx)
    state = state.replace(step=state.step + 7)

    path = os.path.join(tmp_path, "ckpt", "checkpoint_000007.ckpt")
    save_checkpoint(path, state, info={"arch": "tsrn", "iters": 7})

    blank = TrainState.create([model.init(jax.random.PRNGKey(1), jnp.zeros((1, 4, 16, 64)))], [{"params": {}}], tx)
    restored, info = restore_checkpoint(path, blank)
    assert int(restored.step) == 7
    assert info["arch"] == "tsrn"
    a = jax.tree_util.tree_leaves(state.sr_params)[0]
    b = jax.tree_util.tree_leaves(restored.sr_params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_finetune_resume_new_lr(tmp_path):
    """The two-stage recipe (train_TATT.sh:1-2): stage 2 resumes the stage-1
    checkpoint with lr 2e-4.  Must restore the step counter AND the Adam
    moments while applying the NEW lr — inject_hyperparams keeps the lr
    inside opt_state, so a naive restore resurrects the old one (the bug
    Trainer.resume now guards against)."""
    from tatt_tpu.core.config import Config
    from tatt_tpu.data.synthetic import SyntheticTextDataset
    from tatt_tpu.train.loop import Trainer

    ds = SyntheticTextDataset(n=16)

    def make_cfg(lr):
        cfg = Config()
        cfg.args.tiny_tpg = True
        cfg.args.log_dir = ""
        cfg.args.tssim_loss = False
        cfg.args.rotate_train = 0.0
        cfg.args.batch_size = 8  # divisible by the 8-device test mesh
        cfg.TRAIN.batch_size = 8
        cfg.TRAIN.VAL.valInterval = 0
        cfg.TRAIN.saveInterval = 10_000
        cfg.TRAIN.ckpt_dir = str(tmp_path)
        cfg.MODEL.srb_nums = 1
        cfg.MODEL.hidden_units = 4
        cfg.MODEL.out_text_channels = 8
        cfg.args.hd_u = 4
        cfg.args.srb = 1
        cfg.args.lr = lr  # cfg.lr reads args.lr (CLI --lr precedence)
        return cfg

    t1 = Trainer(make_cfg(1e-3), ds)
    t1.train(max_iters=2)
    path = os.path.join(tmp_path, "stage1.ckpt")
    save_checkpoint(path, t1.state, info={"iters": 2})
    saved_moments = jax.tree_util.tree_leaves(t1.state.opt_state.inner_state)

    t2 = Trainer(make_cfg(2e-4), ds)
    t2.resume(path)
    # step counter and Adam moments survived
    assert int(t2.state.step) == 2
    restored_moments = jax.tree_util.tree_leaves(t2.state.opt_state.inner_state)
    assert len(saved_moments) == len(restored_moments)
    for a, b in zip(saved_moments, restored_moments):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # moments are real (some mu/nu leaf is nonzero), not re-initialized
    assert any(
        np.abs(np.asarray(leaf)).max() > 0
        for leaf in restored_moments
        if np.asarray(leaf).ndim > 0
    )
    # the NEW lr is in effect, not the checkpointed 1e-3
    lr = float(np.asarray(t2.state.opt_state.hyperparams["learning_rate"]))
    assert abs(lr - 2e-4) < 1e-9
    # and training continues from the restored counter
    t2.train(max_iters=3)
    assert int(t2.state.step) == 3


def test_resolve_resume_path_directory(tmp_path):
    """--resume accepts a run directory like the reference
    (base.py:398-443): native .ckpt preferred, else the highest-numbered
    model_best_acc_<iter>.pth."""
    from tatt_tpu.core.checkpoint import is_torch_checkpoint, resolve_resume_path

    d = tmp_path / "run"
    d.mkdir()
    (d / "model_best_acc_3.pth").write_bytes(b"\x80\x02X")  # pickle magic
    (d / "model_best_acc_12.pth").write_bytes(b"\x80\x02X")
    # reference names are per MODEL-COPY index: lowest wins (copy 0 first)
    assert resolve_resume_path(str(d)).endswith("model_best_acc_3.pth")
    assert is_torch_checkpoint(str(d / "model_best_acc_12.pth"))

    (d / "model_best_acc_0.ckpt").write_bytes(b"\x84notmsgpackreally")
    assert resolve_resume_path(str(d)).endswith("model_best_acc_0.ckpt")
    assert not is_torch_checkpoint(str(d / "model_best_acc_0.ckpt"))
    # a plain file path passes through untouched
    f = d / "model_best_acc_12.pth"
    assert resolve_resume_path(str(f)) == str(f)


def test_torch_pth_resume(tmp_path):
    """A reference user's trained TATT .pth resumes directly: --resume on
    the run dir finds model_best_acc_<i>.pth, routes through import_tatt,
    and fills generator params + BN running stats (non-strict, like the
    reference's strict=False load)."""
    import torch

    from tatt_tpu.core.config import Config
    from tatt_tpu.data.synthetic import SyntheticTextDataset
    from tatt_tpu.train.loop import Trainer
    from test_tatt_parity import TorchTATT

    torch.manual_seed(0)
    tm = TorchTATT(srb_nums=2).eval()
    run_dir = tmp_path / "TATT"
    run_dir.mkdir()
    torch.save(
        {"state_dict_G": tm.state_dict(), "info": {"arch": "tatt", "iters": 5}},
        str(run_dir / "model_best_acc_5.pth"),
    )

    cfg = Config()
    cfg.args.tiny_tpg = True
    cfg.args.log_dir = ""
    cfg.args.mask = True  # the checkpoint's stem conv is 4-channel (RGB+mask)
    cfg.TRAIN.ckpt_dir = str(tmp_path)
    cfg.MODEL.srb_nums = 2
    cfg.args.srb = 2  # full-width TATT (hidden 32 / d 64): the importer's layout
    trainer = Trainer(cfg, SyntheticTextDataset(n=8))

    trainer.resume(str(run_dir))

    got = np.asarray(trainer.state.sr_params[0]["block1_conv"]["kernel"])
    want = tm.state_dict()["block1.0.weight"].numpy()
    np.testing.assert_array_equal(got, want)
    # BN running stats came along too
    stats = trainer.state.sr_batch_stats[0]
    leaves = jax.tree_util.tree_leaves(stats)
    assert leaves and any(np.abs(np.asarray(l)).max() > 0 for l in leaves)
    # and the model still runs an eval forward with the imported weights
    summary = trainer.evaluate(SyntheticTextDataset(n=8, seed=3))
    assert np.isfinite(summary["psnr_avg"])
