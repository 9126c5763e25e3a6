"""End-to-end train/eval step test on a sharded 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tatt_tpu.core.mesh import batch_sharding, make_mesh, replicate, shard_batch
from tatt_tpu.data.collate import collate
from tatt_tpu.data.synthetic import SyntheticTextDataset
from tatt_tpu.models.recognizers.crnn import CRNN
from tatt_tpu.models.tsrn import TATT
from tatt_tpu.train.state import TrainState, make_optimizer
from tatt_tpu.train.steps import StepConfig, make_eval_step, make_train_step

TINY_CRNN = dict(nh=16, nm=(8, 8, 16, 16, 32, 32, 32))


def _tiny_setup():
    rng = jax.random.PRNGKey(0)
    sr_model = TATT(srb_nums=1, hidden_units=4, out_text_channels=8)
    crnn = CRNN(**TINY_CRNN)

    x = jnp.zeros((2, 4, 16, 64))
    t = jnp.zeros((2, 37, 1, 26))
    luma = jnp.zeros((2, 1, 32, 100))
    k1, k2, k3 = jax.random.split(rng, 3)
    sr_vars = sr_model.init(k1, x, t, train=True)
    stu_vars = crnn.init(k2, luma)
    teacher_vars = crnn.init(k3, luma)

    def sr_apply(variables, lr, prior, train, rngs=None, mutable=False):
        return sr_model.apply(
            variables, lr, prior, train=train, rngs=rngs, mutable=mutable
        )

    def crnn_apply(variables, luma_in, train, mutable=False):
        return crnn.apply(variables, luma_in, train=train, mutable=mutable)

    tx = make_optimizer(1e-3, beta1=0.5)
    state = TrainState.create([sr_vars], [stu_vars], tx)
    return sr_apply, crnn_apply, state, teacher_vars


@pytest.fixture(scope="module")
def batch():
    ds = SyntheticTextDataset(n=8)
    return collate([ds[i] for i in range(8)]).device_arrays()


def test_train_step_runs_and_updates(batch):
    sr_apply, crnn_apply, state, teacher_vars = _tiny_setup()
    cfg = StepConfig(tssim_loss=True, rotate_train=5.0)
    step = jax.jit(make_train_step(sr_apply, crnn_apply, crnn_apply, cfg))

    mesh = make_mesh()
    assert len(mesh.devices.ravel()) == 8
    sharded = shard_batch(mesh, batch)
    state = replicate(mesh, state)
    teacher_vars = replicate(mesh, teacher_vars)

    state1, metrics = step(state, teacher_vars, sharded, jax.random.PRNGKey(1))
    loss0 = float(metrics["loss_total"])
    assert np.isfinite(loss0)
    state2, metrics2 = step(state1, teacher_vars, sharded, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics2["loss_total"]))
    assert int(state2.step) == 2

    # parameters actually moved
    p0 = jax.tree_util.tree_leaves(state.sr_params)[0]
    p2 = jax.tree_util.tree_leaves(state2.sr_params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p2))


def test_eval_step_runs(batch):
    sr_apply, crnn_apply, state, _ = _tiny_setup()
    eval_step = jax.jit(make_eval_step(sr_apply, crnn_apply))
    sr, aux = eval_step(state, batch)
    assert sr.shape == (8, 4, 32, 128)
    assert np.isfinite(np.asarray(sr)).all()


def test_train_step_cascade_two_iters(batch):
    """stu_iter=2 with cascading exercises the multi-model path."""
    sr_apply, crnn_apply, state0, teacher_vars = _tiny_setup()
    # two SR models + two students (no sharing)
    import jax as _jax
    from tatt_tpu.models.recognizers.crnn import CRNN
    from tatt_tpu.models.tsrn import TATT
    from tatt_tpu.train.state import TrainState, make_optimizer

    sr_model = TATT(srb_nums=1, hidden_units=4, out_text_channels=8)
    crnn = CRNN(**TINY_CRNN)
    x = jnp.zeros((2, 4, 16, 64))
    t = jnp.zeros((2, 37, 1, 26))
    luma = jnp.zeros((2, 1, 32, 100))
    keys = _jax.random.split(_jax.random.PRNGKey(3), 4)
    sr_vars = [sr_model.init(keys[i], x, t, train=True) for i in range(2)]
    stu_vars = [crnn.init(keys[2 + i], luma) for i in range(2)]
    tx = make_optimizer(1e-3)
    state = TrainState.create(sr_vars, stu_vars, tx)

    cfg = StepConfig(
        stu_iter=2,
        sr_share=False,
        tpg_share=False,
        for_cascading=True,
        tssim_loss=False,
        rotate_train=0.0,
    )
    step = jax.jit(make_train_step(sr_apply, crnn_apply, crnn_apply, cfg))
    new_state, metrics = step(state, teacher_vars, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss_total"]))


def test_train_step_bfloat16_compute(batch):
    sr_apply, crnn_apply, state, teacher_vars = _tiny_setup()
    cfg = StepConfig(
        tssim_loss=True, rotate_train=5.0, compute_dtype="bfloat16"
    )
    step = jax.jit(make_train_step(sr_apply, crnn_apply, crnn_apply, cfg))
    state1, metrics = step(state, teacher_vars, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss_total"]))


def test_train_step_y_domain():
    from tatt_tpu.data.collate import collate
    from tatt_tpu.data.synthetic import SyntheticTextDataset

    ds = SyntheticTextDataset(n=4)
    ybatch = collate([ds[i] for i in range(4)], y_domain=True).device_arrays()
    assert "images_hr_y" in ybatch
    sr_apply, crnn_apply, state, teacher_vars = _tiny_setup()
    cfg = StepConfig(tssim_loss=False, rotate_train=0.0, y_domain=True)
    step = jax.jit(make_train_step(sr_apply, crnn_apply, crnn_apply, cfg))
    _, metrics = step(state, teacher_vars, ybatch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss_total"]))


def test_train_step_two_iters_no_cascade_no_share(batch):
    """stu_iter=2 WITHOUT --for_cascading and WITHOUT share flags: the
    student at i=1 must see the (detached) previous SR output
    (super_resolution.py:786,794) and per-iteration model copies must be
    indexed without crashing."""
    sr_apply, crnn_apply, _, teacher_vars = _tiny_setup()
    sr_model = TATT(srb_nums=1, hidden_units=4, out_text_channels=8)
    crnn = CRNN(**TINY_CRNN)
    x = jnp.zeros((2, 4, 16, 64))
    t = jnp.zeros((2, 37, 1, 26))
    luma = jnp.zeros((2, 1, 32, 100))
    keys = jax.random.split(jax.random.PRNGKey(7), 4)
    sr_vars = [sr_model.init(keys[i], x, t, train=True) for i in range(2)]
    stu_vars = [crnn.init(keys[2 + i], luma) for i in range(2)]
    state = TrainState.create(sr_vars, stu_vars, make_optimizer(1e-3))

    cfg = StepConfig(
        stu_iter=2,
        sr_share=False,
        tpg_share=False,
        for_cascading=False,
        tssim_loss=False,
        rotate_train=0.0,
    )
    step = jax.jit(make_train_step(sr_apply, crnn_apply, crnn_apply, cfg))
    new_state, metrics = step(state, teacher_vars, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss_total"]))
    # both SR copies received gradient updates
    for pick in range(2):
        p0 = jax.tree_util.tree_leaves(state.sr_params[pick])[0]
        p1 = jax.tree_util.tree_leaves(new_state.sr_params[pick])[0]
        assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_trainer_inits_copies_and_judge_guard():
    """Trainer builds stu_iter model copies when share flags are off, and
    hard-errors on a non-CRNN judge without weights."""
    from tatt_tpu.core.config import Config
    from tatt_tpu.data.synthetic import SyntheticTextDataset
    from tatt_tpu.train.loop import Trainer

    ds = SyntheticTextDataset(n=8)

    cfg = Config()
    cfg.args.tiny_tpg = True
    cfg.args.stu_iter = 2
    cfg.args.log_dir = ""
    cfg.MODEL.srb_nums = 1
    cfg.MODEL.hidden_units = 4
    cfg.MODEL.out_text_channels = 8
    trainer = Trainer(cfg, ds)
    assert len(trainer.state.sr_params) == 2
    assert len(trainer.state.student_params) == 2

    cfg2 = Config()
    cfg2.args.tiny_tpg = True
    cfg2.args.test_model = "ASTER"
    cfg2.args.log_dir = ""
    cfg2.MODEL.srb_nums = 1
    cfg2.MODEL.hidden_units = 4
    cfg2.MODEL.out_text_channels = 8
    with pytest.raises(ValueError, match="requires judge weights"):
        Trainer(cfg2, ds)


def _fused_setup(stn: bool, dropout: float, tx=None):
    """TATT + bn_copies=2 clone sharing one set of params."""
    rng = jax.random.PRNGKey(0)
    sr_model = TATT(
        srb_nums=1, hidden_units=4, out_text_channels=8, stn=stn, dropout=dropout
    )
    sr_model_fused = sr_model.clone(bn_copies=2)
    crnn = CRNN(**TINY_CRNN)
    x = jnp.zeros((2, 4, 16, 64))
    t = jnp.zeros((2, 37, 1, 26))
    luma = jnp.zeros((2, 1, 32, 100))
    k1, k2, k3 = jax.random.split(rng, 3)
    sr_vars = sr_model.init(k1, x, t, train=True)
    stu_vars = crnn.init(k2, luma)
    teacher_vars = crnn.init(k3, luma)

    def sr_apply(variables, lr, prior, train, rngs=None, mutable=False):
        return sr_model.apply(
            variables, lr, prior, train=train, rngs=rngs, mutable=mutable
        )

    def sr_apply_fused(variables, lr, prior, train, rngs=None, mutable=False):
        return sr_model_fused.apply(
            variables, lr, prior, train=train, rngs=rngs, mutable=mutable
        )

    def crnn_apply(variables, luma_in, train, mutable=False):
        return crnn.apply(variables, luma_in, train=train, mutable=mutable)

    state = TrainState.create(
        [sr_vars], [stu_vars], tx or make_optimizer(1e-3, 0.5)
    )
    return sr_apply, sr_apply_fused, crnn_apply, state, teacher_vars


def test_train_step_fused_tssim(batch):
    """--fused_tssim runs sr + sr_ret in ONE 2B forward (per-copy BN);
    loss stays finite and parameters update."""
    sr_apply, sr_apply_fused, crnn_apply, state, teacher_vars = _fused_setup(
        stn=True, dropout=0.1
    )
    cfg = StepConfig(
        tssim_loss=True, fused_tssim=True, rotate_train=5.0, use_distill=True
    )
    step = jax.jit(
        make_train_step(
            sr_apply, crnn_apply, crnn_apply, cfg, sr_apply_fused=sr_apply_fused
        )
    )
    b = {k: jnp.asarray(v) for k, v in batch.items()}
    new_state, metrics = step(state, teacher_vars, b, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss_total"]))
    assert np.isfinite(float(metrics["loss_tssim"]))
    before = jax.tree_util.tree_leaves(state.sr_params)[0]
    after = jax.tree_util.tree_leaves(new_state.sr_params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_fused_tssim_lockstep_matches_two_forward(batch):
    """The faithful-fused claim: with per-copy BN stats, the single 2B
    forward produces the SAME loss, gradients (via updated params), and
    running batch stats as the reference-shaped two-forward path.  Dropout
    is disabled (the two paths draw masks independently by design —
    matching the reference's fresh per-forward draws).  SGD optimizer: its
    update is proportional to the gradient, so parameter comparison
    measures gradient agreement directly (Adam's first step is
    ~lr*sign(g), which turns reduction-order noise on zero-gradient
    params into full +-lr flips)."""
    import optax

    b = {k: jnp.asarray(v) for k, v in batch.items()}
    results = {}
    for fused in (False, True):
        sr_apply, sr_apply_fused, crnn_apply, state, teacher_vars = _fused_setup(
            stn=True, dropout=0.0, tx=optax.sgd(1e-2)
        )
        cfg = StepConfig(
            tssim_loss=True,
            fused_tssim=fused,
            rotate_train=5.0,
            use_distill=True,
            learning_STN=True,
        )
        step = jax.jit(
            make_train_step(
                sr_apply,
                crnn_apply,
                crnn_apply,
                cfg,
                sr_apply_fused=sr_apply_fused if fused else None,
            )
        )
        new_state, metrics = step(state, teacher_vars, b, jax.random.PRNGKey(5))
        results[fused] = (new_state, metrics)

    s0, m0 = results[False]
    s1, m1 = results[True]
    for key in ("loss_total", "loss_tssim", "loss_sr", "loss_distill"):
        assert np.allclose(
            float(m0[key]), float(m1[key]), rtol=1e-5, atol=1e-6
        ), f"{key}: {float(m0[key])} vs {float(m1[key])}"
    assert np.allclose(
        float(m0["grad_norm_sr"]), float(m1["grad_norm_sr"]), rtol=1e-4
    ), f"grad_norm_sr: {float(m0['grad_norm_sr'])} vs {float(m1['grad_norm_sr'])}"
    # updated params equal => gradients equal
    for a, c in zip(
        jax.tree_util.tree_leaves(s0.sr_params),
        jax.tree_util.tree_leaves(s1.sr_params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-6
        )
    # running BN stats equal => per-copy stats + sequential fold are right
    for a, c in zip(
        jax.tree_util.tree_leaves(s0.sr_batch_stats),
        jax.tree_util.tree_leaves(s1.sr_batch_stats),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-6
        )


def test_multi_step_scan_matches_sequential(batch):
    """K steps inside one lax.scan dispatch == K sequential dispatches.

    Same batches and same per-step rng keys; final params, opt state, BN
    stats, step counter, and per-step metrics must agree.  (TPU-native
    dispatch amortization — no reference counterpart.)
    """
    from tatt_tpu.core.mesh import shard_stacked_batch
    from tatt_tpu.train.steps import make_multi_train_step

    import optax

    K = 3
    cfg = StepConfig(tssim_loss=True, rotate_train=5.0, use_distill=True)
    sr_apply, crnn_apply, state0, teacher_vars = _tiny_setup()
    # SGD, not Adam: Adam's first-step update is ~sign(g), so the
    # reassociation-level gradient noise between the two compilations
    # (scan body vs standalone executable) flips near-zero updates by a
    # full +-lr.  SGD is linear in the gradient, making the comparison
    # measure the scan SEMANTICS rather than Adam's sign sensitivity
    # (losses still match bitwise under both optimizers).
    state0 = TrainState.create(
        [
            {"params": p, "batch_stats": bs}
            for p, bs in zip(state0.sr_params, state0.sr_batch_stats)
        ],
        [
            {"params": p, "batch_stats": bs}
            for p, bs in zip(
                state0.student_params, state0.student_batch_stats
            )
        ],
        optax.sgd(1e-2),
    )
    inner = make_train_step(sr_apply, crnn_apply, crnn_apply, cfg)
    step = jax.jit(inner)
    multi = jax.jit(make_multi_train_step(inner, K))

    mesh = make_mesh()
    # K distinct batches: permute the synthetic batch differently per step
    rng = np.random.default_rng(0)
    batches = [
        {k: np.asarray(v)[perm] for k, v in batch.items()}
        for perm in (rng.permutation(8) for _ in range(K))
    ]
    keys = [jax.random.PRNGKey(100 + j) for j in range(K)]

    seq_state = replicate(mesh, state0)
    teacher_sh = replicate(mesh, teacher_vars)
    seq_metrics = []
    for b, r in zip(batches, keys):
        seq_state, m = step(seq_state, teacher_sh, shard_batch(mesh, b), r)
        seq_metrics.append(jax.device_get(m))

    stacked = {
        k: np.stack([b[k] for b in batches]) for k in batches[0]
    }
    scan_state, mstack = multi(
        replicate(mesh, state0),
        teacher_sh,
        shard_stacked_batch(mesh, stacked),
        jnp.stack(keys),
    )
    mstack = jax.device_get(mstack)

    assert int(scan_state.step) == int(seq_state.step) == K
    for j in range(K):
        np.testing.assert_allclose(
            mstack["loss_total"][j],
            seq_metrics[j]["loss_total"],
            rtol=2e-4,
            err_msg=f"step {j} loss diverged",
        )
    for name, a, b in (
        ("sr_params", seq_state.sr_params, scan_state.sr_params),
        ("student_params", seq_state.student_params, scan_state.student_params),
        ("sr_batch_stats", seq_state.sr_batch_stats, scan_state.sr_batch_stats),
    ):
        la = jax.tree_util.tree_leaves(jax.device_get(a))
        lb = jax.tree_util.tree_leaves(jax.device_get(b))
        assert len(la) == len(lb)
        for xa, xb in zip(la, lb):
            np.testing.assert_allclose(
                np.asarray(xa, np.float32),
                np.asarray(xb, np.float32),
                rtol=1e-4,
                atol=2e-5,
                err_msg=f"{name} diverged after {K} steps",
            )


def test_trainer_steps_per_dispatch_runs(tmp_path):
    """Trainer with steps_per_dispatch=2 trains, logs, and checkpoints;
    save events crossed inside a chunk fire at the chunk boundary."""
    import os as _os

    from tatt_tpu.core.config import Config
    from tatt_tpu.data.synthetic import SyntheticTextDataset
    from tatt_tpu.train.loop import Trainer

    cfg = Config()
    cfg.args.tiny_tpg = True
    cfg.args.log_dir = ""
    cfg.args.tssim_loss = True
    cfg.args.steps_per_dispatch = 2
    cfg.args.batch_size = 8
    cfg.TRAIN.batch_size = 8
    cfg.TRAIN.VAL.valInterval = 0
    cfg.TRAIN.saveInterval = 3  # not a multiple of K=2: boundary deferral
    cfg.TRAIN.displayInterval = 2
    cfg.TRAIN.ckpt_dir = str(tmp_path)
    cfg.MODEL.srb_nums = 1
    cfg.MODEL.hidden_units = 4
    cfg.MODEL.out_text_channels = 8
    cfg.args.hd_u = 4
    cfg.args.srb = 1
    logs = []
    tr = Trainer(cfg, SyntheticTextDataset(n=16), log_fn=logs.append)
    assert hasattr(tr, "_train_step_multi")
    out = tr.train(max_iters=5)
    # 2 chunks of 2 + 1 single tail step (max_iters - iters < k)
    assert out["iters"] == 5
    assert int(tr.state.step) == 5
    assert any("iter 2" in l for l in logs) and any("iter 4" in l for l in logs)
    ckpt = _os.path.join(str(tr.ckpt_dir), "checkpoint.ckpt")
    assert _os.path.exists(ckpt)
