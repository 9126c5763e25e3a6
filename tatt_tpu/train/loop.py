"""Training orchestration — the TPU-native ``TextSR.train``/``eval``.

Replaces ``interfaces/super_resolution.py:451-1700``'s Python loop with:
host collate thread -> DP-sharded jitted train step -> periodic eval over
the val sets (every ``valInterval`` iters) -> best-sum-accuracy checkpoint,
``saveInterval`` rolling checkpoint, tensorboard scalars every 5 iters.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tatt_tpu.core.charset import ctc_greedy_decode
from tatt_tpu.core.checkpoint import restore_checkpoint, save_checkpoint
from tatt_tpu.core.config import Config
from tatt_tpu.core.mesh import (
    make_mesh,
    pad_to_multiple,
    replicate,
    shard_batch,
    shard_stacked_batch,
)
from tatt_tpu.data.loader import DataLoader
from tatt_tpu.losses.ssim import psnr as psnr_fn
from tatt_tpu.losses.ssim import ssim as ssim_fn
from tatt_tpu.models.factory import ABLATION_SET, build_criterion, build_generator
from tatt_tpu.models.recognizers.crnn import CRNN, parse_crnn_input
from tatt_tpu.train.metrics import EvalAccumulator
from tatt_tpu.train.state import TrainState, make_optimizer
from tatt_tpu.train.steps import (
    StepConfig,
    make_eval_step,
    make_multi_train_step,
    make_plain_train_step,
    make_train_step,
)


def make_summary_writer(log_dir: str, vis_dir: str):
    """tensorboardX writer under ``<log_dir>/<vis_dir>``, or None.

    Missing tensorboardX warns ONCE on stderr instead of silently
    dropping scalars; dir reuse wipes stale event files so curves don't
    concatenate across runs (reference ``super_resolution.py:474-481``)."""
    try:
        from tensorboardX import SummaryWriter
    except ImportError:
        import sys

        print(
            "tatt_tpu: tensorboardX is not installed — scalar logging to "
            f"{log_dir!r} is disabled (pip install tensorboardX to enable)",
            file=sys.stderr,
        )
        return None
    tb_dir = os.path.join(log_dir, vis_dir)
    if os.path.isdir(tb_dir):
        for name in os.listdir(tb_dir):
            path = os.path.join(tb_dir, name)
            if os.path.isfile(path):
                os.unlink(path)
    else:
        os.makedirs(tb_dir, exist_ok=True)
    return SummaryWriter(tb_dir)


class Trainer:
    """End-to-end trainer for text-prior archs (tatt / tsrn_tl_cascade)."""

    def __init__(
        self,
        cfg: Config,
        train_dataset,
        val_datasets: Optional[dict] = None,
        teacher_variables=None,
        judge_variables=None,
        lpips_variables=None,
        log_fn: Callable[[str], None] = print,
        crnn=None,
        judge_crnn=None,
    ):
        self.cfg = cfg
        self.log = log_fn
        self.mesh = make_mesh(cfg.args.dp_devices)
        self.n_devices = len(self.mesh.devices.ravel())
        from tatt_tpu.models.common import set_bn_replicas

        # per-replica DataParallel BN semantics: stats per contiguous
        # batch shard (device-local under the 1-D mesh); default sync-BN
        set_bn_replicas(
            self.n_devices
            if getattr(cfg.args, "bn_per_replica", False)
            else 1
        )

        from tatt_tpu.core.charset import CRNN_ALPHABET, voc_table

        # Chinese runs (--CHNSR) swap the 37-class CRNN alphabet for the
        # 3965-char table (main.py:140-142); the text-prior width follows
        # (reference TSRN_TL text_emb default 3965, model/tsrn.py:331).
        # Decode alphabet: blank + table, matching the reference's
        # CTCLabelConverter shift (its head outputs len(character) classes,
        # so the table's last char is unreachable — a reference quirk we
        # inherit rather than silently widen).
        if cfg.args.CHNSR:
            chinese = voc_table("chinese")
            num_class = len(chinese)  # 3965, = opt_TPG.num_class
            cfg.MODEL.text_emb = num_class
            self._alphabet = "-" + chinese
        else:
            num_class = cfg.MODEL.text_emb
            self._alphabet = CRNN_ALPHABET

        self.sr_model = build_generator(cfg.args.arch, cfg)
        if crnn is not None:
            # caller-provided recognizer (CRNN family) — used to pair a
            # custom-width model with weights trained via
            # tatt_tpu.train.pretrain (e.g. the fixture judge asset)
            self.crnn = crnn
            self._parse_fn = parse_crnn_input
            self._tpg_width = 100
        elif cfg.args.tpg == "OPT":
            # NAVER TPG pipeline (Chinese path; main.py:127-144)
            from tatt_tpu.models.recognizers.tpg import TPGModel, parse_opt_input

            self.crnn = (
                TPGModel(num_class=num_class, output_channel=64, hidden_size=32)
                if cfg.args.tiny_tpg
                else TPGModel(num_class=num_class)
            )
            self._parse_fn = parse_opt_input
            self._tpg_width = 512
        else:
            self.crnn = (
                CRNN(nh=16, nm=(8, 8, 16, 16, 32, 32, 32))
                if cfg.args.tiny_tpg
                else CRNN()
            )
            self._parse_fn = parse_crnn_input
            self._tpg_width = 100

        self.uses_prior = cfg.args.arch in ABLATION_SET
        # reference feeds 3 channels to srcnn/rdn/vdsr regardless of --mask
        # (super_resolution.py:1038-1043)
        self.channels = 3 if cfg.args.arch in ("srcnn", "rdn", "vdsr", "edsr", "lapsrn", "han") else (
            4 if cfg.args.mask else 3
        )

        rng = jax.random.PRNGKey(cfg.TRAIN.manualSeed)
        k1, k2, k3 = jax.random.split(rng, 3)
        x = jnp.zeros(
            (
                2,
                4 if cfg.args.mask else 3,
                cfg.TRAIN.height // cfg.scale_factor,
                cfg.TRAIN.width // cfg.scale_factor,
            )
        )
        t = jnp.zeros((2, cfg.MODEL.text_emb, 1, 26))
        luma = jnp.zeros((2, 1, 32, self._tpg_width))
        # the reference clones stu_iter independent SR models / students
        # unless --sr_share / --tpg_share (super_resolution.py:466-469,
        # 524-540); shared configs keep exactly one copy
        sr_share = cfg.args.sr_share or cfg.args.stu_iter == 1
        tpg_share = cfg.args.tpg_share or cfg.args.stu_iter == 1
        n_sr = 1 if sr_share else cfg.args.stu_iter
        n_stu = 1 if tpg_share else cfg.args.stu_iter

        def init_sr(key):
            if self.uses_prior:
                return self.sr_model.init(key, x, t, train=True)
            return self.sr_model.init(key, x[:, : self.channels], train=True)

        sr_vars_list = [
            init_sr(jax.random.fold_in(k1, i)) for i in range(n_sr)
        ]
        if teacher_variables is not None:
            stu_vars_list = [
                {
                    "params": teacher_variables["params"],
                    "batch_stats": teacher_variables.get("batch_stats", {}),
                }
                for _ in range(n_stu)
            ]
        else:
            stu_vars_list = [
                self.crnn.init(jax.random.fold_in(k2, i), luma)
                for i in range(n_stu)
            ]
        self.teacher_vars = (
            teacher_variables
            if teacher_variables is not None
            else self.crnn.init(k3, luma)
        )
        self.judge_vars = judge_variables or self.teacher_vars

        tx = make_optimizer(cfg.lr, cfg.TRAIN.beta1)
        self.state = TrainState.create(sr_vars_list, stu_vars_list, tx)

        self.step_cfg = StepConfig(
            stu_iter=cfg.args.stu_iter,
            sr_share=sr_share,
            tpg_share=tpg_share,
            use_distill=cfg.args.use_distill,
            use_label=cfg.args.use_label,
            for_cascading=cfg.args.for_cascading,
            y_domain=cfg.args.y_domain,
            learning_STN=cfg.args.learning_STN,
            color_loss=cfg.args.color_loss,
            gradient=cfg.args.gradient,
            ssim_loss=cfg.args.ssim_loss,
            tssim_loss=cfg.args.tssim_loss,
            fused_tssim=getattr(cfg.args, "fused_tssim", True),
            mse_fuse=cfg.args.mse_fuse,
            rotate_train=cfg.args.rotate_train,
            training_stablize=cfg.args.training_stablize,
            compute_dtype=cfg.args.dtype,
            mask=cfg.args.mask,
        )
        # uint8 device-collate fast path: RGB recipes only (the y_domain /
        # syn paths produce host-side float tensors by construction)
        self.device_collate = bool(
            getattr(cfg.args, "device_collate", False)
            and not cfg.args.y_domain
            and not cfg.args.syn
        )

        def sr_apply(variables, lr, prior, train, rngs=None, mutable=False):
            return self.sr_model.apply(
                variables, lr, prior, train=train, rngs=rngs, mutable=mutable
            )

        # fused-tssim runs sr and sr_ret in one 2B forward; a bn_copies=2
        # clone of the model computes per-copy BN statistics so the numerics
        # match the two-forward reference semantics.  Models without a
        # bn_copies attribute (zoo _tl variants predating the fused path)
        # and the 'reference' query-GRU compat mode (whose batch-axis scan
        # is batch-size-dependent) fall back to two forwards.
        sr_apply_fused = None
        if (
            self.step_cfg.fused_tssim
            and self.step_cfg.tssim_loss
            and hasattr(self.sr_model, "bn_copies")
            and getattr(self.sr_model, "query_gru_mode", "width") != "reference"
        ):
            sr_model_fused = self.sr_model.clone(bn_copies=2)

            def sr_apply_fused(variables, lr, prior, train, rngs=None, mutable=False):
                return sr_model_fused.apply(
                    variables, lr, prior, train=train, rngs=rngs, mutable=mutable
                )

        def sr_apply_plain(variables, lr, train, rngs=None, mutable=False):
            out = self.sr_model.apply(
                variables, lr, train=train, rngs=rngs, mutable=mutable
            )
            # normalize to (sr, mutated): models may return bare arrays and
            # mutable=False returns no mutation dict
            if mutable:
                sr, mut = out
            else:
                sr, mut = out, {"batch_stats": {}}
            if isinstance(sr, tuple):
                sr = sr[0]
            return sr, mut

        def crnn_apply(variables, luma_in, train, mutable=False):
            return self.crnn.apply(variables, luma_in, train=train, mutable=mutable)

        if self.uses_prior:
            inner_step = make_train_step(
                sr_apply,
                crnn_apply,
                crnn_apply,
                self.step_cfg,
                parse_fn=self._parse_fn,
                sr_apply_fused=sr_apply_fused,
            )
            self._train_step = jax.jit(inner_step, donate_argnums=0)
            # K>1: K optimizer steps per dispatch via lax.scan (TPU-native;
            # amortizes per-dispatch host latency, see make_multi_train_step)
            self.steps_per_dispatch = max(
                1, int(getattr(cfg.args, "steps_per_dispatch", 1))
            )
            if self.steps_per_dispatch > 1:
                self._train_step_multi = jax.jit(
                    make_multi_train_step(inner_step, self.steps_per_dispatch),
                    donate_argnums=0,
                )
            self._eval_step = jax.jit(
                make_eval_step(
                    sr_apply,
                    crnn_apply,
                    parse_fn=self._parse_fn,
                    stu_iter=self.step_cfg.stu_iter,
                    sr_share=self.step_cfg.sr_share,
                    tpg_share=self.step_cfg.tpg_share,
                    for_cascading=self.step_cfg.for_cascading,
                    mask=cfg.args.mask,
                )
            )
        else:
            criterion = build_criterion(cfg.args.arch, cfg)
            self._train_step_plain = jax.jit(
                make_plain_train_step(
                    sr_apply_plain,
                    criterion,
                    self.step_cfg,
                    self.channels,
                    ssim_variant="distorted" if cfg.args.arch == "tsrn" else "ssim",
                ),
                donate_argnums=0,
            )

            def plain_eval(state, batch):
                sr, _ = sr_apply_plain(
                    {
                        "params": state.sr_params[0],
                        "batch_stats": state.sr_batch_stats[0],
                    },
                    batch["images_lr"][:, : self.channels],
                    False,
                )
                return sr, {}

            self._eval_step = jax.jit(plain_eval)
        # judge per --test_model (reference test_bible,
        # super_resolution.py:485-513); a non-CRNN judge REQUIRES weights —
        # silently substituting the CRNN teacher would make reported
        # accuracies non-comparable to the reference protocol
        if judge_variables is not None:
            from tatt_tpu.train.judge import make_judge

            self._judge_fn = make_judge(
                cfg.args.test_model,
                judge_variables,
                cfg.TRAIN.voc_type,
                crnn_model=judge_crnn,
            )
        elif cfg.args.test_model != "CRNN":
            raise ValueError(
                f"--test_model={cfg.args.test_model} requires judge weights: "
                "set TRAIN.VAL.rec_pretrained (ASTER) / moran_pretrained "
                "(MORAN) in the YAML or pass judge_variables"
            )
        else:
            # CRNN judge without dedicated weights: use the teacher CRNN
            self._judge_fn = self._judge_crnn_fn()

        self.train_loader = DataLoader(
            train_dataset,
            batch_size=cfg.batch_size,
            shuffle=True,
            drop_last=True,
            seed=cfg.TRAIN.manualSeed,
            num_workers=max(int(getattr(cfg.TRAIN, "workers", 1)), 1),
            collate_kwargs=dict(
                width=cfg.TRAIN.width,
                height=cfg.TRAIN.height,
                down_sample_scale=cfg.TRAIN.down_sample_scale,
                mask=cfg.args.mask,
                y_domain=cfg.args.y_domain,
                syn=cfg.args.syn,
                alphabet=self._alphabet,
                raw=self.device_collate,
            ),
        )
        self.val_datasets = val_datasets or {}
        self.best_history: dict = {}
        self.best_sum_acc = -1.0
        self.converge_list: list = []

        # LPIPS-VGG eval metric when weights are configured
        # (super_resolution.py:1409-1420); None -> metric omitted
        self._lpips_fn = None
        if lpips_variables is not None:
            from tatt_tpu.losses.perceptual import lpips_vgg

            vgg_vars, lin_weights = lpips_variables
            self._lpips_fn = jax.jit(
                lambda a, b: lpips_vgg(vgg_vars, lin_weights, a, b)
            )

        self.ckpt_dir = os.path.join(cfg.TRAIN.ckpt_dir, cfg.vis_dir)

        self._writer = (
            make_summary_writer(cfg.args.log_dir, cfg.vis_dir)
            if cfg.args.log_dir
            else None
        )

    # ------------------------------------------------------------------
    def _judge_crnn_fn(self):
        """CRNN recognizer fn over the teacher weights (the reference's
        CRNN_init judge, ``interfaces/base.py:712-744``): images -> decoded
        strings.  Used as the default judge and by ``--rec=crnn``."""

        def crnn_apply(variables, luma_in):
            return self.crnn.apply(variables, luma_in, train=False)

        judge_fwd = jax.jit(
            lambda v, images: crnn_apply(v, self._parse_fn(images[:, :3]))
        )

        def _crnn_judge(images):
            return ctc_greedy_decode(
                np.asarray(judge_fwd(self.teacher_vars, images)),
                self._alphabet,
            )

        return _crnn_judge

    # ------------------------------------------------------------------
    def resume(self, path: str) -> None:
        from tatt_tpu.core.checkpoint import (
            is_torch_checkpoint,
            resolve_resume_path,
        )

        path = resolve_resume_path(path)
        if is_torch_checkpoint(path):
            self._resume_torch(path)
            return
        self.state, info = restore_checkpoint(path, self.state)
        # the finetune stage resumes with a NEW lr (train_TATT.sh:2:
        # --resume + lr 2e-4).  inject_hyperparams keeps the lr inside
        # opt_state, so the restore above just resurrected the OLD lr —
        # re-assert the configured one (Adam moments stay restored).
        opt = self.state.opt_state
        hp = getattr(opt, "hyperparams", None)
        if hp is not None and "learning_rate" in hp:
            new_hp = dict(hp)
            new_hp["learning_rate"] = jnp.asarray(
                self.cfg.lr, jnp.asarray(hp["learning_rate"]).dtype
            )
            self.state = self.state.replace(
                opt_state=opt._replace(hyperparams=new_hp)
            )
        self.converge_list = list(info.pop("_converge", []))
        self.best_history = dict(info.pop("_best_history", {}))
        if self.best_history:
            self.best_sum_acc = sum(
                r.get("accuracy", 0.0) for r in self.best_history.values()
            )
        self.log(f"resumed from {path} at step {int(self.state.step)}: {info}")

    def _resume_torch(self, path: str) -> None:
        """Resume from a reference-format torch ``.pth`` checkpoint
        (``interfaces/base.py:398-443``): generator weights through the
        torch importer (params + BN running stats, non-strict like the
        reference's ``strict=False`` load), student recognizers from
        ``recognizer_best_acc_<i>.pth`` beside it
        (``super_resolution.py:528-534``).  Optimizer state starts fresh
        — the reference never checkpoints it (SURVEY §5.4)."""
        from tatt_tpu.core import torch_import as ti
        from tatt_tpu.core.checkpoint import merge_variables

        arch = self.cfg.args.arch
        if arch != "tatt":
            raise SystemExit(
                "--resume from a torch .pth is implemented for --arch=tatt; "
                f"convert {arch!r} weights via tatt_tpu.core.torch_import "
                "and restore a native checkpoint instead"
            )
        if getattr(self.sr_model, "query_gru_mode", "width") != "reference":
            self.log(
                "note: reference TATT checkpoints were trained under the "
                "batch_first query-GRU quirk; set MODEL.query_gru_mode="
                "'reference' to reproduce their inference exactly"
            )

        # the reference's dir-resume loads model_best_acc_<i>.pth into
        # model_list[i] (base.py:403-423): prefer the per-copy sibling
        # when it exists, else load the resolved file into every copy
        def _copy_path(i: int) -> str:
            sib = os.path.join(os.path.dirname(path), f"model_best_acc_{i}.pth")
            return sib if os.path.exists(sib) else path

        report: dict = {"missing": 0}
        imported_by_path: dict = {}

        def _imported(p: str) -> dict:
            if p not in imported_by_path:
                imported_by_path[p] = ti.import_tatt(
                    ti.load_state_dict(p), srb_nums=self.sr_model.srb_nums
                )
            return imported_by_path[p]

        sr_params = tuple(
            merge_variables(p, _imported(_copy_path(i)).get("params", {}), report)
            for i, p in enumerate(self.state.sr_params)
        )
        sr_stats = tuple(
            merge_variables(
                s, _imported(_copy_path(i)).get("batch_stats", {}), report
            )
            for i, s in enumerate(self.state.sr_batch_stats)
        )
        if report.get("mismatched"):
            raise ValueError(
                f"shape mismatch importing {path}: "
                f"{report['mismatched'][:5]} (model config differs from "
                "the checkpoint's; check srb_nums/hidden_units)"
            )
        stu_params = list(self.state.student_params)
        stu_stats = list(self.state.student_batch_stats)
        for i in range(len(stu_params)):
            rec = os.path.join(
                os.path.dirname(path), f"recognizer_best_acc_{i}.pth"
            )
            if os.path.exists(rec):
                rec_vars = ti.import_crnn(rec)
                stu_params[i] = merge_variables(
                    stu_params[i], rec_vars.get("params", {}), report
                )
                stu_stats[i] = merge_variables(
                    stu_stats[i], rec_vars.get("batch_stats", {}), report
                )
                self.log(f"student {i} resumed from {rec}")
        self.state = self.state.replace(
            sr_params=sr_params,
            sr_batch_stats=sr_stats,
            student_params=tuple(stu_params),
            student_batch_stats=tuple(stu_stats),
        )
        self.log(
            f"resumed generator from torch checkpoint {path} "
            f"({report['missing']} target leaves left at init, "
            f"{len(report.get('unexpected', []))} checkpoint entries unused)"
        )

    def _scalars(self, step: int, metrics: dict) -> None:
        if self._writer is None:
            return
        for key, value in metrics.items():
            self._writer.add_scalar(f"loss/{key.replace('loss_', '')}", float(value), step)

    # ------------------------------------------------------------------
    def train(self, max_iters: Optional[int] = None) -> dict:
        cfg = self.cfg
        state = replicate(self.mesh, self.state)
        teacher = replicate(self.mesh, self.teacher_vars)
        iters = int(self.state.step)
        t_start = time.time()
        images_seen = 0

        # K>1: dispatch K optimizer steps as one lax.scan executable
        # (make_multi_train_step) — semantics identical to K sequential
        # steps; interval events crossed inside a chunk fire at the chunk
        # boundary, i.e. at most K-1 iters late.
        k = (
            self.steps_per_dispatch
            if self.uses_prior and hasattr(self, "_train_step_multi")
            else 1
        )
        pending: list = []

        def _display(epoch, step_no, m):
            ips = images_seen / (time.time() - t_start)
            self.log(
                f"[epoch {epoch}] iter {step_no} "
                f"loss {float(m['loss_total']):.3f} "
                f"sr {float(m.get('loss_sr', 0)):.3f} "
                f"distill {float(m.get('loss_distill', 0)):.3f} "
                f"({ips:.1f} img/s)"
            )

        def _boundary(epoch, prev):
            """Fire val/save events crossed in (prev, iters]."""
            nonlocal state
            vi = cfg.TRAIN.VAL.valInterval
            if vi > 0 and iters // vi > prev // vi:
                self.state = jax.device_get(state)
                self._validate_and_checkpoint(iters, epoch)
                state = replicate(self.mesh, self.state)
            si = cfg.TRAIN.saveInterval
            if si > 0 and iters // si > prev // si:
                self.state = jax.device_get(state)
                save_checkpoint(
                    os.path.join(self.ckpt_dir, "checkpoint.ckpt"),
                    self.state,
                    info=self._info(iters, epoch),
                    converge=self.converge_list,
                )

        def _single(arrays, epoch) -> bool:
            """One per-batch step + bookkeeping; True = max_iters reached."""
            nonlocal state, iters, images_seen
            sharded = shard_batch(self.mesh, arrays)
            if self.uses_prior:
                state, metrics = self._train_step(
                    state, teacher, sharded, jax.random.PRNGKey(iters)
                )
            else:
                state, metrics = self._train_step_plain(
                    state, sharded, jax.random.PRNGKey(iters)
                )
            iters += 1
            images_seen += arrays["images_lr"].shape[0]
            if iters % 5 == 0:
                self._scalars(iters, jax.device_get(metrics))
            if iters % cfg.TRAIN.displayInterval == 0:
                _display(epoch, iters, jax.device_get(metrics))
            _boundary(epoch, iters - 1)
            if max_iters is not None and iters >= max_iters:
                self.state = jax.device_get(state)
                self.log(f"training stopped at iter {iters} (max_iters)")
                return True
            return False

        def _chunk(epoch) -> None:
            """Run the K accumulated batches in one dispatch."""
            nonlocal state, iters, images_seen
            prev = iters
            nb = pending[0]["images_lr"].shape[0]
            stacked = {
                key: np.stack([p[key] for p in pending])
                for key in pending[0]
            }
            pending.clear()
            rngs = jnp.stack(
                [jax.random.PRNGKey(prev + j) for j in range(k)]
            )
            state, mstack = self._train_step_multi(
                state, teacher, shard_stacked_batch(self.mesh, stacked), rngs
            )
            iters += k
            images_seen += nb * k
            mhost = None
            for j in range(k):
                step_no = prev + j + 1
                need_scalars = step_no % 5 == 0
                need_log = step_no % cfg.TRAIN.displayInterval == 0
                if need_scalars or need_log:
                    if mhost is None:
                        mhost = jax.device_get(mstack)
                    mj = jax.tree_util.tree_map(lambda a: a[j], mhost)
                    if need_scalars:
                        self._scalars(step_no, mj)
                    if need_log:
                        _display(epoch, step_no, mj)
            _boundary(epoch, prev)

        for epoch in range(cfg.epochs):
            for batch in self.train_loader:
                arrays = batch.device_arrays()
                if k > 1 and (max_iters is None or max_iters - iters >= k):
                    pending.append(arrays)
                    if len(pending) == k:
                        _chunk(epoch)
                        if max_iters is not None and iters >= max_iters:
                            self.state = jax.device_get(state)
                            self.log(
                                f"training stopped at iter {iters} (max_iters)"
                            )
                            return {"iters": iters}
                elif _single(arrays, epoch):
                    return {"iters": iters}
            # epoch boundary: flush a partial chunk per-batch
            leftovers, pending[:] = list(pending), []
            for arrays in leftovers:
                if _single(arrays, epoch):
                    return {"iters": iters}
        self.state = jax.device_get(state)
        self.log(f"training finished at iter {iters}")
        return {"iters": iters}

    def _info(self, iters: int, epoch: int) -> dict:
        return {
            "arch": self.cfg.args.arch,
            "iters": iters,
            "epochs": epoch,
            "batch_size": self.cfg.batch_size,
            "voc_type": self.cfg.TRAIN.voc_type,
            "up_scale_factor": self.cfg.scale_factor,
        }

    def _validate_and_checkpoint(self, iters: int, epoch: int) -> None:
        sum_acc = 0.0
        results = {}
        for name, ds in self.val_datasets.items():
            summary = self.evaluate(ds)
            results[name] = summary
            sum_acc += summary["accuracy"]
            self.log(
                f"eval[{name}] psnr {summary['psnr_avg']:.3f} "
                f"ssim {summary['ssim_avg']:.4f} acc {summary['accuracy']:.4f}"
            )
            if self._writer is not None:
                self._writer.add_scalar(f"eval/psnr_{name}", summary["psnr_avg"], iters)
                self._writer.add_scalar(f"eval/ssim_{name}", summary["ssim_avg"], iters)
                self._writer.add_scalar(f"eval/accuracy_{name}", summary["accuracy"], iters)
        self.converge_list.append({"iterator": iters, "results": results})
        if results and sum_acc > self.best_sum_acc:
            self.best_sum_acc = sum_acc
            self.best_history = results
            save_checkpoint(
                os.path.join(self.ckpt_dir, "model_best_acc_0.ckpt"),
                self.state,
                info=self._info(iters, epoch),
                best_history=results,
                converge=self.converge_list,
            )
            self.log(f"new best sum-acc {sum_acc:.4f} @ iter {iters}")

    # ------------------------------------------------------------------
    def evaluate(self, dataset, batch_size: Optional[int] = None) -> dict:
        cfg = self.cfg
        bs = batch_size or cfg.args.val_batch_size or cfg.batch_size
        loader = DataLoader(
            dataset,
            batch_size=bs,
            shuffle=False,
            drop_last=False,
            collate_kwargs=dict(
                width=cfg.TRAIN.width,
                height=cfg.TRAIN.height,
                down_sample_scale=cfg.TRAIN.down_sample_scale,
                mask=cfg.args.mask,
                y_domain=cfg.args.y_domain,
                alphabet=self._alphabet,
                raw=self.device_collate,
            ),
        )
        acc = EvalAccumulator()
        t0 = time.time()
        n_vis_left = cfg.TRAIN.VAL.n_vis if cfg.args.vis else 0
        for batch in loader:
            arrays = batch.device_arrays()
            if arrays["images_hr"].dtype == np.uint8:
                # raw batches: host metrics (PSNR/SSIM vs HR, the bicubic
                # LR baseline, judge inputs) need the float view
                from tatt_tpu.data.device_pipeline import host_normalize_u8

                arrays = dict(
                    arrays,
                    images_hr=host_normalize_u8(
                        arrays["images_hr"], cfg.args.mask
                    ),
                    images_lr=host_normalize_u8(
                        arrays["images_lr"], cfg.args.mask
                    ),
                )
            n_real = arrays["images_lr"].shape[0]
            # pad tail batches to the full batch size so the jitted eval
            # step compiles once (and stays divisible by the mesh)
            padded, _ = pad_to_multiple(arrays, bs)
            sr, aux = self._eval_step(self.state, padded)
            sr = np.asarray(sr)[:n_real]
            hr = arrays["images_hr"]
            p = float(psnr_fn(sr, hr))
            s = float(ssim_fn(jnp.asarray(sr), jnp.asarray(hr)))
            # LR baseline metrics on the bicubic upscale, as the reference
            # does (super_resolution.py:1409,1417-1418)
            from tatt_tpu.kernels.resize import resize_bicubic

            lr_up = np.asarray(
                resize_bicubic(
                    jnp.asarray(arrays["images_lr"]), hr.shape[-2], hr.shape[-1]
                )
            )
            p_lr = float(psnr_fn(lr_up, hr))
            s_lr = float(ssim_fn(jnp.asarray(lr_up), jnp.asarray(hr)))
            lpips_sr = lpips_lr = None
            if self._lpips_fn is not None:
                lpips_sr = float(
                    np.mean(self._lpips_fn(jnp.asarray(sr), jnp.asarray(hr)))
                )
                lpips_lr = float(
                    np.mean(self._lpips_fn(jnp.asarray(lr_up), jnp.asarray(hr)))
                )
            preds_sr = self._judge_fn(jnp.asarray(sr))
            preds_lr = self._judge_fn(jnp.asarray(arrays["images_lr"]))
            preds_hr = self._judge_fn(jnp.asarray(hr))
            acc.add_batch(
                p,
                s,
                preds_sr,
                preds_lr,
                preds_hr,
                batch.label_strs,
                # the accuracy protocol filters to lowercase+digits
                # (super_resolution.py:1539); Chinese runs filter on the
                # 3965-char table instead
                filter_mode="chinese" if cfg.args.CHNSR else "lower",
                psnr_lr=p_lr,
                ssim_lr=s_lr,
                lpips_sr=lpips_sr,
                lpips_lr=lpips_lr,
                n_real=n_real,
            )
            if n_vis_left > 0:
                from tatt_tpu.train.demo import attention_grid, triptych

                out_root = os.path.join("demo", cfg.vis_dir)
                pr_weights = (
                    np.asarray(aux["pr_weights"])
                    if isinstance(aux, dict) and aux.get("pr_weights") is not None
                    else None
                )
                for vi in range(min(n_vis_left, n_real)):
                    name = (
                        f"{preds_lr[vi]}_{preds_sr[vi]}_"
                        f"{batch.label_strs[vi]}_.png"
                    ).replace("/", "")
                    triptych(
                        arrays["images_lr"][vi],
                        sr[vi],
                        hr[vi],
                        os.path.join(out_root, name),
                    )
                    if pr_weights is not None:
                        # TP-Interpreter cross-attention tiles
                        # (super_resolution.py:925-1020)
                        attention_grid(
                            pr_weights[vi],
                            arrays["images_lr"][vi],
                            os.path.join(out_root, "att_" + name),
                            feat_hw=(
                                cfg.TRAIN.height // cfg.scale_factor,
                                cfg.TRAIN.width // cfg.scale_factor,
                            ),
                        )
                    n_vis_left -= 1
        acc.infer_time = time.time() - t0
        return acc.summary()
