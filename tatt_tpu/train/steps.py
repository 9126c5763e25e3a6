"""Jitted train/eval steps.

The reference's per-batch Python (rotation aug, teacher prior, per-stu_iter
student prior -> SR forward -> losses, backward, clip, Adam —
``interfaces/super_resolution.py:575-1085``) collapses here into ONE pure
jitted function: all augmentation runs on device, the ``stu_iter`` loop is
unrolled at trace time, and XLA fuses the whole loss stack.  Data-parallel
scaling is sharding, not code: batch inputs arrive sharded over the mesh's
"data" axis and XLA inserts the gradient all-reduce.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from tatt_tpu.kernels.grid_sample import rotate_batch
from tatt_tpu.losses.distill import semantic_loss
from tatt_tpu.losses.image import image_loss
from tatt_tpu.losses.ssim import ssim as ssim_fn
from tatt_tpu.losses.ssim import tri_ssim
from tatt_tpu.models.recognizers.crnn import parse_crnn_input
from tatt_tpu.train.state import TrainState, clip_grads_per_model


class StepConfig(NamedTuple):
    """Static training options (subset of the reference flags that shape
    the loss; names match ``main.py:23-69``)."""

    stu_iter: int = 1
    sr_share: bool = True
    tpg_share: bool = False
    use_distill: bool = True
    use_label: bool = False
    for_cascading: bool = False
    y_domain: bool = False
    learning_STN: bool = False
    color_loss: bool = False
    gradient: bool = True
    ssim_loss: bool = False
    tssim_loss: bool = True
    # one 2B forward computes sr+sr_ret together (halves the sequential GRU
    # chain count).  Faithful to the two-forward reference semantics: BN
    # statistics are computed per-copy (see BatchNorm2d.copies), so this is
    # the default.  Requires sr_apply_fused (a bn_copies=2 model instance).
    fused_tssim: bool = True
    mse_fuse: bool = False
    rotate_train: float = 5.0
    training_stablize: bool = False
    grad_clip: float = 0.25
    compute_dtype: str = "float32"  # "bfloat16" halves MXU/HBM pressure
    # mask-channel flag for the uint8 device-collate fast path (the host
    # collate bakes the mask into its float tensors; raw batches build it
    # on device — data/device_pipeline.py)
    mask: bool = True


def _rbg_key(key: jax.Array) -> jax.Array:
    """Re-key the dropout stream to the ``rbg`` PRNG implementation.

    Threefry2x32 mask generation costs ~1.9 ms/step at the transformer's
    [2B,1024,64] + attention [2B,4,1024,26] shapes (device trace, BENCH
    NOTES round 3); ``rbg`` lowers to the TPU's native RngBitGenerator.
    Key derivation (split/fold_in) stays cheap either way — only the bulk
    bit generation changes, so dropout masks remain iid Bernoulli, just
    from a different (still splittable) counter-based generator.
    """
    raw = (
        jax.random.key_data(key)
        if jnp.issubdtype(key.dtype, jax.dtypes.prng_key)
        else key
    ).reshape(-1)[:2]
    return jax.random.wrap_key_data(
        jnp.concatenate([raw, raw]).astype(jnp.uint32), impl="rbg"
    )


def loss_stablize(loss_set: jnp.ndarray, keep: float = 0.7) -> jnp.ndarray:
    """Drop the worst (1-keep) fraction of per-sample losses.  The
    reference's ``loss_stablizing`` (``super_resolution.py:84-93``) intends
    this but zeroes a contiguous slice due to an indexing bug; we implement
    the intended top-k mask."""
    b = loss_set.shape[0]
    k = int(keep * b)
    threshold = jnp.sort(loss_set)[k - 1] if k > 0 else jnp.inf
    return jnp.where(loss_set <= threshold, loss_set, 0.0)


def make_train_step(
    sr_apply: Callable,
    student_apply: Callable,
    teacher_apply: Callable,
    cfg: StepConfig,
    parse_fn: Callable = parse_crnn_input,
    sr_apply_fused: Optional[Callable] = None,
):
    """Builds the jitted train step.

    ``sr_apply(variables, lr_images, prior, train, rngs, mutable)`` — the
    generator; ``student_apply/teacher_apply(variables, luma, train, ...)``
    — recognizer forwards returning [T, B, C] logits; ``parse_fn`` is the
    recognizer input adapter (``parse_crnn_data`` or ``parse_OPT_data``
    for ``--tpg OPT``).  ``sr_apply_fused``: same signature, but a model
    instance with ``bn_copies=2`` (per-copy BN stats over the packed 2B
    batch); required when ``cfg.fused_tssim`` — without it the step falls
    back to the two-forward path."""
    use_fused = cfg.tssim_loss and cfg.fused_tssim and sr_apply_fused is not None

    def step_fn(state: TrainState, teacher_vars, batch: dict, rng: jax.Array):
        from tatt_tpu.data.device_pipeline import prep_image_batch

        batch = prep_image_batch(batch, cfg.mask)
        if cfg.y_domain:
            # YUV training: luma channels for the SR loss, raw RGB for the
            # recognizer priors (super_resolution.py:614-623,772,794)
            hr_raw, lr_raw = batch["images_hr"], batch["images_lr"]
            images_hr = jnp.concatenate(
                [batch["images_hr_y"][:, :3], hr_raw[:, 3:]], axis=1
            )
            images_lr = jnp.concatenate(
                [batch["images_lr_y"][:, :3], lr_raw[:, 3:]], axis=1
            )
        else:
            hr_raw = lr_raw = None
            images_hr = batch["images_hr"]
            images_lr = batch["images_lr"]

        rot_rng, drop_rng = jax.random.split(rng)
        drop_rng = _rbg_key(drop_rng)

        if cfg.rotate_train:
            b = images_lr.shape[0]
            if "rot_arc" in batch:
                # deterministic override (lockstep experiments / tests)
                arc = batch["rot_arc"]
                rand_offs = batch["rot_offs"]
            else:
                a_rng, o_rng = jax.random.split(rot_rng)
                angle = (
                    jax.random.uniform(a_rng, (b,)) * 2.0 - 1.0
                ) * cfg.rotate_train
                arc = angle / 180.0 * math.pi
                rand_offs = jax.random.uniform(o_rng, (b,))
            images_lr = rotate_batch(images_lr, arc, rand_offs)
            images_hr = rotate_batch(images_hr, arc, rand_offs)
            images_lr_ret = rotate_batch(images_lr, -arc, rand_offs)
        else:
            arc = rand_offs = None
            images_lr_ret = images_lr

        cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

        # Teacher prior from HR (frozen, eval-mode BN) — detached
        # (super_resolution.py:772-774); raw RGB in y_domain mode
        hr_luma = parse_fn(
            (hr_raw if cfg.y_domain else images_hr)[:, :3]
        ).astype(cdt)
        teacher_logits = teacher_apply(teacher_vars, hr_luma, False).astype(
            jnp.float32
        )
        label_vecs_hr = jax.lax.stop_gradient(
            jax.nn.softmax(teacher_logits, axis=-1)
        )

        lr_luma = parse_fn(
            (lr_raw if cfg.y_domain else images_lr)[:, :3]
        ).astype(cdt)

        def loss_fn(params):
            sr_params, stu_params = params["sr"], params["student"]
            new_sr_stats = list(state.sr_batch_stats)
            new_stu_stats = list(state.student_batch_stats)

            loss_img = 0.0
            loss_distill = 0.0
            metrics = {}
            cascade_images = images_lr
            for i in range(cfg.stu_iter):
                tpg_pick = 0 if cfg.tpg_share else i
                pick = 0 if cfg.sr_share else i

                # the reference detaches cascade_images at loop top
                # (super_resolution.py:786) and feeds it to the student even
                # without --for_cascading: at i>0 the student refines the
                # previous iteration's (detached) SR output
                cascade_images = jax.lax.stop_gradient(cascade_images)
                if cfg.for_cascading and i > 0:
                    # feed the previous SR back as the next LR input
                    # (super_resolution.py:808-824): bicubic to LR size,
                    # clamp, average with the original LR
                    from tatt_tpu.kernels.resize import resize_bicubic

                    prev = resize_bicubic(
                        cascade_images, images_lr.shape[2], images_lr.shape[3]
                    )
                    prev = jnp.clip(prev, 0.0, 1.0)
                    cascade_images = (prev + images_lr) / 2.0
                if i == 0 or cfg.y_domain:
                    # y_domain always feeds the raw LR RGB to the student
                    # (super_resolution.py:794)
                    stage_luma = lr_luma
                else:
                    stage_luma = parse_fn(cascade_images[:, :3]).astype(cdt)

                stu_vars = {
                    "params": stu_params[tpg_pick],
                    "batch_stats": new_stu_stats[tpg_pick],
                }
                stu_logits, stu_mut = student_apply(
                    stu_vars, stage_luma, True, mutable=["batch_stats"]
                )
                stu_logits = stu_logits.astype(jnp.float32)
                new_stu_stats[tpg_pick] = stu_mut["batch_stats"]
                label_vecs = jax.nn.softmax(stu_logits, axis=-1)  # [T,B,C]
                prior = jax.lax.stop_gradient(
                    label_vecs.transpose(1, 2, 0)[:, :, None, :]  # [B,C,1,T]
                ).astype(cdt)

                sr_vars = {
                    "params": sr_params[pick],
                    "batch_stats": new_sr_stats[pick],
                }
                main_input = (
                    cascade_images if cfg.for_cascading else images_lr
                )
                fused_ret = use_fused
                if fused_ret:
                    # run the tssim counter-rotated copy in the SAME forward
                    # (batch 2B) — halves the sequential GRU chain count.
                    # sr_apply_fused's BatchNorms compute per-copy batch
                    # statistics, so this is numerically the reference's two
                    # consecutive forwards (super_resolution.py:873,910-914)
                    # up to independent dropout draws.
                    nb = main_input.shape[0]
                    fwd_in = jnp.concatenate(
                        [main_input, images_lr_ret], axis=0
                    )
                    fwd_prior = jnp.concatenate([prior, prior], axis=0)
                    (sr, aux), sr_mut = sr_apply_fused(
                        sr_vars,
                        fwd_in.astype(cdt),
                        fwd_prior,
                        True,
                        rngs={"dropout": jax.random.fold_in(drop_rng, i)},
                        mutable=["batch_stats"],
                    )
                else:
                    (sr, aux), sr_mut = sr_apply(
                        sr_vars,
                        main_input.astype(cdt),
                        prior,
                        True,
                        rngs={"dropout": jax.random.fold_in(drop_rng, i)},
                        mutable=["batch_stats"],
                    )
                new_sr_stats[pick] = sr_mut["batch_stats"]
                sr = sr.astype(jnp.float32)
                if fused_ret:
                    sr, sr_ret_fused = sr[:nb], sr[nb:]
                    # aux features also pack both copies — keep the main
                    # copy only, so learning_STN's rectification-consistency
                    # loss sees exactly the unfused tensors
                    aux = {
                        k: (v[:nb] if hasattr(v, "shape") and v.shape and v.shape[0] == 2 * nb else v)
                        for k, v in aux.items()
                    }
                else:
                    sr_ret_fused = None
                cascade_images = sr

                if cfg.use_label:
                    # text-focus CTC on the HR teacher logits against the
                    # spread label ids (super_resolution.py:842-852)
                    from tatt_tpu.kernels.ctc import ctc_loss

                    log_probs = jax.nn.log_softmax(teacher_logits, axis=-1)
                    t_frames = teacher_logits.shape[0]
                    bsz = teacher_logits.shape[1]
                    fsup = ctc_loss(
                        log_probs,
                        batch["ctc_targets"],
                        jnp.full((bsz,), t_frames, jnp.int32),
                        batch["ctc_lengths"],
                    )
                    loss_distill = loss_distill + (
                        fsup * batch["weighted_tics"]
                    ).mean()

                if cfg.use_distill:
                    d = semantic_loss(label_vecs, label_vecs_hr) * 100.0
                    loss_distill = loss_distill + d
                    # tb-scalar parity: the reference's SummaryWriter logs the
                    # LAST iteration's term (super_resolution.py:1025), while
                    # its console print logs the accumulated sum (:1107);
                    # loss_distill (set after the loop) carries the sum.
                    metrics["loss_distill_each"] = d

                imq = image_loss(sr, images_hr, gradient=cfg.gradient)
                if cfg.training_stablize:
                    imq = loss_stablize(imq)
                each = imq.mean() * 100.0
                if cfg.learning_STN:
                    # rectification consistency (super_resolution.py:896-901)
                    each = each + image_loss(
                        aux["in_feat"].astype(jnp.float32),
                        aux["trans_feat"].astype(jnp.float32),
                        gradient=cfg.gradient,
                    ).mean()
                loss_img = loss_img + each * (1.0 + i * 0.5)
                metrics["loss_sr"] = each

                if cfg.ssim_loss:
                    s = (1.0 - ssim_fn(sr, images_hr)) * 10.0
                    loss_img = loss_img + s
                    metrics["loss_ssim"] = s

                if cfg.tssim_loss:
                    if fused_ret:
                        sr_ret = sr_ret_fused
                    else:
                        (sr_ret, _), sr_mut2 = sr_apply(
                            {
                                "params": sr_params[pick],
                                "batch_stats": new_sr_stats[pick],
                            },
                            images_lr_ret.astype(cdt),
                            prior,
                            True,
                            rngs={
                                "dropout": jax.random.fold_in(drop_rng, 100 + i)
                            },
                            mutable=["batch_stats"],
                        )
                        new_sr_stats[pick] = sr_mut2["batch_stats"]
                        sr_ret = sr_ret.astype(jnp.float32)
                    if cfg.rotate_train:
                        sr_ret = rotate_batch(sr_ret, arc, rand_offs)
                    ts = (1.0 - tri_ssim(sr_ret, sr, images_hr)) * 10.0
                    loss_img = loss_img + ts
                    metrics["loss_tssim"] = ts

            total = loss_img + loss_distill
            if cfg.use_distill or cfg.use_label:
                metrics["loss_distill"] = loss_distill
            metrics["loss_total"] = total
            metrics["sr_mean"] = sr[:, :3].mean()
            metrics["sr_min"] = sr[:, :3].min()
            metrics["sr_max"] = sr[:, :3].max()
            return total, (tuple(new_sr_stats), tuple(new_stu_stats), metrics)

        params = {"sr": state.sr_params, "student": state.student_params}
        (loss, (sr_stats, stu_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        metrics["grad_norm_sr"] = jnp.sqrt(
            sum(
                jnp.sum(g.astype(jnp.float32) ** 2)
                for g in jax.tree_util.tree_leaves(grads["sr"][0])
            )
        )
        for key, sub in grads["sr"][0].items():
            metrics[f"gnorm/{key}"] = jnp.sqrt(
                sum(
                    jnp.sum(g.astype(jnp.float32) ** 2)
                    for g in jax.tree_util.tree_leaves(sub)
                )
            )

        grads = {
            "sr": clip_grads_per_model(grads["sr"], cfg.grad_clip),
            "student": grads["student"],
        }
        updates, new_opt_state = state.tx.update(grads, state.opt_state, params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, params, updates
        )

        new_state = state.replace(
            step=state.step + 1,
            sr_params=new_params["sr"],
            student_params=new_params["student"],
            sr_batch_stats=sr_stats,
            student_batch_stats=stu_stats,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    return step_fn


def make_multi_train_step(step_fn: Callable, k: int):
    """Wrap a train step so K optimizer steps run inside ONE dispatch.

    TPU-native addition with no reference counterpart: the reference's
    torch loop launches kernels per python iteration, while under jit the
    whole K-step ``lax.scan`` is a single executable — per-dispatch host
    latency (significant on remote-attached hosts) is paid once per K
    steps instead of every step.  Semantics are exactly K sequential
    ``step_fn`` calls: each scan iteration consumes its own batch slice
    and rng, so losses/stats/optimizer state evolve identically (the
    equivalence is asserted by
    ``tests/test_train_step.py::test_multi_step_scan_matches_sequential``).

    ``batches``: the per-step batch dict with every leaf stacked along a
    new leading axis of size K.  ``rngs``: [K, 2] stacked PRNG keys.
    Returns the final state and per-step metrics stacked along axis 0.
    """

    def multi_step(state, teacher_vars, batches, rngs):
        def body(s, xs):
            b, r = xs
            s2, m = step_fn(s, teacher_vars, b, r)
            return s2, m

        return jax.lax.scan(body, state, (batches, rngs), length=k)

    return multi_step


def make_plain_train_step(
    sr_apply: Callable,
    criterion: Callable,
    cfg: StepConfig,
    channels: int = 4,
    ssim_variant: str = "ssim",
):
    """Train step for archs without a text prior (reference branches at
    ``super_resolution.py:664-688`` for tsrn and ``:1037-1063`` for the
    baselines): image criterion x100, optional SSIM/TSSIM terms.

    ``sr_apply(variables, lr, train, rngs, mutable) -> (sr, mutated)``.
    """

    def step_fn(state: TrainState, batch: dict, rng: jax.Array):
        from tatt_tpu.data.device_pipeline import prep_image_batch

        batch = prep_image_batch(batch, cfg.mask)
        images_hr = batch["images_hr"][:, :channels]
        images_lr = batch["images_lr"][:, :channels]
        rot_rng, drop_rng = jax.random.split(rng)
        drop_rng = _rbg_key(drop_rng)

        if cfg.rotate_train:
            b = images_lr.shape[0]
            a_rng, o_rng = jax.random.split(rot_rng)
            angle = (jax.random.uniform(a_rng, (b,)) * 2.0 - 1.0) * cfg.rotate_train
            arc = angle / 180.0 * math.pi
            rand_offs = jax.random.uniform(o_rng, (b,))
            images_lr = rotate_batch(images_lr, arc, rand_offs)
            images_hr = rotate_batch(images_hr, arc, rand_offs)
            images_lr_ret = rotate_batch(images_lr, -arc, rand_offs)
        else:
            arc = rand_offs = None
            images_lr_ret = images_lr

        def loss_fn(params):
            sr_vars = {
                "params": params["sr"][0],
                "batch_stats": state.sr_batch_stats[0],
            }
            sr, mut = sr_apply(
                sr_vars,
                images_lr,
                True,
                rngs={"dropout": drop_rng},
                mutable=["batch_stats"],
            )
            metrics = {}
            loss = criterion(sr, images_hr).mean() * 100.0
            metrics["loss_sr"] = loss
            if cfg.color_loss:
                # mean-color consistency x30 (super_resolution.py:669-672)
                c = (
                    jnp.abs(
                        images_lr.mean(axis=(2, 3)) - sr.mean(axis=(2, 3))
                    ).mean()
                    * 30.0
                )
                loss = loss + c
                metrics["loss_color"] = c
            if cfg.ssim_loss:
                # the tsrn branch uses Distorted_SSIM for --ssim_loss
                # (super_resolution.py:677); baselines use plain SSIM
                if ssim_variant == "distorted":
                    from tatt_tpu.losses.ssim import distorted_ssim

                    s = (1.0 - distorted_ssim(sr, images_hr)) * 10.0
                else:
                    s = (1.0 - ssim_fn(sr, images_hr)) * 10.0
                loss = loss + s
                metrics["loss_ssim"] = s
            if cfg.tssim_loss:
                sr_ret, mut = sr_apply(
                    {"params": params["sr"][0], "batch_stats": mut["batch_stats"]},
                    images_lr_ret,
                    True,
                    rngs={"dropout": jax.random.fold_in(drop_rng, 1)},
                    mutable=["batch_stats"],
                )
                if cfg.rotate_train:
                    sr_ret = rotate_batch(sr_ret, arc, rand_offs)
                ts = (1.0 - tri_ssim(sr_ret, sr, images_hr)) * 10.0
                loss = loss + ts
                metrics["loss_tssim"] = ts
            if cfg.mse_fuse:
                # rotation-consistency MSE fuse x100 (tsrn branch,
                # super_resolution.py:692-700). The reference computes the
                # rotated-back copy but compares against the unrotated one
                # — we use the rotated-back copy (the intended target).
                sr_ret2, mut = sr_apply(
                    {"params": params["sr"][0], "batch_stats": mut["batch_stats"]},
                    images_lr_ret,
                    True,
                    rngs={"dropout": jax.random.fold_in(drop_rng, 2)},
                    mutable=["batch_stats"],
                )
                if cfg.rotate_train:
                    sr_ret2 = rotate_batch(sr_ret2, arc, rand_offs)
                mf = (
                    criterion(sr, jax.lax.stop_gradient(sr_ret2)).mean() * 100.0
                )
                loss = loss + mf
                metrics["loss_mse_fuse"] = mf
            metrics["loss_total"] = loss
            return loss, ((mut["batch_stats"],), metrics)

        params = {"sr": state.sr_params, "student": state.student_params}
        (loss, (sr_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        grads = {
            "sr": clip_grads_per_model(grads["sr"], cfg.grad_clip),
            "student": grads["student"],
        }
        updates, new_opt_state = state.tx.update(grads, state.opt_state, params)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        new_state = state.replace(
            step=state.step + 1,
            sr_params=new_params["sr"],
            student_params=new_params["student"],
            sr_batch_stats=sr_stats,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    return step_fn


def make_eval_step(
    sr_apply: Callable,
    student_apply: Callable,
    parse_fn: Callable = parse_crnn_input,
    stu_iter: int = 1,
    sr_share: bool = True,
    tpg_share: bool = True,
    for_cascading: bool = False,
    mask: bool = True,
):
    """Eval: student prior -> SR forward (eval mode), mirroring
    ``model_inference`` (``super_resolution.py:240-449``) including the
    per-``stu_iter`` cascade.  Returns (sr of the final iteration, aux)
    — the reference headlines the last iteration's metrics
    (``super_resolution.py:1627-1700``)."""

    def eval_fn(state: TrainState, batch: dict):
        from tatt_tpu.data.device_pipeline import prep_image_batch

        batch = prep_image_batch(batch, mask)
        images_lr = batch["images_lr"]
        cascade = images_lr
        sr = None
        aux = None
        for i in range(stu_iter):
            # student at i>0 sees the previous SR output, like training
            # (model_inference, super_resolution.py:316-318,374-376)
            lr_luma = parse_fn(cascade[:, :3])
            if for_cascading and i > 0:
                from tatt_tpu.kernels.resize import resize_bicubic

                prev = resize_bicubic(
                    cascade, images_lr.shape[2], images_lr.shape[3]
                )
                sr_input = (jnp.clip(prev, 0.0, 1.0) + images_lr) / 2.0
            else:
                sr_input = images_lr
            tpg_pick = 0 if tpg_share else i
            pick = 0 if sr_share else i
            stu_vars = {
                "params": state.student_params[tpg_pick],
                "batch_stats": state.student_batch_stats[tpg_pick],
            }
            stu_logits = student_apply(stu_vars, lr_luma, False)
            prior = jax.nn.softmax(stu_logits, axis=-1).transpose(1, 2, 0)[
                :, :, None, :
            ]
            sr_vars = {
                "params": state.sr_params[pick],
                "batch_stats": state.sr_batch_stats[pick],
            }
            sr, aux = sr_apply(
                sr_vars, sr_input if for_cascading else images_lr, prior, False
            )
            cascade = sr
        return sr, aux

    return eval_fn
