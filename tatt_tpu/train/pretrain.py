"""Recognizer pretraining — CTC training for the CRNN judge/TPG.

The reference never trains its recognizers: CRNN/ASTER/MORAN arrive as
pretrained ``.pth`` downloads (``README.md:28-35``) and are consumed by
``CRNN_init``/``TPG_init`` (``interfaces/base.py:712-744, 764-835``).
That leaves the framework incomplete without external artifacts — the
accuracy half of the eval protocol (``interfaces/super_resolution.py:
1518-1560``) needs a recognizer that actually reads text.  This module
closes the loop natively: a jitted CTC training step over any dataset
with the ``(img_HR, img_lr, label)`` sample contract, producing weights
interchangeable with the imported ``.pth`` ones.

TPU-first notes: the whole step (augmentation, bicubic 32x100 resize,
luma, CRNN forward, CTC, Adam) is ONE jitted function — augmentation is
device-side (separable Gaussian blur with per-sample sigma, noise,
brightness/contrast), so the 1-vCPU host only stacks cached uint8 crops.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tatt_tpu.core.charset import CRNN_ALPHABET, ctc_greedy_decode, str_filt
from tatt_tpu.kernels.ctc import ctc_loss
from tatt_tpu.models.recognizers.crnn import parse_crnn_input


def encode_ctc_targets(
    labels, alphabet: str = CRNN_ALPHABET, max_len: int = 16
) -> tuple[np.ndarray, np.ndarray]:
    """Labels -> padded id matrix [B, max_len] + lengths [B].

    Ids index ``alphabet`` with blank=0 excluded from targets (torch
    ``nn.CTCLoss(blank=0)`` convention the reference uses,
    ``interfaces/super_resolution.py:51``)."""
    a2d = {ch: i for i, ch in enumerate(alphabet)}
    out = np.zeros((len(labels), max_len), dtype=np.int32)
    lens = np.zeros((len(labels),), dtype=np.int32)
    for b, word in enumerate(labels):
        ids = [a2d[ch] for ch in word.lower() if ch in a2d and a2d[ch] != 0]
        ids = ids[:max_len]
        out[b, : len(ids)] = ids
        lens[b] = len(ids)
    return out, lens


def _gaussian_taps(sigma: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Per-sample 1-D Gaussian taps [B, 2r+1]; sigma~0 -> identity tap."""
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    s = jnp.maximum(sigma[:, None], 1e-3)
    w = jnp.exp(-0.5 * (x[None, :] / s) ** 2)
    return w / jnp.sum(w, axis=1, keepdims=True)


def augment_images(key: jax.Array, images: jnp.ndarray, max_sigma: float = 1.0) -> jnp.ndarray:
    """Device-side photometric augmentation for recognizer robustness.

    [B, C, H, W] in [0,1] -> blurred (separable Gaussian, per-sample
    sigma in [0, max_sigma]), noised (sigma<=8/255), brightness/contrast
    jittered (+-15%).  Mild blur keeps the judge readable on SR-quality
    output without teaching it to read the 2x-downsampled LR domain."""
    b = images.shape[0]
    k_sig, k_nsig, k_noise, k_bright, k_contrast = jax.random.split(key, 5)
    radius = max(int(np.ceil(3 * max_sigma)), 1)
    sigma = jax.random.uniform(k_sig, (b,), minval=0.0, maxval=max_sigma)
    taps = _gaussian_taps(sigma, radius)  # [B, K]

    def blur_one(img, t):
        # img [C, H, W]; separable same-padding correlation per axis
        pad_w = jnp.pad(img, ((0, 0), (0, 0), (radius, radius)), mode="edge")
        idx = jnp.arange(img.shape[-1])[:, None] + jnp.arange(2 * radius + 1)[None, :]
        img = jnp.einsum("chwk,k->chw", pad_w[:, :, idx], t)
        pad_h = jnp.pad(img, ((0, 0), (radius, radius), (0, 0)), mode="edge")
        idxh = jnp.arange(img.shape[-2])[:, None] + jnp.arange(2 * radius + 1)[None, :]
        return jnp.einsum("chkw,k->chw", pad_h[:, idxh, :], t)

    images = jax.vmap(blur_one)(images, taps)
    noise_sigma = jax.random.uniform(k_nsig, (b, 1, 1, 1), maxval=8.0 / 255.0)
    images = images + noise_sigma * jax.random.normal(k_noise, images.shape)
    bright = jax.random.uniform(k_bright, (b, 1, 1, 1), minval=-0.15, maxval=0.15)
    contrast = jax.random.uniform(k_contrast, (b, 1, 1, 1), minval=0.85, maxval=1.15)
    return jnp.clip((images - 0.5) * contrast + 0.5 + bright, 0.0, 1.0)


@dataclass
class PretrainResult:
    variables: dict
    history: list = field(default_factory=list)
    final_accuracy: float = 0.0


def pretrain_recognizer(
    crnn,
    dataset,
    *,
    steps: int = 3000,
    batch_size: int = 128,
    lr: float = 1e-3,
    seed: int = 0,
    alphabet: str = CRNN_ALPHABET,
    target_max_len: int = 16,
    augment: bool = True,
    max_sigma: float = 1.0,
    eval_dataset=None,
    eval_every: int = 500,
    log_fn: Optional[Callable[[str], None]] = print,
) -> PretrainResult:
    """Train ``crnn`` with CTC on the HR crops of ``dataset``.

    ``dataset[i] -> (img_HR, img_lr, label)`` (the lmdbDataset_real
    contract); only HR + label are consumed.  Returns trained variables
    ready for ``Trainer(teacher_variables=..., judge_variables=...)``.
    """
    rng = np.random.default_rng(seed)
    n = len(dataset)

    # host cache: uint8 HWC crops + encoded targets, built once
    hr_cache = np.stack(
        [np.asarray(dataset[i][0].convert("RGB"), dtype=np.uint8) for i in range(n)]
    )
    labels = [dataset[i][2] for i in range(n)]
    targets_all, lens_all = encode_ctc_targets(labels, alphabet, target_max_len)

    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    luma0 = jnp.zeros((2, 1, 32, 100))
    variables = crnn.init(k_init, luma0)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    # warmup + cosine decay to 5% of peak: CTC training has a long
    # alignment-locking phase where a constant lr plateaus
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=lr * 0.1,
        peak_value=lr,
        warmup_steps=min(200, steps // 10),
        decay_steps=steps,
        end_value=lr * 0.05,
    )
    tx = optax.adam(schedule)
    opt_state = tx.init(params)

    t_logit = 26  # CRNN emits [26, B, C] (model/crnn/crnn.py:76-92)

    def train_step(params, batch_stats, opt_state, images_u8, targets, tlens, step_key):
        images = images_u8.astype(jnp.float32) / 255.0  # [B, H, W, C]
        images = images.transpose(0, 3, 1, 2)
        if augment:
            images = augment_images(step_key, images, max_sigma)
        luma = parse_crnn_input(images)

        def loss_fn(p):
            logits, mut = crnn.apply(
                {"params": p, "batch_stats": batch_stats},
                luma,
                train=True,
                mutable=["batch_stats"],
            )
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            per = ctc_loss(
                logp,
                targets,
                jnp.full((targets.shape[0],), t_logit, jnp.int32),
                tlens,
            )
            return jnp.mean(per), mut

        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, mut["batch_stats"], opt_state, loss

    train_step = jax.jit(train_step, donate_argnums=(0, 1, 2))

    infer = jax.jit(
        lambda p, bs, images: crnn.apply(
            {"params": p, "batch_stats": bs},
            parse_crnn_input(images),
            train=False,
        )
    )

    def word_accuracy(params, batch_stats, imgs_u8, labels_sub, chunk=256):
        hits = 0
        for lo in range(0, len(labels_sub), chunk):
            imgs = jnp.asarray(
                imgs_u8[lo : lo + chunk].astype(np.float32) / 255.0
            ).transpose(0, 3, 1, 2)
            preds = ctc_greedy_decode(np.asarray(infer(params, batch_stats, imgs)), alphabet)
            hits += sum(
                str_filt(p, "lower") == str_filt(t, "lower")
                for p, t in zip(preds, labels_sub[lo : lo + chunk])
            )
        return hits / max(len(labels_sub), 1)

    history = []
    t0 = time.time()
    loss_acc, loss_n = 0.0, 0
    for step in range(1, steps + 1):
        idx = rng.integers(0, n, size=batch_size)
        key, k_step = jax.random.split(key)
        params, batch_stats, opt_state, loss = train_step(
            params,
            batch_stats,
            opt_state,
            jnp.asarray(hr_cache[idx]),
            jnp.asarray(targets_all[idx]),
            jnp.asarray(lens_all[idx]),
            k_step,
        )
        loss_acc += float(loss)
        loss_n += 1
        if step % eval_every == 0 or step == steps:
            ev = eval_dataset if eval_dataset is not None else dataset
            ev_n = min(len(ev), 512)
            ev_imgs = np.stack(
                [np.asarray(ev[i][0].convert("RGB"), np.uint8) for i in range(ev_n)]
            )
            ev_labels = [ev[i][2] for i in range(ev_n)]
            acc = word_accuracy(params, batch_stats, ev_imgs, ev_labels)
            history.append(
                {"step": step, "loss": loss_acc / max(loss_n, 1), "acc": acc}
            )
            if log_fn:
                log_fn(
                    f"[pretrain] step {step}/{steps} loss {loss_acc / max(loss_n, 1):.4f} "
                    f"word-acc {acc:.4f} ({time.time() - t0:.0f}s)"
                )
            loss_acc, loss_n = 0.0, 0

    final = {
        "params": jax.device_get(params),
        "batch_stats": jax.device_get(batch_stats),
    }
    return PretrainResult(
        variables=final,
        history=history,
        final_accuracy=history[-1]["acc"] if history else 0.0,
    )
