"""Collate: PIL samples -> batched numpy tensors (pure host function).

Mirrors ``alignCollate_realWTLAMask`` (train, 9-tuple semantics,
``dataset/dataset.py:1966-2076``) and ``alignCollate_realWTL`` (eval,
``:1901-1963``):

  - HR resized to (width, height), LR to (width/scale, height/scale) with
    PIL BICUBIC (``resizeNormalize``, ``dataset.py:1266-1319``)
  - optional 4th mask channel: grayscale mean-threshold binarization
  - label one-hots "spread" over 26 slots with '-' interleaving, flat CTC
    ids, and per-sample tics

Deviations (documented):
  - the reference reads its collate alphabet from ``al_chinese.txt`` even
    for English runs (``dataset.py:1660``); we default to the CRNN alphabet
    and accept any alphabet for the Chinese path.
  - the eval collate's ``word[2]='e'`` label perturbation
    (``dataset.py:1928-1931``) is off by default behind ``eval_perturb``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np
from PIL import Image

from tatt_tpu.core.charset import CRNN_ALPHABET, encode_label_vecs


def to_tensor(img: Image.Image) -> np.ndarray:
    """PIL -> [C, H, W] float32 in [0, 1] (torchvision ToTensor)."""
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[None]
    else:
        arr = arr.transpose(2, 0, 1)
    return arr


def _pil_luma_u8(rgb_u8: np.ndarray) -> np.ndarray:
    """PIL ``convert('L')`` fixed-point luma, batched:
    (R*19595 + G*38470 + B*7471 + 0x8000) >> 16."""
    r = rgb_u8[..., 0].astype(np.uint32)
    g = rgb_u8[..., 1].astype(np.uint32)
    b = rgb_u8[..., 2].astype(np.uint32)
    return ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(np.uint8)


def batch_normalize(
    imgs: list[Image.Image], size: tuple[int, int], mask: bool
) -> np.ndarray:
    """Vectorized ``resizeNormalize`` over a batch: one stacked uint8
    array, one float conversion, batched mask binarization.  TextZoom
    crops are stored at target size, so the resize is usually identity —
    this keeps the single-thread host pipeline off the critical path."""
    arrs = np.stack(
        [
            np.asarray(
                im if im.size == size else im.resize(size, Image.BICUBIC)
            )
            for im in imgs
        ]
    )  # [B, H, W, 3] uint8
    scaled = arrs.astype(np.float32)
    scaled /= 255.0  # in-place: same f32 bits as the former `astype / 255.0`
    b, h, w, _ = arrs.shape
    out = np.empty((b, 4 if mask else 3, h, w), np.float32)
    out[:, :3] = scaled.transpose(0, 3, 1, 2)
    if mask:
        gray = _pil_luma_u8(arrs).astype(np.float32)  # [B, H, W]
        thres = gray.mean(axis=(1, 2), keepdims=True)
        np.less_equal(gray, thres, out=out[:, 3])
    return out


def resize_normalize(
    img: Image.Image, size: tuple[int, int], mask: bool
) -> np.ndarray:
    """``resizeNormalize`` (``dataset.py:1266-1319``) for one image."""
    return batch_normalize([img], size, mask)[0]


def batch_u8(imgs: list[Image.Image], size: tuple[int, int]) -> np.ndarray:
    """Stack to [B, H, W, 3] uint8 (resizing on host only when the source
    size differs from target — TextZoom crops are stored at target size).
    The float conversion, layout, and mask channel then happen on device
    (``data/device_pipeline.device_normalize``)."""
    return np.stack(
        [
            np.asarray(im if im.size == size else im.resize(size, Image.BICUBIC))
            for im in imgs
        ]
    )


@dataclass
class Batch:
    """The train-collate 9-tuple, as named fields (None where unused)."""

    images_hr: np.ndarray  # [B, C, H, W]
    images_lr: np.ndarray  # [B, C, H/s, W/s]
    images_pseudo_lr: Optional[np.ndarray]  # blur-ensemble LR (syn path)
    images_hr_y: Optional[np.ndarray]
    images_lr_y: Optional[np.ndarray]
    label_strs: list[str]
    label_vecs: np.ndarray  # [B, A, 1, 26] spread one-hots
    ctc_ids: np.ndarray  # flat CTC target ids (reference's weighted_mask)
    ctc_targets: np.ndarray  # [B, max_len] dense padded CTC targets
    ctc_lengths: np.ndarray  # [B] per-sample target lengths
    weighted_tics: np.ndarray  # [B]

    def device_arrays(self) -> dict[str, np.ndarray]:
        out = {
            "images_hr": self.images_hr,
            "images_lr": self.images_lr,
            "label_vecs": self.label_vecs,
            "ctc_targets": self.ctc_targets,
            "ctc_lengths": self.ctc_lengths,
            "weighted_tics": self.weighted_tics.astype(np.float32),
        }
        if self.images_hr_y is not None:
            out["images_hr_y"] = self.images_hr_y
            out["images_lr_y"] = self.images_lr_y
        if self.images_pseudo_lr is not None:
            out["images_pseudo_lr"] = self.images_pseudo_lr
        return out


def collate(
    samples: Sequence[tuple[Image.Image, Image.Image, str]],
    width: int = 128,
    height: int = 32,
    down_sample_scale: int = 2,
    mask: bool = True,
    alphabet: str = CRNN_ALPHABET,
    max_len: int = 26,
    eval_perturb: bool = False,
    y_domain: bool = False,
    syn: bool = False,
    srmd: bool = False,
    seed: Optional[int] = None,
    raw: bool = False,
) -> Batch:
    """``samples``: iterable of (img_HR, img_lr, label).

    ``syn=True`` reproduces ``alignCollate_syn.__call__``
    (``dataset.py:1696-1817``): the LR crop is halved again before the
    resize, labels are NOT '-'-spread, the ``word[2]='e'`` perturbation is
    active, and a pseudo-LR batch is produced by the imgaug-style blur
    ensemble (``transform_pseudoLR``, ``dataset.py:1636-1674``; the
    reference constructs it but ships ``images_pseudoLR = None`` at
    ``:1989`` — here the slot is real).  ``srmd=True`` additionally routes
    the LR through SRMD kernel-blur degradation (``degradation``,
    ``dataset.py:1678-1694``, latent in the reference).

    ``raw=True`` (device-collate fast path, no reference counterpart):
    images ship as stacked [B, H, W, 3] uint8 and the float conversion /
    mask channel move inside the jitted step (``data/device_pipeline``) —
    4x less H2D traffic and near-zero host arithmetic.  Incompatible with
    ``y_domain``/``syn`` (those stay on the host path)."""
    import random as _random

    from tatt_tpu.data.degradation import blur_ensemble, srmd_degradation

    hrs, lrs, labels = [], [], []
    hrs_y, lrs_y, pseudo = [], [], []
    if syn:
        eval_perturb = True
    lr_size = (width // down_sample_scale, height // down_sample_scale)
    rng = _random.Random(seed) if seed is not None else _random.Random()
    for hr, lr, label in samples:
        hrs.append(hr)
        if syn:
            lr = lr.resize((lr.width // 2, lr.height // 2), Image.BICUBIC)
            if srmd:
                lr = srmd_degradation(lr)
            pseudo.append(
                blur_ensemble(lr.resize(lr_size, Image.BICUBIC), rng)
            )
        lrs.append(lr)
        if y_domain:
            hrs_y.append(hr.convert("YCbCr"))
            lrs_y.append(lr.convert("YCbCr"))
        labels.append(label)
    if raw:
        assert not y_domain and not syn, (
            "raw (device) collate supports the canonical RGB path; "
            "y_domain/syn stay on the host collate"
        )
        hrs = batch_u8(hrs, (width, height))
        lrs = batch_u8(lrs, lr_size)
    else:
        hrs = batch_normalize(hrs, (width, height), mask)
        lrs = batch_normalize(lrs, lr_size, mask)
        if pseudo:
            pseudo = batch_normalize(pseudo, lr_size, mask)
        if y_domain:
            hrs_y = batch_normalize(hrs_y, (width, height), mask)
            lrs_y = batch_normalize(lrs_y, lr_size, mask)

    label_vecs, ctc_ids, tics = encode_label_vecs(
        labels, alphabet, max_len, eval_perturb, spread=not syn
    )
    # per-sample CTC lengths from label_vecs occupancy (train loop derives
    # text_len the same way, super_resolution.py:829-832)
    lengths = (label_vecs.sum(axis=1)[:, 0, :] > 0).sum(axis=1).astype(np.int32)
    # dense padded targets (spread ids incl '-'->0, as the reference's
    # flat weighted_mask encodes them)
    ctc_targets = np.zeros((len(labels), max_len), dtype=np.int32)
    pos = 0
    for i, n in enumerate(lengths):
        ctc_targets[i, :n] = ctc_ids[pos : pos + n]
        pos += n

    return Batch(
        images_hr=hrs,
        images_lr=lrs,
        images_pseudo_lr=pseudo if syn else None,
        images_hr_y=hrs_y if y_domain else None,
        images_lr_y=lrs_y if y_domain else None,
        label_strs=list(labels),
        label_vecs=label_vecs,
        ctc_ids=ctc_ids,
        ctc_targets=ctc_targets,
        ctc_lengths=lengths,
        weighted_tics=tics,
    )
