"""Eval metric aggregation — the reference's judge protocol.

Mirrors ``TextSR.eval`` (``interfaces/super_resolution.py:1203-1700``):
  - PSNR/SSIM of SR vs HR appended per batch, averaged over batches
  - recognition accuracy: judge prediction vs label after
    ``str_filt(.,'lower')`` exact match (``:1539``)
  - NED (Chinese path): editdistance / max-len
  - fps from summed SR forward time
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from tatt_tpu.core.charset import levenshtein, str_filt


def _normalize_text(text: str) -> str:
    """Lowercase alphanumerics only (``utils/metrics.py:13-17``)."""
    return "".join(ch for ch in text.lower() if ch.isalnum())


def lexicon_search(lexicon: list[str], word: str) -> str:
    """Closest lexicon entry by edit distance on normalized text
    (``utils/metrics.py:95-102``)."""
    dists = [
        levenshtein(_normalize_text(lex), _normalize_text(word))
        for lex in lexicon
    ]
    return lexicon[int(np.argmin(dists))]


def accuracy_with_lexicon(
    preds: list[str], targets: list[str], lexicons: list[list[str]]
) -> tuple[float, float]:
    """(raw accuracy, lexicon-refined accuracy) — the per-lexicon protocol
    of ``Accuracy_with_lexicon`` (``utils/metrics.py:112-149``) with the
    lexicon supplied per sample instead of dataset attributes."""
    n = max(len(preds), 1)
    raw = sum(p == t for p, t in zip(preds, targets)) / n
    refined_hits = 0
    for p, t, lex in zip(preds, targets, lexicons):
        refined = lexicon_search(lex, p) if lex else p
        refined_hits += refined == t
    return raw, refined_hits / n


@dataclass
class EvalAccumulator:
    psnr: list = field(default_factory=list)
    ssim: list = field(default_factory=list)
    batch_sizes: list = field(default_factory=list)
    psnr_lr: list = field(default_factory=list)
    ssim_lr: list = field(default_factory=list)
    lpips_sr: list = field(default_factory=list)
    lpips_lr: list = field(default_factory=list)
    n_images: int = 0
    n_correct_sr: int = 0
    n_correct_lr: int = 0
    n_correct_hr: int = 0
    ned_sr: list = field(default_factory=list)
    infer_time: float = 0.0

    def add_batch(
        self,
        psnr: float,
        ssim: float,
        preds_sr: list[str],
        preds_lr: list[str],
        preds_hr: list[str],
        labels: list[str],
        filter_mode: str = "lower",
        psnr_lr: float | None = None,
        ssim_lr: float | None = None,
        lpips_sr: float | None = None,
        lpips_lr: float | None = None,
        n_real: int | None = None,
    ) -> None:
        self.psnr.append(float(psnr))
        self.ssim.append(float(ssim))
        self.batch_sizes.append(
            int(n_real) if n_real is not None else len(labels)
        )
        if psnr_lr is not None:
            self.psnr_lr.append(float(psnr_lr))
        if ssim_lr is not None:
            self.ssim_lr.append(float(ssim_lr))
        if lpips_sr is not None:
            self.lpips_sr.append(float(lpips_sr))
        if lpips_lr is not None:
            self.lpips_lr.append(float(lpips_lr))
        for p_sr, p_lr, p_hr, label in zip(preds_sr, preds_lr, preds_hr, labels):
            self.n_images += 1
            gt = str_filt(label, filter_mode)
            ps = str_filt(p_sr, filter_mode)
            if ps == gt:
                self.n_correct_sr += 1
            if str_filt(p_lr, filter_mode) == gt:
                self.n_correct_lr += 1
            if str_filt(p_hr, filter_mode) == gt:
                self.n_correct_hr += 1
            self.ned_sr.append(
                levenshtein(ps, gt) / float(max(len(ps), len(gt)) + 1e-10)
            )

    def summary(self) -> dict:
        n = max(self.n_images, 1)
        nb = max(len(self.psnr), 1)
        # per-batch average matches the reference's aggregation
        # (super_resolution.py:1627-1652), which weights a short tail
        # batch equally; the *_weighted variants weight by sample count
        # (identical when drop_last or equal batches).
        w = np.asarray(self.batch_sizes[: len(self.psnr)], np.float64)
        wsum = float(w.sum()) or 1.0
        out = {
            "psnr_avg": float(np.sum(self.psnr)) / nb,
            "ssim_avg": float(np.sum(self.ssim)) / nb,
            "psnr_avg_weighted": float(np.dot(self.psnr, w)) / wsum
            if len(w) == len(self.psnr)
            else float(np.sum(self.psnr)) / nb,
            "ssim_avg_weighted": float(np.dot(self.ssim, w)) / wsum
            if len(w) == len(self.ssim)
            else float(np.sum(self.ssim)) / nb,
            "accuracy": round(self.n_correct_sr / n, 4),
            "accuracy_lr": round(self.n_correct_lr / n, 4),
            "accuracy_hr": round(self.n_correct_hr / n, 4),
            "ned": float(np.mean(self.ned_sr)) if self.ned_sr else 0.0,
            "images": self.n_images,
        }
        if self.psnr_lr:
            out["psnr_avg_lr"] = float(np.sum(self.psnr_lr)) / len(self.psnr_lr)
        if self.ssim_lr:
            out["ssim_avg_lr"] = float(np.sum(self.ssim_lr)) / len(self.ssim_lr)
        if self.lpips_sr:
            out["lpips_vgg_sr"] = float(np.mean(self.lpips_sr))
        if self.lpips_lr:
            out["lpips_vgg_lr"] = float(np.mean(self.lpips_lr))
        if self.infer_time > 0:
            out["fps"] = self.n_images / self.infer_time
        return out
