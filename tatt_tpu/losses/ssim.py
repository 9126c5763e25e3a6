"""SSIM family (standard, tri-image rotation-consistency, distorted-rect).

Rebuilds ``utils/ssim_psnr.py``: Gaussian-window SSIM (sigma 1.5, 11x11),
the three-way TRI_SSIM used by ``--tssim_loss``
(``utils/ssim_psnr.py:99-129``) and the rectangular-window Distorted_SSIM
(``:131-197``).  Windows are depthwise convs — XLA fuses the whole loss.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

C1 = 0.01**2
C2 = 0.03**2


@lru_cache(maxsize=None)
def _gaussian_window(window_h: int, window_w: int, sigma: float = 1.5) -> np.ndarray:
    def g(n):
        x = np.arange(n, dtype=np.float64) - n // 2
        w = np.exp(-(x**2) / (2 * sigma**2))
        return w / w.sum()

    return np.outer(g(window_h), g(window_w)).astype(np.float32)


def _depthwise_filter(img: jnp.ndarray, window: np.ndarray) -> jnp.ndarray:
    """Depthwise 'same' conv of NCHW with a single 2-D window.

    The reference's window (``utils/ssim_psnr.py:33-39``) is the outer
    product of two 1-D Gaussians, so the conv is SEPARABLE: two 1-D
    passes (kh + kw taps) replace the kh*kw-tap 2-D conv — 5.5x less VPU
    work for the 11x11 window.  Zero 'same' padding commutes with the
    separable factorization, so this is the same linear map as the 2-D
    conv up to f32 rounding.

    ``Precision.HIGHEST`` is load-bearing: on TPU, f32 convs default to
    bf16 MXU passes, and the SSIM variances ``E[x^2] - E[x]^2`` then
    catastrophically cancel for near-saturated images (|x| ~ 1, true
    variance ~1e-3 << bf16 eps at 1.0).  Locally-negative variance
    estimates drive the (s1+s2+C2) denominators toward/below zero and the
    loss *gradients* explode by 4-6 orders of magnitude — found as the
    root cause of the round-1 rotate+tssim training stall (the forward
    loss value looks sane; only the backward blows up)."""
    c = img.shape[1]
    kh, kw = window.shape
    img = img.astype(jnp.float32)
    # factor the rank-1 window back into its 1-D components
    win = np.asarray(window, np.float64)
    u, s, vt = np.linalg.svd(win)
    col = (u[:, 0] * np.sqrt(s[0])).astype(np.float32)  # [kh]
    row = (vt[0] * np.sqrt(s[0])).astype(np.float32)  # [kw]
    if col.sum() < 0:  # svd sign ambiguity; gaussians are positive
        col, row = -col, -row

    def dw(x, k, kh_, kw_):
        kernel = jnp.asarray(k, jnp.float32).reshape(1, 1, kh_, kw_)
        return jax.lax.conv_general_dilated(
            x,
            jnp.repeat(kernel, c, axis=0),
            window_strides=(1, 1),
            padding=[(kh_ // 2,) * 2, (kw_ // 2,) * 2],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST,
        )

    return dw(dw(img, row, 1, kw), col, kh, 1)


def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    size_average: bool = True,
    rgb_only: bool = True,
) -> jnp.ndarray:
    """SSIM matching ``utils/ssim_psnr.py:76-96,202-227`` (first 3 channels)."""
    # Upcast BEFORE forming products: a bf16 caller would square in bf16 and
    # lose the low bits ahead of the f32 window conv — the same E[x^2]-E[x]^2
    # cancellation the Precision.HIGHEST fix in _depthwise_filter targets.
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    if rgb_only:
        img1, img2 = img1[:, :3], img2[:, :3]
    win = _gaussian_window(window_size, window_size)
    mu1 = _depthwise_filter(img1, win)
    mu2 = _depthwise_filter(img2, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_filter(img1 * img1, win) - mu1_sq
    sigma2_sq = _depthwise_filter(img2 * img2, win) - mu2_sq
    sigma12 = _depthwise_filter(img1 * img2, win) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return ssim_map.mean() if size_average else ssim_map.mean(axis=(1, 2, 3))


def tri_ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    img3: jnp.ndarray,
    window_size: int = 11,
    size_average: bool = True,
) -> jnp.ndarray:
    """Three-way SSIM for rotation consistency (``utils/ssim_psnr.py:99-129``).
    NOTE: operates on ALL channels (the reference's TRI_SSIM does not slice
    to RGB — the commented lines at ``:240-241``)."""
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    img3 = img3.astype(jnp.float32)
    win = _gaussian_window(window_size, window_size)
    mu1, mu2, mu3 = (
        _depthwise_filter(img1, win),
        _depthwise_filter(img2, win),
        _depthwise_filter(img3, win),
    )
    mu1_sq, mu2_sq, mu3_sq = mu1 * mu1, mu2 * mu2, mu3 * mu3
    mu12, mu23, mu31 = mu1 * mu2, mu2 * mu3, mu3 * mu1
    s1 = _depthwise_filter(img1 * img1, win) - mu1_sq
    s2 = _depthwise_filter(img2 * img2, win) - mu2_sq
    s3 = _depthwise_filter(img3 * img3, win) - mu3_sq
    s12 = _depthwise_filter(img1 * img2, win) - mu12
    s23 = _depthwise_filter(img2 * img3, win) - mu23
    s31 = _depthwise_filter(img3 * img1, win) - mu31
    ssim_map = ((mu12 + mu23 + mu31 + C1) * (s12 + s23 + s31 + C2)) / (
        (mu1_sq + mu2_sq + mu3_sq + C1) * (s1 + s2 + s3 + C2)
    )
    return ssim_map.mean() if size_average else ssim_map.mean(axis=(1, 2, 3))


def distorted_ssim(
    img1: jnp.ndarray, img2: jnp.ndarray, size_average: bool = True
) -> jnp.ndarray:
    """Mean of SSIMs with rect windows (5,11), (11,5), (11,11)
    (``utils/ssim_psnr.py:158-197``)."""
    img1 = img1[:, :3].astype(jnp.float32)
    img2 = img2[:, :3].astype(jnp.float32)
    total = 0.0
    for wh, ww in [(5, 11), (11, 5), (11, 11)]:
        win = _gaussian_window(wh, ww)
        mu1 = _depthwise_filter(img1, win)
        mu2 = _depthwise_filter(img2, win)
        mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
        s1 = _depthwise_filter(img1 * img1, win) - mu1_sq
        s2 = _depthwise_filter(img2 * img2, win) - mu2_sq
        s12 = _depthwise_filter(img1 * img2, win) - mu1_mu2
        ssim_map = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / (
            (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2)
        )
        total = total + (
            ssim_map.mean() if size_average else ssim_map.mean(axis=(1, 2, 3))
        )
    return total / 3.0


def ssim_weighted(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    weighted_mask: jnp.ndarray,
    window_size: int = 11,
    size_average: bool = True,
) -> jnp.ndarray:
    """SSIM on mask-weighted images (``utils/ssim_psnr.py:49-73,259-284``)."""
    return ssim(
        img1[:, :3] * weighted_mask,
        img2[:, :3] * weighted_mask,
        window_size,
        size_average,
        rgb_only=False,
    )


def weighted_psnr(
    img1: jnp.ndarray, img2: jnp.ndarray, weighted_mask: jnp.ndarray
) -> jnp.ndarray:
    """``weighted_calculate_psnr`` (``utils/ssim_psnr.py:18-25``)."""
    mse = (
        (img1[:, :3] * weighted_mask * 255.0 - img2[:, :3] * weighted_mask * 255.0)
        ** 2
    ).mean()
    return 20.0 * jnp.log10(255.0 / jnp.sqrt(mse))


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """PSNR on RGB in [0,1] scaled x255 (``utils/ssim_psnr.py:9-15``)."""
    mse = ((img1[:, :3] * 255.0 - img2[:, :3] * 255.0) ** 2).mean()
    return 20.0 * jnp.log10(255.0 / jnp.sqrt(mse))
