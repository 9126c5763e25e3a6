"""Separable cubic-convolution resize as MXU matmuls.

The reference leans on ``F.interpolate(mode='bicubic')`` for recognizer
input adapters (``interfaces/base.py:799-807,697-699,827``).  Torch's
bicubic uses the Keys kernel with a = -0.75 and edge clamping; PIL's
BICUBIC (used host-side in the collate, ``dataset/dataset.py:1292``) uses
a = -0.5.  On TPU the natural formulation is two dense matmuls with
precomputed [out, in] weight matrices — static shapes, runs on the MXU,
fuses with surrounding ops — rather than a gather.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def _cubic_kernel(x: np.ndarray, a: float) -> np.ndarray:
    ax = np.abs(x)
    ax2, ax3 = ax * ax, ax * ax * ax
    w = np.where(
        ax <= 1,
        (a + 2) * ax3 - (a + 3) * ax2 + 1,
        np.where(ax < 2, a * ax3 - 5 * a * ax2 + 8 * a * ax - 4 * a, 0.0),
    )
    return w


@lru_cache(maxsize=None)
def _resize_matrix(in_size: int, out_size: int, a: float) -> np.ndarray:
    """[out_size, in_size] cubic interpolation weights, edge-clamped,
    matching torch's upsample_bicubic2d (align_corners=False)."""
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    base = np.floor(src).astype(np.int64)
    frac = src - base
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for tap in range(-1, 3):
        idx = np.clip(base + tap, 0, in_size - 1)
        w = _cubic_kernel(frac - tap, a)
        np.add.at(mat, (dst.astype(np.int64), idx), w)
    return mat.astype(np.float32)


def resize_bicubic(
    x: jnp.ndarray, out_h: int, out_w: int, a: float = -0.75
) -> jnp.ndarray:
    """Bicubic resize of NCHW (or ...HW) images via two matmuls.

    ``a=-0.75`` matches torch ``F.interpolate(mode='bicubic',
    align_corners=False)``; pass ``a=-0.5`` for PIL-style resampling.
    """
    h, w = x.shape[-2], x.shape[-1]
    dt = x.dtype
    wh = jnp.asarray(_resize_matrix(h, out_h, a), dtype=jnp.float32)
    ww = jnp.asarray(_resize_matrix(w, out_w, a), dtype=jnp.float32)
    y = jnp.einsum(
        "oh,...hw,pw->...op",
        wh,
        x.astype(jnp.float32),
        ww,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return y.astype(dt)


@lru_cache(maxsize=None)
def _linear_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """[out_size, in_size] bilinear weights matching torch's
    ``F.interpolate(mode='bilinear')``."""
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    dst = np.arange(out_size, dtype=np.float64)
    if align_corners:
        src = dst * (in_size - 1) / max(out_size - 1, 1)
    else:
        src = np.maximum((dst + 0.5) * in_size / out_size - 0.5, 0.0)
    base = np.floor(src).astype(np.int64)
    frac = src - base
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    rows = dst.astype(np.int64)
    np.add.at(mat, (rows, np.clip(base, 0, in_size - 1)), 1.0 - frac)
    np.add.at(mat, (rows, np.clip(base + 1, 0, in_size - 1)), frac)
    return mat.astype(np.float32)


def resize_bilinear(
    x: jnp.ndarray, out_h: int, out_w: int, align_corners: bool = False
) -> jnp.ndarray:
    """Bilinear resize of ...HW images via two matmuls (used for the
    InfoGen prior-map upsample, reference ``model/tsrn.py:404``)."""
    h, w = x.shape[-2], x.shape[-1]
    dt = x.dtype
    wh = jnp.asarray(_linear_matrix(h, out_h, align_corners), jnp.float32)
    ww = jnp.asarray(_linear_matrix(w, out_w, align_corners), jnp.float32)
    y = jnp.einsum(
        "oh,...hw,pw->...op",
        wh,
        x.astype(jnp.float32),
        ww,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return y.astype(dt)


def upsample_nearest(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Torch ``F.interpolate(scale_factor=s)`` default (nearest) for NCHW."""
    return x.repeat(scale, axis=-2).repeat(scale, axis=-1)


def rgb_to_luma(x: jnp.ndarray) -> jnp.ndarray:
    """BT.601 luma used by every recognizer adapter
    (``interfaces/base.py:811-814``): 0.299 R + 0.587 G + 0.114 B.
    NCHW in, [N,1,H,W] out."""
    r, g, b = x[:, 0:1], x[:, 1:2], x[:, 2:3]
    return 0.299 * r + 0.587 * g + 0.114 * b
