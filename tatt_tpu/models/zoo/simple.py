"""Small baseline SR models: SRCNN, VDSR, SCGAN, BICUBIC (+ _TL variants).

Rebuilds ``model/srcnn.py``, ``model/vdsr.py``, ``model/scgan.py``,
``model/bicubic.py``.  All operate in HR space after a nearest upsample
(torch ``F.interpolate(scale_factor=2)`` default), with the InfoGen prior
resized bilinearly (align_corners=True) for the _TL variants.
"""

from __future__ import annotations

import math
import jax.numpy as jnp
from flax import linen as nn

from tatt_tpu.kernels.resize import resize_bicubic, resize_bilinear, upsample_nearest
from tatt_tpu.models.common import Conv2d
from tatt_tpu.models.tsrn import InfoGen


def _kaiming_conv(features, kernel, padding, name, use_bias=True):
    """Conv with the sqrt(2/n_out) normal init several zoo models use
    (``vdsr.py:48-51``, ``edsr.py:61-66``)."""
    fan_out = features * kernel[0] * kernel[1]
    std = math.sqrt(2.0 / fan_out)
    return Conv2d(
        features,
        kernel,
        padding=padding,
        use_bias=use_bias,
        name=name,
    )


class SRCNN(nn.Module):
    """``model/srcnn.py:110-146``: nearest x2 -> 9-1-5 conv stack."""

    scale_factor: int = 2
    in_planes: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = upsample_nearest(x[:, : self.in_planes], self.scale_factor)
        x = jnp.maximum(Conv2d(64, (9, 9), padding=(4, 4), name="conv1")(x), 0.0)
        x = jnp.maximum(Conv2d(32, (1, 1), padding=(0, 0), name="conv2")(x), 0.0)
        return Conv2d(self.in_planes, (5, 5), padding=(2, 2), name="conv3")(x)


class SRCNN_TL(nn.Module):
    """``model/srcnn.py:50-107``: prior concatenated before every conv."""

    scale_factor: int = 2
    in_planes: int = 4
    height: int = 32
    width: int = 128
    text_emb: int = 37
    out_text_channels: int = 32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, text_emb: jnp.ndarray, train: bool = False
    ):
        tp_raw = InfoGen(self.out_text_channels, name="infoGen")(text_emb, train)
        tp = resize_bilinear(tp_raw, self.height, self.width, align_corners=True)
        x = upsample_nearest(x, self.scale_factor)
        x = jnp.concatenate([x, tp.astype(x.dtype)], axis=1)
        out = jnp.maximum(Conv2d(64, (9, 9), padding=(4, 4), name="conv1")(x), 0.0)
        out = jnp.concatenate([out, tp.astype(x.dtype)], axis=1)
        out = jnp.maximum(Conv2d(32, (1, 1), padding=(0, 0), name="conv2")(out), 0.0)
        out = jnp.concatenate([out, tp.astype(x.dtype)], axis=1)
        out = Conv2d(self.in_planes, (5, 5), padding=(2, 2), name="conv3")(out)
        return out, {"spatial_t_emb": tp_raw}


class VDSR(nn.Module):
    """``model/vdsr.py:39-89``: nearest x2 -> 6 residual conv-relu blocks
    (the reference trims VDSR's 18 blocks to 6) -> global residual."""

    scale_factor: int = 2
    in_planes: int = 3
    num_blocks: int = 6

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = upsample_nearest(x[:, : self.in_planes], self.scale_factor)
        residual = x
        out = jnp.maximum(
            Conv2d(64, (3, 3), padding=(1, 1), use_bias=False, name="input")(x), 0.0
        )
        for i in range(self.num_blocks):
            out = (
                jnp.maximum(
                    Conv2d(
                        64, (3, 3), padding=(1, 1), use_bias=False, name=f"block{i+1}"
                    )(out),
                    0.0,
                )
                + out
            )
        out = Conv2d(
            self.in_planes, (3, 3), padding=(1, 1), use_bias=False, name="output"
        )(out)
        return out + residual


class VDSR_TL(nn.Module):
    """``model/vdsr.py:124-229``: each block conv consumes feat + prior."""

    scale_factor: int = 2
    in_planes: int = 4
    height: int = 32
    width: int = 128
    text_emb: int = 37
    out_text_channels: int = 32
    num_blocks: int = 6

    @nn.compact
    def __call__(self, x: jnp.ndarray, text_emb: jnp.ndarray, train: bool = False):
        x = upsample_nearest(x, self.scale_factor)
        tp_raw = InfoGen(self.out_text_channels, name="infoGen")(text_emb, train)
        tp = resize_bilinear(tp_raw, self.height, self.width, align_corners=True)
        residual = x
        out = jnp.maximum(
            Conv2d(64, (3, 3), padding=(1, 1), use_bias=False, name="input")(x), 0.0
        )
        for i in range(self.num_blocks):
            cat = jnp.concatenate([out, tp.astype(out.dtype)], axis=1)
            out = (
                jnp.maximum(
                    Conv2d(
                        64, (3, 3), padding=(1, 1), use_bias=False, name=f"block{i+1}"
                    )(cat),
                    0.0,
                )
                + out
            )
        out = Conv2d(
            self.in_planes, (3, 3), padding=(1, 1), use_bias=False, name="output"
        )(out)
        return out + residual, {"spatial_t_emb": tp_raw}


class SCGAN(nn.Module):
    """``model/scgan.py:131-191``."""

    scale_factor: int = 2
    in_planes: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        out = jnp.maximum(Conv2d(64, (9, 9), padding=(4, 4), name="conv1")(x), 0.0)
        out = upsample_nearest(out, self.scale_factor)
        for tag in "abcdefg":
            out = jnp.maximum(
                Conv2d(64, (5, 5), padding=(2, 2), name=f"conv{tag}")(out), 0.0
            )
        return jnp.maximum(
            Conv2d(self.in_planes, (1, 1), padding=(0, 0), name="convh")(out), 0.0
        )


class SCGAN_TL(nn.Module):
    """``model/scgan.py:50-128``."""

    scale_factor: int = 2
    in_planes: int = 4
    height: int = 32
    width: int = 128
    text_emb: int = 37
    out_text_channels: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, text_emb: jnp.ndarray, train: bool = False):
        x = upsample_nearest(x, self.scale_factor)
        tp_raw = InfoGen(self.out_text_channels, name="infoGen")(text_emb, train)
        tp = resize_bilinear(tp_raw, x.shape[2], x.shape[3], align_corners=True)
        out = jnp.maximum(Conv2d(64, (9, 9), padding=(4, 4), name="conv1")(x), 0.0)
        for tag in "ab":
            out = jnp.maximum(
                Conv2d(64, (5, 5), padding=(2, 2), name=f"conv{tag}")(out), 0.0
            )
        out = jnp.concatenate([out, tp.astype(out.dtype)], axis=1)
        for tag in "cdef":
            out = jnp.maximum(
                Conv2d(64, (5, 5), padding=(2, 2), name=f"conv{tag}")(out), 0.0
            )
        out = jnp.concatenate([out, tp.astype(out.dtype)], axis=1)
        out = jnp.maximum(Conv2d(64, (5, 5), padding=(2, 2), name="convg")(out), 0.0)
        out = jnp.maximum(
            Conv2d(self.in_planes, (1, 1), padding=(0, 0), name="convh")(out), 0.0
        )
        return out, {"spatial_t_emb": tp_raw}


class BICUBIC(nn.Module):
    """Interpolation passthrough for test-only runs (``model/bicubic.py``)."""

    scale_factor: int = 2

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return resize_bicubic(
            x, x.shape[-2] * self.scale_factor, x.shape[-1] * self.scale_factor
        )
