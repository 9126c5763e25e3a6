"""TBSRN — position-aware transformer SR (rebuilds ``model/tbsrn.py``).

Each SRB runs a FeatureEnhancer: tokens = the H*W spatial positions with a
2-D sinusoidal PE concatenated (64 feat + 64 PE = 128), one self-attention
layer + FFN, linear back to 64 channels.

Reference quirks handled:
  - the ``tbsrn`` factory branch is unreachable in the reference
    (``interfaces/base.py:368-369``) so the file was never exercised; its
    hard-coded PE size (16, 256) (``tbsrn.py:75``) mismatches the 16x64
    feature maps — we build the PE at the actual feature size.
  - ``TBSRN_TL``'s InfoGen uses 128-wide deconvs (``tbsrn.py:238-248``).
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tatt_tpu.kernels.resize import resize_bilinear
from tatt_tpu.models.common import (
    BatchNorm2d,
    Conv2d,
    ConvTranspose2d,
    Dense,
    PReLU,
    mish,
)
from tatt_tpu.models.transformer import MultiheadAttention
from tatt_tpu.models.tsrn import UpsampleBlock


@lru_cache(maxsize=None)
def positional_encoding_2d(d_model: int, height: int, width: int) -> np.ndarray:
    """``tbsrn.py:39-61``: half the channels encode x, half y."""
    pe = np.zeros((d_model, height, width), dtype=np.float32)
    half = d_model // 2
    div = np.exp(np.arange(0.0, half, 2) * -(math.log(10000.0) / half))
    pos_w = np.arange(0.0, width)[:, None]
    pos_h = np.arange(0.0, height)[:, None]
    pe[0:half:2] = np.sin(pos_w * div).T[:, None, :].repeat(height, axis=1)
    pe[1:half:2] = np.cos(pos_w * div).T[:, None, :].repeat(height, axis=1)
    pe[half::2] = np.sin(pos_h * div).T[:, :, None].repeat(width, axis=2)
    pe[half + 1 :: 2] = np.cos(pos_h * div).T[:, :, None].repeat(width, axis=2)
    return pe


class TorchLayerNorm(nn.Module):
    """The reference's hand-rolled LayerNorm divides by std + eps
    (``tbsrn.py:23-36``), not sqrt(var + eps)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        a = self.param("a_2", nn.initializers.ones, (c,))
        b = self.param("b_2", nn.initializers.zeros, (c,))
        x32 = x.astype(jnp.float32)
        mean = x32.mean(-1, keepdims=True)
        std = jnp.sqrt(x32.var(-1, keepdims=True) * c / max(c - 1, 1))
        y = a * (x32 - mean) / (std + 1e-6) + b
        return y.astype(x.dtype)


class FeatureEnhancer(nn.Module):
    """``tbsrn.py:63-93``: self-attn over spatial tokens with 2-D PE."""

    d_feat: int = 64
    nhead: int = 4
    dropout: float = 0.1
    spatial_size: tuple[int, int] = (16, 64)

    @nn.compact
    def __call__(
        self, conv_feature: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        # conv_feature: [B, C, L] with spatial size attached by caller
        b, c, length = conv_feature.shape
        h, w = self.spatial_size
        pe = jnp.asarray(
            positional_encoding_2d(self.d_feat, h, w).reshape(self.d_feat, length),
            conv_feature.dtype,
        )
        x = jnp.concatenate(
            [conv_feature, jnp.broadcast_to(pe[None], (b, self.d_feat, length))], 1
        )
        x = x.transpose(0, 2, 1)  # [B, L, 128]
        attn, _ = MultiheadAttention(
            2 * self.d_feat, self.nhead, self.dropout, name="multihead"
        )(x, x, x, deterministic)
        x = TorchLayerNorm(name="norm1")(x + attn)
        ff = Dense(2 * self.d_feat, name="pff_w1")(x)
        ff = jnp.maximum(ff, 0.0)
        ff = Dense(2 * self.d_feat, name="pff_w2")(ff)
        x = TorchLayerNorm(name="norm3")(x + ff)
        x = Dense(self.d_feat, name="linear")(x)
        return x.transpose(0, 2, 1)


class TBSRNBlock(nn.Module):
    """``tbsrn.py:349-377`` (+ TL variant :380-416)."""

    channels: int
    text_channels: int = 0
    spatial_size: tuple[int, int] = (16, 64)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        text_emb=None,
        train: bool = False,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        r = Conv2d(self.channels, name="conv1")(x)
        r = BatchNorm2d(name="bn1")(r, train)
        r = mish(r)
        r = Conv2d(self.channels, name="conv2")(r)
        r = BatchNorm2d(name="bn2")(r, train)
        n, c, h, w = r.shape
        r = FeatureEnhancer(
            d_feat=c, spatial_size=(h, w), name="feature_enhancer"
        )(r.reshape(n, c, h * w), deterministic)
        r = r.reshape(n, c, h, w)
        if self.text_channels:
            fused = jnp.concatenate([r, text_emb.astype(r.dtype)], axis=1)
            r = mish(
                Conv2d(self.channels, (1, 1), padding=(0, 0), name="conv_proj")(fused)
            )
        return x + r


class InfoGenTBSRN(nn.Module):
    """TBSRN's InfoGen variant with 128-wide deconvs (``tbsrn.py:230-263``)."""

    out_channels: int

    @nn.compact
    def __call__(self, t: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        specs = [
            (128, (2, 2), (0, 0)),
            (128, (2, 2), (0, 0)),
            (64, (2, 2), (1, 1)),
            (self.out_channels, (2, 1), (1, 1)),
        ]
        x = t
        for i, (c, s, p) in enumerate(specs):
            x = ConvTranspose2d(
                c, (3, 3), strides=s, padding=p, use_bias=False, name=f"tconv{i+1}"
            )(x)
            x = BatchNorm2d(name=f"bn{i+1}")(x, train)
            x = jnp.maximum(x, 0.0)
        return x


class TBSRN(nn.Module):
    """``tbsrn.py:167-227``."""

    scale_factor: int = 2
    srb_nums: int = 5
    mask: bool = False
    hidden_units: int = 32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, deterministic: bool | None = None
    ) -> jnp.ndarray:
        if deterministic is None:
            deterministic = not train
        ch = 2 * self.hidden_units
        in_planes = 4 if self.mask else 3
        b1 = PReLU(name="block1_act")(
            Conv2d(ch, (9, 9), padding=(4, 4), name="block1_conv")(x)
        )
        h = b1
        for i in range(self.srb_nums):
            h = TBSRNBlock(ch, name=f"block{i+2}")(h, None, train, deterministic)
        h = Conv2d(ch, name="post_conv")(h)
        h = BatchNorm2d(name="post_bn")(h, train)
        h = b1 + h
        for i in range(int(math.log2(self.scale_factor))):
            h = UpsampleBlock(ch, 2, name=f"up{i}")(h)
        return jnp.tanh(Conv2d(in_planes, (9, 9), padding=(4, 4), lane_pack=4, name="final")(h))


class TBSRN_TL(nn.Module):
    """``tbsrn.py:266-346``."""

    scale_factor: int = 2
    srb_nums: int = 5
    mask: bool = False
    hidden_units: int = 32
    text_emb: int = 37
    out_text_channels: int = 32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        text_emb: jnp.ndarray,
        train: bool = False,
        deterministic: bool | None = None,
    ) -> tuple[jnp.ndarray, dict[str, Any]]:
        if deterministic is None:
            deterministic = not train
        ch = 2 * self.hidden_units
        in_planes = 4 if self.mask else 3
        b1 = PReLU(name="block1_act")(
            Conv2d(ch, (9, 9), padding=(4, 4), name="block1_conv")(x)
        )
        tp_raw = InfoGenTBSRN(self.out_text_channels, name="infoGen")(text_emb, train)
        tp = resize_bilinear(tp_raw, x.shape[2], x.shape[3], align_corners=True)
        h = b1
        for i in range(self.srb_nums):
            h = TBSRNBlock(
                ch, self.out_text_channels, name=f"block{i+2}"
            )(h, tp, train, deterministic)
        h = Conv2d(ch, name="post_conv")(h)
        h = BatchNorm2d(name="post_bn")(h, train)
        h = b1 + h
        for i in range(int(math.log2(self.scale_factor))):
            h = UpsampleBlock(ch, 2, name=f"up{i}")(h)
        out = jnp.tanh(Conv2d(in_planes, (9, 9), padding=(4, 4), lane_pack=4, name="final")(h))
        return out, {"spatial_t_emb": tp_raw}
