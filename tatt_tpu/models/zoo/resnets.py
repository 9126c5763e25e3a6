"""SRResNet, EDSR, LapSRN, RDN and their _TL variants.

Rebuilds ``model/srresnet.py``, ``model/edsr.py``, ``model/lapsrn.py``,
``model/rdn.py``.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tatt_tpu.kernels.resize import resize_bilinear
from tatt_tpu.models.common import (
    BatchNorm2d,
    Conv2d,
    ConvTranspose2d,
    PReLU,
    pixel_shuffle,
)
from tatt_tpu.models.tp_interpreter import TPInterpreter
from tatt_tpu.models.tsrn import InfoGen


def leaky_relu(x, slope=0.2):
    return jnp.where(x >= 0, x, slope * x)


# ---------------------------------------------------------------- SRResNet
class SRResidualBlock(nn.Module):
    """conv-BN-PReLU-conv-BN + skip (``srresnet.py:72-88``)."""

    channels: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        r = Conv2d(self.channels, name="conv1")(x)
        r = BatchNorm2d(name="bn1")(r, train)
        r = PReLU(name="prelu")(r)
        r = Conv2d(self.channels, name="conv2")(r)
        r = BatchNorm2d(name="bn2")(r, train)
        return x + r


class SRResidualBlockTL(nn.Module):
    """``srresnet.py:282-304``: prior concatenated before conv2."""

    channels: int = 64
    out_text_channels: int = 64

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, text_emb: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        r = Conv2d(self.channels, name="conv1")(x)
        r = BatchNorm2d(name="bn1")(r, train)
        r = PReLU(name="prelu")(r)
        r = jnp.concatenate([r, text_emb.astype(r.dtype)], axis=1)
        r = Conv2d(self.channels, name="conv2")(r)
        r = BatchNorm2d(name="bn2")(r, train)
        return x + r


class _SRUp(nn.Module):
    channels: int = 64

    @nn.compact
    def __call__(self, x):
        x = Conv2d(self.channels * 4, name="conv")(x)
        return PReLU(name="prelu")(pixel_shuffle(x, 2))


class SRResNet(nn.Module):
    """``srresnet.py:14-69``."""

    scale_factor: int = 2
    mask: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_planes = 4 if self.mask else 3
        b1 = PReLU(name="block1_act")(
            Conv2d(64, (9, 9), padding=(4, 4), name="block1_conv")(x)
        )
        h = b1
        for i in range(5):
            h = SRResidualBlock(name=f"block{i+2}")(h, train)
        h = Conv2d(64, name="block7_conv")(h)
        h = BatchNorm2d(name="block7_bn")(h, train)
        h = b1 + h
        for i in range(int(math.log2(self.scale_factor))):
            h = _SRUp(name=f"up{i}")(h)
        return jnp.tanh(Conv2d(in_planes, (9, 9), padding=(4, 4), lane_pack=4, name="final")(h))


class SRResNet_TL(nn.Module):
    """``srresnet.py:176-247``: TPInterpreter-style prior (InfoGenTrans)."""

    scale_factor: int = 2
    mask: bool = False
    height: int = 32
    width: int = 128
    text_emb: int = 37
    out_text_channels: int = 64
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        text_emb: jnp.ndarray,
        train: bool = False,
        deterministic: bool | None = None,
    ):
        if deterministic is None:
            deterministic = not train
        in_planes = 4 if self.mask else 3
        lr_h = self.height // self.scale_factor
        lr_w = self.width // self.scale_factor
        b1 = PReLU(name="block1_act")(
            Conv2d(64, (9, 9), padding=(4, 4), name="block1_conv")(x)
        )
        tp_raw, pr_weights = TPInterpreter(
            text_emb=self.text_emb,
            d_model=self.out_text_channels,
            output_size=(lr_h, lr_w),
            dropout=self.dropout,
            name="infoGen",
        )(b1, text_emb, deterministic)
        tp = resize_bilinear(tp_raw, lr_h, lr_w, align_corners=True)
        h = b1
        for i in range(5):
            h = SRResidualBlockTL(
                out_text_channels=self.out_text_channels, name=f"block{i+2}"
            )(h, tp, train)
        h = Conv2d(64, name="block7_conv")(h)
        h = BatchNorm2d(name="block7_bn")(h, train)
        h = b1 + h
        for i in range(int(math.log2(self.scale_factor))):
            h = _SRUp(name=f"up{i}")(h)
        out = jnp.tanh(Conv2d(in_planes, (9, 9), padding=(4, 4), lane_pack=4, name="final")(h))
        return out, {"pr_weights": pr_weights, "spatial_t_emb": tp_raw}


# ------------------------------------------------------------------- EDSR
class EDSR(nn.Module):
    """``edsr.py:35-87``: RGB mean shift, 32 residual blocks at 256ch with
    0.1 residual scaling, pixel-shuffle upsample."""

    scale_factor: int = 2
    num_blocks: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        rgb_mean = jnp.asarray([0.4488, 0.4371, 0.4040], x.dtype)[None, :, None, None]
        out = x[:, :3] - rgb_mean
        out = Conv2d(256, use_bias=False, name="conv_input")(out)
        residual = out
        h = out
        for i in range(self.num_blocks):
            r = jnp.maximum(
                Conv2d(256, use_bias=False, name=f"res{i}_conv1")(h), 0.0
            )
            r = Conv2d(256, use_bias=False, name=f"res{i}_conv2")(r)
            h = h + 0.1 * r
        h = Conv2d(256, use_bias=False, name="conv_mid")(h)
        h = h + residual
        for i in range(int(math.log2(self.scale_factor))):
            h = pixel_shuffle(
                Conv2d(256 * 4, use_bias=False, name=f"up{i}")(h), 2
            )
        out = Conv2d(3, use_bias=False, name="conv_output")(h)
        return out + rgb_mean


# ------------------------------------------------------------------ LapSRN
class LapSRN(nn.Module):
    """``lapsrn.py:57-123``: feature branch of 10 conv-lrelu + deconv,
    image branch deconv, summed."""

    scale_factor: int = 2
    in_planes: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x[:, : self.in_planes]
        out = leaky_relu(
            Conv2d(64, use_bias=False, name="conv_input")(x)
        )

        def conv_block(h, prefix):
            for i in range(10):
                h = leaky_relu(
                    Conv2d(64, use_bias=False, name=f"{prefix}_conv{i}")(h)
                )
            h = leaky_relu(
                ConvTranspose2d(
                    64, (4, 4), strides=(2, 2), padding=(1, 1), use_bias=False,
                    name=f"{prefix}_deconv",
                )(h)
            )
            return h

        f1 = conv_block(out, "F1")
        i1 = ConvTranspose2d(
            self.in_planes, (4, 4), strides=(2, 2), padding=(1, 1), use_bias=False,
            name="convt_I1",
        )(x)
        r1 = Conv2d(self.in_planes, use_bias=False, name="convt_R1")(f1)
        hr2x = i1 + r1
        if self.scale_factor == 2:
            return hr2x
        f2 = conv_block(f1, "F2")
        i2 = ConvTranspose2d(
            self.in_planes, (4, 4), strides=(2, 2), padding=(1, 1), use_bias=False,
            name="convt_I2",
        )(hr2x)
        r2 = Conv2d(self.in_planes, use_bias=False, name="convt_R2")(f2)
        return i2 + r2


# -------------------------------------------------------------------- RDN
class RDB(nn.Module):
    """Residual dense block (``rdn.py:35-50``)."""

    channels: int = 64
    n_dense: int = 6
    growth: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = x
        for i in range(self.n_dense):
            d = jnp.maximum(
                Conv2d(self.growth, use_bias=False, name=f"dense{i}")(h), 0.0
            )
            h = jnp.concatenate([h, d], axis=1)
        h = Conv2d(self.channels, (1, 1), padding=(0, 0), use_bias=False, name="conv_1x1")(h)
        return h + x


class RDB_TL(nn.Module):
    """``rdn.py:126-153``: prior concatenated before the 1x1 fuse."""

    channels: int = 64
    n_dense: int = 6
    growth: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, text_emb: jnp.ndarray) -> jnp.ndarray:
        h = x
        for i in range(self.n_dense):
            d = jnp.maximum(
                Conv2d(self.growth, use_bias=False, name=f"dense{i}")(h), 0.0
            )
            h = jnp.concatenate([h, d], axis=1)
        h = jnp.concatenate([h, text_emb.astype(h.dtype)], axis=1)
        h = Conv2d(self.channels, (1, 1), padding=(0, 0), use_bias=False, name="conv_1x1")(h)
        return h + x


class RDN(nn.Module):
    """``rdn.py:54-90``."""

    scale_factor: int = 2
    in_planes: int = 3
    n_feat: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x[:, : self.in_planes]
        f_m1 = Conv2d(self.n_feat, name="conv1")(x)
        f0 = Conv2d(self.n_feat, name="conv2")(f_m1)
        f1 = RDB(self.n_feat, name="RDB1")(f0)
        f2 = RDB(self.n_feat, name="RDB2")(f1)
        f3 = RDB(self.n_feat, name="RDB3")(f2)
        ff = jnp.concatenate([f1, f2, f3], axis=1)
        h = Conv2d(self.n_feat, (1, 1), padding=(0, 0), name="GFF_1x1")(ff)
        h = Conv2d(self.n_feat, name="GFF_3x3")(h)
        h = h + f_m1
        h = Conv2d(self.n_feat * self.scale_factor**2, name="conv_up")(h)
        h = pixel_shuffle(h, self.scale_factor)
        return Conv2d(self.in_planes, name="conv3")(h)


class RDN_TL(nn.Module):
    """``rdn.py:158-212``.  NOTE: the reference resizes the prior to a
    hard-coded (8, 32) (``rdn.py:188,196``) which cannot concat with the
    16x64 features — we resize to the feature size (the evident intent)."""

    scale_factor: int = 2
    in_planes: int = 4
    n_feat: int = 64
    text_emb: int = 37
    out_text_channels: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, text_emb: jnp.ndarray, train: bool = False):
        tp_raw = InfoGen(self.out_text_channels, name="infoGen")(text_emb, train)
        tp = resize_bilinear(tp_raw, x.shape[2], x.shape[3], align_corners=True)
        f_m1 = Conv2d(self.n_feat, name="conv1")(x)
        f0 = Conv2d(self.n_feat, name="conv2")(f_m1)
        f1 = RDB_TL(self.n_feat, name="RDB1")(f0, tp)
        f2 = RDB_TL(self.n_feat, name="RDB2")(f1, tp)
        f3 = RDB_TL(self.n_feat, name="RDB3")(f2, tp)
        ff = jnp.concatenate([f1, f2, f3], axis=1)
        h = Conv2d(self.n_feat, (1, 1), padding=(0, 0), name="GFF_1x1")(ff)
        h = Conv2d(self.n_feat, name="GFF_3x3")(h)
        h = h + f_m1
        h = Conv2d(self.n_feat * self.scale_factor**2, name="conv_up")(h)
        h = pixel_shuffle(h, self.scale_factor)
        return Conv2d(self.in_planes, name="conv3")(h), {"spatial_t_emb": tp_raw}
