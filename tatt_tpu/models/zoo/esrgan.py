"""ESRGAN RRDBNet (+ _TL) — rebuilds ``model/esrgan.py``."""

from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn

from tatt_tpu.kernels.resize import resize_bilinear, upsample_nearest
from tatt_tpu.models.common import BatchNorm2d, Conv2d
from tatt_tpu.models.tsrn import InfoGen


def lrelu(x, slope=0.2):
    return jnp.where(x >= 0, x, slope * x)


class ResidualDenseBlock5C(nn.Module):
    """``esrgan.py:16-36``."""

    nf: int = 64
    gc: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x1 = lrelu(Conv2d(self.gc, name="conv1")(x))
        x2 = lrelu(Conv2d(self.gc, name="conv2")(jnp.concatenate([x, x1], 1)))
        x3 = lrelu(Conv2d(self.gc, name="conv3")(jnp.concatenate([x, x1, x2], 1)))
        x4 = lrelu(
            Conv2d(self.gc, name="conv4")(jnp.concatenate([x, x1, x2, x3], 1))
        )
        x5 = Conv2d(self.nf, name="conv5")(jnp.concatenate([x, x1, x2, x3, x4], 1))
        return x5 * 0.2 + x


class RRDB(nn.Module):
    nf: int = 64
    gc: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = ResidualDenseBlock5C(self.nf, self.gc, name="RDB1")(x)
        out = ResidualDenseBlock5C(self.nf, self.gc, name="RDB2")(out)
        out = ResidualDenseBlock5C(self.nf, self.gc, name="RDB3")(out)
        return out * 0.2 + x


class RRDB_TL(nn.Module):
    """``esrgan.py:55-78``: prior fused after the RRDB via 1x1 + BN."""

    nf: int = 64
    gc: int = 32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, text_emb: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        out = ResidualDenseBlock5C(self.nf, self.gc, name="RDB1")(x)
        out = ResidualDenseBlock5C(self.nf, self.gc, name="RDB2")(out)
        out = ResidualDenseBlock5C(self.nf, self.gc, name="RDB3")(out)
        im_feat = out * 0.2 + x
        cat = jnp.concatenate([im_feat, text_emb.astype(im_feat.dtype)], axis=1)
        fused = Conv2d(self.nf, (1, 1), padding=(0, 0), name="proj")(cat)
        fused = BatchNorm2d(name="bn2")(fused, train)
        return fused + im_feat


class RRDBNet(nn.Module):
    """``esrgan.py:81-112``."""

    scale_factor: int = 2
    in_nc: int = 4
    out_nc: int = 4
    nf: int = 64
    nb: int = 23
    gc: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        fea = Conv2d(self.nf, name="conv_first")(x)
        trunk = fea
        for i in range(self.nb):
            trunk = RRDB(self.nf, self.gc, name=f"RRDB{i}")(trunk)
        trunk = Conv2d(self.nf, name="trunk_conv")(trunk)
        fea = fea + trunk
        for i in range(int(math.log2(self.scale_factor))):
            fea = lrelu(
                Conv2d(self.nf, name=f"upconv{i+1}")(upsample_nearest(fea, 2))
            )
        return Conv2d(self.out_nc, name="conv_last")(
            lrelu(Conv2d(self.nf, name="HRconv")(fea))
        )


class RRDBNet_TL(nn.Module):
    """``esrgan.py:150-191``."""

    scale_factor: int = 2
    in_nc: int = 4
    out_nc: int = 4
    nf: int = 64
    nb: int = 23
    gc: int = 32
    text_emb: int = 37
    out_text_channels: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, text_emb: jnp.ndarray, train: bool = False):
        fea = Conv2d(self.nf, name="conv_first")(x)
        tp_raw = InfoGen(self.out_text_channels, name="infoGen")(text_emb, train)
        tp = resize_bilinear(tp_raw, x.shape[2], x.shape[3], align_corners=True)
        trunk = fea
        for i in range(self.nb):
            trunk = RRDB_TL(self.nf, self.gc, name=f"RRDB{i}")(trunk, tp, train)
        trunk = Conv2d(self.nf, name="trunk_conv")(trunk)
        fea = fea + trunk
        for i in range(int(math.log2(self.scale_factor))):
            fea = lrelu(
                Conv2d(self.nf, name=f"upconv{i+1}")(upsample_nearest(fea, 2))
            )
        out = Conv2d(self.out_nc, name="conv_last")(
            lrelu(Conv2d(self.nf, name="HRconv")(fea))
        )
        return out, {"spatial_t_emb": tp_raw}
