"""HAN — Holistic Attention Network (rebuilds ``model/han.py``).

10 residual groups x 20 RCABs at 128 feats; layer attention (LAM) over the
stacked group outputs and channel-spatial attention (CSAM, a 3-D conv)
fused before the tail.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from tatt_tpu.models.common import Conv2d, pixel_shuffle


class CALayer(nn.Module):
    channel: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = x.mean(axis=(2, 3), keepdims=True)
        y = jnp.maximum(
            Conv2d(self.channel // self.reduction, (1, 1), padding=(0, 0), name="down")(y),
            0.0,
        )
        y = jax.nn.sigmoid(
            Conv2d(self.channel, (1, 1), padding=(0, 0), name="up")(y)
        )
        return x * y


class RCAB(nn.Module):
    n_feat: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        r = jnp.maximum(Conv2d(self.n_feat, name="conv1")(x), 0.0)
        r = Conv2d(self.n_feat, name="conv2")(r)
        r = CALayer(self.n_feat, name="ca")(r)
        return x + r


class ResidualGroup(nn.Module):
    n_feat: int
    n_resblocks: int = 20

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        r = x
        for i in range(self.n_resblocks):
            r = RCAB(self.n_feat, name=f"rcab{i}")(r)
        r = Conv2d(self.n_feat, name="conv_tail")(r)
        return x + r


class LAM(nn.Module):
    """Layer attention over N stacked group outputs (``han.py:42-73``)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, n, c, h, w = x.shape
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        q = x.reshape(b, n, -1)
        energy = jnp.einsum("bnd,bmd->bnm", q, q)
        energy_new = energy.max(-1, keepdims=True) - energy
        attn = jax.nn.softmax(energy_new, axis=-1)
        out = jnp.einsum("bnm,bmd->bnd", attn, q).reshape(b, n, c, h, w)
        out = gamma.astype(x.dtype) * out + x
        return out.reshape(b, n * c, h, w)


class CSAM(nn.Module):
    """Channel-spatial attention via a 3-D conv (``han.py:76-113``)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, c, h, w = x.shape
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        kernel = self.param(
            "conv3d_kernel",
            nn.initializers.uniform(scale=2.0 / math.sqrt(27)),
            (1, 1, 3, 3, 3),
        )
        bias = self.param("conv3d_bias", nn.initializers.zeros, (1,))
        z = x[:, None]  # [B, 1, C, H, W] as NCDHW
        z = jax.lax.conv_general_dilated(
            z,
            kernel.astype(x.dtype),
            window_strides=(1, 1, 1),
            padding=[(1, 1)] * 3,
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        ) + bias.astype(x.dtype)
        out = jax.nn.sigmoid(z) * gamma.astype(x.dtype)
        return x * out[:, 0] + x


class HAN(nn.Module):
    """``han.py:193-265``; fixed scale 2 like the reference ctor."""

    n_resgroups: int = 10
    n_resblocks: int = 20
    n_feats: int = 128
    scale: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        rgb_mean = jnp.asarray([0.4488, 0.4371, 0.4040], x.dtype)[None, :, None, None]
        x = x[:, :3] - rgb_mean
        x = Conv2d(self.n_feats, name="head")(x)
        res = x
        stack = []
        for i in range(self.n_resgroups):
            res = ResidualGroup(self.n_feats, self.n_resblocks, name=f"group{i}")(res)
            stack.insert(0, res)  # reference prepends (han.py:244-247)
        res = Conv2d(self.n_feats, name="body_tail")(res)
        stack.insert(0, res)
        out1 = res
        la = LAM(name="la")(jnp.stack(stack, axis=1))
        out2 = Conv2d(self.n_feats, name="last_conv")(la)
        out1 = CSAM(name="csa")(out1)
        out = Conv2d(self.n_feats, name="last")(jnp.concatenate([out1, out2], axis=1))
        out = out + x
        for i in range(int(math.log2(self.scale))):
            out = pixel_shuffle(Conv2d(self.n_feats * 4, name=f"up{i}")(out), 2)
        out = Conv2d(3, name="tail")(out)
        return out + rgb_mean
