"""PCAN — parallel context attention network (rebuilds ``model/pcan.py``).

Dense PCAB blocks (dual width/height BiGRU branches + squeeze-excite
fusion), HOTA high-order spatial attention over the concatenated block
outputs, TSRN-style upsample tail.  ``PCAN_TL`` fuses the InfoGen prior
into both GRU branches.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from tatt_tpu.kernels.resize import resize_bilinear
from tatt_tpu.models.common import BatchNorm2d, Conv2d, PReLU, max_pool_nchw, mish
from tatt_tpu.models.tsrn import GruBlock, InfoGen, UpsampleBlock


class FeatureSelection(nn.Module):
    """Squeeze-excite (``pcan.py:21-37``)."""

    channel: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from tatt_tpu.models.common import Dense

        b, c, _, _ = x.shape
        y = x.mean(axis=(2, 3))
        y = jnp.maximum(Dense(self.channel // self.reduction, name="fc1")(y), 0.0)
        y = jax.nn.sigmoid(Dense(self.channel, name="fc2")(y))
        return x * y[:, :, None, None]


class HOTA(nn.Module):
    """High-order attention (``pcan.py:39-91``): multi-dilation separable
    convs -> SE -> pooled conv stack -> sigmoid mask."""

    n_feats: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        f = self.n_feats // 4
        res = x
        c1 = Conv2d(f, (1, 1), padding=(0, 0), name="conv1")(x)

        hw = self.param("horizontal_w", nn.initializers.normal(1.0), (f, f, 1, 3))
        hb = self.param("horizontal_b", nn.initializers.normal(1.0), (f,))
        vw = self.param("vertical_w", nn.initializers.normal(1.0), (f, f, 3, 1))
        vb = self.param("vertical_b", nn.initializers.normal(1.0), (f,))

        def dconv(z, w, b, pad, dil):
            y = jax.lax.conv_general_dilated(
                z,
                w.astype(z.dtype),
                window_strides=(2, 2),
                padding=pad,
                rhs_dilation=dil,
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            )
            return y + b.astype(z.dtype)[None, :, None, None]

        branches = []
        for d in (1, 2, 3):
            branches.append(dconv(c1, vw, vb, [(d, d), (0, 0)], (d, 1)))
        for d in (1, 2, 3):
            branches.append(dconv(c1, hw, hb, [(0, 0), (d, d)], (1, d)))
        fusion = jnp.concatenate(branches, axis=1)
        sel = FeatureSelection(f * 6, name="se")(fusion)
        sel = Conv2d(f, name="conv_reduce")(sel)
        v_max = max_pool_nchw(sel, (8, 8), (4, 4))
        v = jnp.maximum(Conv2d(f, name="conv_max")(v_max), 0.0)
        c3 = jnp.maximum(Conv2d(f, name="conv3")(v), 0.0)
        c3 = Conv2d(f, name="conv3_")(c3)
        c3 = resize_bilinear(c3, res.shape[2], res.shape[3], align_corners=False)
        cf = Conv2d(f, (1, 1), padding=(0, 0), name="conv_f")(c1)
        mask = jax.nn.sigmoid(Conv2d(self.n_feats, (1, 1), padding=(0, 0), name="conv4")(cf + c3))
        return res * mask


class PCAB(nn.Module):
    """``pcan.py:300-338``; with ``text_channels`` > 0 this is PCAB_TP."""

    channels: int
    no: int
    text_channels: int = 0

    @nn.compact
    def __call__(
        self,
        inputs: list[jnp.ndarray],
        tp: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        x = jnp.concatenate(inputs, axis=1)
        x = Conv2d(self.channels, (1, 1), padding=(0, 0), name="conv_reduce")(x)
        r = Conv2d(self.channels, name="conv1")(x)
        r = mish(BatchNorm2d(name="bn1")(r, train))

        rw = BatchNorm2d(name="bn2_w")(Conv2d(self.channels, name="conv2_w")(r), train)
        rh = BatchNorm2d(name="bn2_h")(Conv2d(self.channels, name="conv2_h")(r), train)

        if self.text_channels:
            # NOTE reference PCAB_TP feeds x+residual_w to BOTH branches
            # (pcan.py:376) — reproduced
            in_w = jnp.concatenate([x + rw, tp.astype(x.dtype)], axis=1)
            in_h = jnp.concatenate([x + rw, tp.astype(x.dtype)], axis=1)
        else:
            in_w = x + rw
            in_h = x + rh
        w_feat = GruBlock(self.channels, name="gru1")(in_w)
        h_feat = GruBlock(self.channels, name="gru2")(
            in_h.transpose(0, 1, 3, 2)
        ).transpose(0, 1, 3, 2)

        fusion = FeatureSelection(self.channels * 2, name="fs")(
            jnp.concatenate([h_feat, w_feat], axis=1)
        )
        out = Conv2d(self.channels, name="conv3")(fusion)
        return mish(BatchNorm2d(name="bn3")(out, train))


class PCAN(nn.Module):
    """``pcan.py:95-159``."""

    scale_factor: int = 2
    srb_nums: int = 5
    mask: bool = True
    hidden_units: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        ch = 2 * self.hidden_units
        in_planes = 4 if self.mask else 3
        b1 = PReLU(name="block1_act")(
            Conv2d(ch, (9, 9), padding=(4, 4), name="block1_conv")(x)
        )
        feats = [b1]
        for i in range(self.srb_nums):
            feats.append(PCAB(ch, i + 2, name=f"block{i+2}")(feats, None, train))
        cat = jnp.concatenate(feats[1:], axis=1)
        att = HOTA(ch * self.srb_nums, name="spatial_attention")(cat)
        h = Conv2d(ch, name="post_conv")(att)
        h = BatchNorm2d(name="post_bn")(h, train)
        h = h + b1
        for i in range(int(math.log2(self.scale_factor))):
            h = UpsampleBlock(ch, 2, name=f"up{i}")(h)
        return jnp.tanh(Conv2d(in_planes, (9, 9), padding=(4, 4), lane_pack=4, name="final")(h))


class PCAN_TL(nn.Module):
    """``pcan.py:199-297``."""

    scale_factor: int = 2
    srb_nums: int = 5
    mask: bool = True
    hidden_units: int = 32
    text_emb: int = 37
    out_text_channels: int = 32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, text_emb: jnp.ndarray, train: bool = False
    ) -> tuple[jnp.ndarray, dict[str, Any]]:
        ch = 2 * self.hidden_units
        in_planes = 4 if self.mask else 3
        b1 = PReLU(name="block1_act")(
            Conv2d(ch, (9, 9), padding=(4, 4), name="block1_conv")(x)
        )
        tp_raw = InfoGen(self.out_text_channels, name="infoGen")(text_emb, train)
        tp = resize_bilinear(tp_raw, b1.shape[2], b1.shape[3], align_corners=True)
        feats = [b1]
        for i in range(self.srb_nums):
            feats.append(
                PCAB(ch, i + 2, self.out_text_channels, name=f"block{i+2}")(
                    feats, tp, train
                )
            )
        cat = jnp.concatenate(feats[1:], axis=1)
        att = HOTA(ch * self.srb_nums, name="spatial_attention")(cat)
        h = Conv2d(ch, name="post_conv")(att)
        h = BatchNorm2d(name="post_bn")(h, train)
        h = h + b1
        for i in range(int(math.log2(self.scale_factor))):
            h = UpsampleBlock(ch, 2, name=f"up{i}")(h)
        out = jnp.tanh(Conv2d(in_planes, (9, 9), padding=(4, 4), lane_pack=4, name="final")(h))
        aux = {"spatial_t_emb": tp, "in_feat": b1, "trans_feat": tp}
        return out, aux
