"""TSRN backbone family and the TATT generator.

Rebuilds (reference cites):
  - ``GruBlock``                    ``model/tsrn.py:1067-1084``
  - ``RecurrentResidualBlock``      ``model/tsrn.py:850-871``
  - ``RecurrentResidualBlockTL``    ``model/tsrn.py:874-910``
  - ``UpsampleBLock`` / ``mish``    ``model/tsrn.py:1040-1064``
  - ``InfoGen``                     ``model/tsrn.py:284-317``
  - ``TSRN``                        ``model/tsrn.py:88-150``
  - ``TSRN_TL`` (TPGSR-style)       ``model/tsrn.py:321-442``
  - ``TSRN_TL_TRANS`` (== TATT)     ``model/tsrn.py:576-692``

Axis conventions (verified against the reference's transposes): inside an
SRB, ``gru1`` scans over HEIGHT (its input arrives spatially transposed)
batched over B*W rows and ``gru2`` scans over WIDTH batched over B*H rows.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from tatt_tpu.kernels.resize import resize_bilinear
from tatt_tpu.kernels.rnn import BiGRU
from tatt_tpu.models.common import (
    BatchNorm2d,
    Conv2d,
    ConvTranspose2d,
    PReLU,
    mish,
    pixel_shuffle,
    pixel_shuffle_nhwc,
)
from tatt_tpu.models.stn import STNHead, tps_transform
from tatt_tpu.models.tp_interpreter import TPInterpreter


class GruBlock(nn.Module):
    """1x1 conv then BiGRU over a spatial axis of the input, batched as
    B*H (or B*W) sequences (``model/tsrn.py:1067-1084``).

    ``data_format='NHWC'``: the 4-D activation goes to the fused GRU
    as-is with ``scan_axis`` picking the recurrence axis — the H<->W
    transposes the reference pays around its height-GRU (and the
    conv<->GRU relayout copies of the NCHW path, ~5 ms/step across the
    10 GruBlocks in the round-3 trace) are never materialized."""

    out_channels: int
    data_format: str = "NCHW"
    scan: str = "w"  # "w" or "h" (NHWC path only)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        nhwc = self.data_format == "NHWC"
        # conv1 is a 1x1 with nothing between it and the GRU, so it folds
        # exactly into the GRU input projection (one MXU pass, no
        # intermediate activation; params keep their checkpoint names)
        kernel, bias = Conv2d(
            self.out_channels,
            (1, 1),
            padding=(0, 0),
            data_format=self.data_format,
            params_only=True,
            name="conv1",
        )(x)
        pre_k = kernel[:, :, 0, 0]  # [Cmid, Cin]
        gru = BiGRU(hidden=self.out_channels // 2, name="gru")
        if nhwc:
            if self.scan == "w":
                # W-scan: the [N*H, W, C] sequence view is a FREE reshape
                # of the C-minor activation; the 3-D kernel entry's gates
                # einsum emits rows(=N*H) minor, which tiles the lanes
                # fully.  (Routing this through the 4-D scan_axis=2 entry
                # instead left h=16 as the einsum's minor dim and cost
                # ~9% end-to-end — one of the two round-4 regressions;
                # the other was the stem lane-pack, see the TATT stem.)
                n, h, w, c = x.shape
                seq = x.reshape(n * h, w, c)
                seq = gru(seq, pre_kernel=pre_k, pre_bias=bias)
                return seq.reshape(n, h, w, self.out_channels)
            # H-scan (unwired experiment): in-place 4-D entry
            return gru(x, pre_kernel=pre_k, pre_bias=bias, scan_axis=1)
        assert self.scan == "w", "NCHW path scans W; transpose at the caller"
        n, c, h, w = x.shape
        seq = x.transpose(0, 2, 3, 1).reshape(n * h, w, c)
        seq = gru(seq, pre_kernel=pre_k, pre_bias=bias)
        return seq.reshape(n, h, w, self.out_channels).transpose(0, 3, 1, 2)


class RecurrentResidualBlock(nn.Module):
    """Plain SRB: conv-BN-mish-conv-BN -> height-GRU -> +x -> width-GRU."""

    channels: int
    data_format: str = "NCHW"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        df = self.data_format
        r = Conv2d(self.channels, data_format=df, name="conv1")(x)
        r = BatchNorm2d(data_format=df, name="bn1")(r, train)
        r = mish(r)
        r = Conv2d(self.channels, data_format=df, name="conv2")(r)
        r = BatchNorm2d(data_format=df, name="bn2")(r, train)
        # gru1 over height: the reference transposes H<->W around its
        # GruBlock.  The in-place scan="h" variant exists and is
        # equivalence-tested, but benches 7% SLOWER end-to-end than the
        # transpose formulation (2,111 vs 2,275 img/s — the short H=16
        # scan axis costs the kernel more than the relayout it saves),
        # so the wiring keeps the transposes.
        swap = (0, 2, 1, 3) if df == "NHWC" else (0, 1, 3, 2)
        r = GruBlock(self.channels, data_format=df, name="gru1")(
            r.transpose(*swap)
        ).transpose(*swap)
        return GruBlock(self.channels, data_format=df, name="gru2")(x + r)


class RecurrentResidualBlockTL(nn.Module):
    """SRB fused with the text-prior map (``model/tsrn.py:874-910``):
    the prior concatenates onto the residual before the height-GRU."""

    channels: int
    text_channels: int
    bn_copies: int = 1
    data_format: str = "NCHW"

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, text_emb: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        df = self.data_format
        nhwc = df == "NHWC"
        r = Conv2d(self.channels, data_format=df, name="conv1")(x)
        r = BatchNorm2d(copies=self.bn_copies, data_format=df, name="bn1")(r, train)
        r = mish(r)
        r = Conv2d(self.channels, data_format=df, name="conv2")(r)
        r = BatchNorm2d(copies=self.bn_copies, data_format=df, name="bn2")(r, train)
        cat = jnp.concatenate(
            [r, text_emb.astype(r.dtype)], axis=3 if nhwc else 1
        )
        # gru1 scans HEIGHT via H<->W transposes (the in-place scan="h"
        # variant benches 7% slower end-to-end; see RecurrentResidualBlock)
        swap = (0, 2, 1, 3) if nhwc else (0, 1, 3, 2)
        r = GruBlock(self.channels, data_format=df, name="gru1")(
            cat.transpose(*swap)
        ).transpose(*swap)
        return GruBlock(self.channels, data_format=df, name="gru2")(x + r)


class UpsampleBlock(nn.Module):
    """conv3x3 (C -> C*r^2) -> PixelShuffle(r) -> mish."""

    channels: int
    up_scale: int = 2
    data_format: str = "NCHW"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = Conv2d(
            self.channels * self.up_scale**2,
            data_format=self.data_format,
            name="conv",
        )(x)
        if self.data_format == "NHWC":
            return mish(pixel_shuffle_nhwc(x, self.up_scale))
        return mish(pixel_shuffle(x, self.up_scale))


class InfoGen(nn.Module):
    """TPGSR-style prior deconv (``model/tsrn.py:284-317``): 4 transposed
    convs lift [B, t_emb, 1, 26] to a spatial map (resized by caller)."""

    out_channels: int
    bn_copies: int = 1

    @nn.compact
    def __call__(self, t: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        specs = [
            (512, (2, 2), (0, 0)),
            (128, (2, 2), (0, 0)),
            (64, (2, 2), (1, 1)),
            (self.out_channels, (2, 1), (1, 1)),
        ]
        x = t
        for i, (c, s, p) in enumerate(specs):
            x = ConvTranspose2d(
                c, (3, 3), strides=s, padding=p, use_bias=False, name=f"tconv{i+1}"
            )(x)
            x = BatchNorm2d(copies=self.bn_copies, name=f"bn{i+1}")(x, train)
            x = jnp.maximum(x, 0.0)
        return x


class TSRN(nn.Module):
    """Plain TSRN baseline (``model/tsrn.py:88-150``)."""

    scale_factor: int = 2
    width: int = 128
    height: int = 32
    stn: bool = False
    srb_nums: int = 5
    mask: bool = True
    hidden_units: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        ch = 2 * self.hidden_units
        in_planes = 4 if self.mask else 3
        if self.stn and train:
            ctrl = STNHead(name="stn_head")(x, train)
            x = tps_transform(
                x, ctrl, (self.height // self.scale_factor, self.width // self.scale_factor)
            )
        # NHWC trunk (see TATT) with NCHW I/O
        b1 = PReLU(name="block1_act")(
            Conv2d(
                ch, (9, 9), padding=(4, 4), data_format="NHWC",
                name="block1_conv",
            )(x.transpose(0, 2, 3, 1))
        )
        h = b1
        for i in range(self.srb_nums):
            h = RecurrentResidualBlock(ch, data_format="NHWC", name=f"srb{i+2}")(
                h, train
            )
        h = Conv2d(ch, data_format="NHWC", name="post_conv")(h)
        h = BatchNorm2d(data_format="NHWC", name="post_bn")(h, train)
        h = b1 + h
        for i in range(int(math.log2(self.scale_factor))):
            h = UpsampleBlock(ch, 2, data_format="NHWC", name=f"up{i}")(h)
        out = Conv2d(
            in_planes, (9, 9), padding=(4, 4), lane_pack=4,
            data_format="NHWC", name="final_conv",
        )(h)
        return jnp.tanh(out).transpose(0, 3, 1, 2)


class TSRN_TL(nn.Module):
    """TSRN + InfoGen prior fusion (arch ``tsrn_tl_cascade``,
    ``model/tsrn.py:321-442``)."""

    scale_factor: int = 2
    width: int = 128
    height: int = 32
    stn: bool = False
    srb_nums: int = 5
    mask: bool = True
    hidden_units: int = 32
    text_emb: int = 37
    out_text_channels: int = 64
    bn_copies: int = 1

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        text_emb: jnp.ndarray,
        train: bool = False,
    ) -> tuple[jnp.ndarray, dict[str, Any]]:
        ch = 2 * self.hidden_units
        in_planes = 4 if self.mask else 3
        if self.stn and train:
            ctrl = STNHead(bn_copies=self.bn_copies, name="stn_head")(x, train)
            x = tps_transform(
                x, ctrl, (self.height // self.scale_factor, self.width // self.scale_factor)
            )
        # NHWC trunk (see TATT); InfoGen's deconv stack stays NCHW and its
        # prior map transposes once at the seam.
        b1 = PReLU(name="block1_act")(
            Conv2d(
                ch, (9, 9), padding=(4, 4), data_format="NHWC",
                name="block1_conv",
            )(x.transpose(0, 2, 3, 1))
        )
        tp_raw = InfoGen(
            self.out_text_channels, bn_copies=self.bn_copies, name="infoGen"
        )(text_emb, train)
        tp_map = resize_bilinear(tp_raw, x.shape[2], x.shape[3], align_corners=True)
        tp_h = tp_map.transpose(0, 2, 3, 1)

        h = b1
        for i in range(self.srb_nums):
            h = RecurrentResidualBlockTL(
                ch,
                self.out_text_channels,
                bn_copies=self.bn_copies,
                data_format="NHWC",
                name=f"srb{i+2}",
            )(h, tp_h, train)
        h = Conv2d(ch, data_format="NHWC", name="post_conv")(h)
        h = BatchNorm2d(
            copies=self.bn_copies, data_format="NHWC", name="post_bn"
        )(h, train)
        h = b1 + h
        for i in range(int(math.log2(self.scale_factor))):
            h = UpsampleBlock(ch, 2, data_format="NHWC", name=f"up{i}")(h)
        out = Conv2d(
            in_planes, (9, 9), padding=(4, 4), lane_pack=4,
            data_format="NHWC", name="final_conv",
        )(h)
        out = jnp.tanh(out).transpose(0, 3, 1, 2)
        aux = {
            "spatial_t_emb": tp_raw,
            "in_feat": b1.transpose(0, 3, 1, 2),
            "trans_feat": tp_map,
        }
        return out, aux


class SFTLayer(nn.Module):
    """Scale/shift feature transform (``model/tsrn.py:227-242``):
    out = fea * (scale(cond) + 1) + shift(cond).  The reference hard-codes
    64ch (works only at default width); we follow the feature width."""

    data_format: str = "NCHW"

    @nn.compact
    def __call__(self, fea: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        out_ch = fea.shape[3 if self.data_format == "NHWC" else 1]

        def branch(name):
            h = Conv2d(
                max(out_ch // 2, 1), (1, 1), padding=(0, 0),
                data_format=self.data_format, name=f"{name}0",
            )(cond)
            h = jnp.where(h >= 0, h, 0.1 * h)  # leaky_relu 0.1
            return Conv2d(
                out_ch, (1, 1), padding=(0, 0),
                data_format=self.data_format, name=f"{name}1",
            )(h)

        scale = branch("SFT_scale_conv")
        shift = branch("SFT_shift_conv")
        return fea * (scale + 1.0) + shift


class TSRN_TL_SFT(nn.Module):
    """``model/tsrn.py:446-572``: InfoGen prior modulated by an SFT layer
    conditioned on the stem features (arch ``tsrn_tl_cascade_sft``)."""

    scale_factor: int = 2
    width: int = 128
    height: int = 32
    stn: bool = False
    srb_nums: int = 5
    mask: bool = True
    hidden_units: int = 32
    text_emb: int = 37
    out_text_channels: int = 64
    bn_copies: int = 1

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, text_emb: jnp.ndarray, train: bool = False
    ) -> tuple[jnp.ndarray, dict[str, Any]]:
        ch = 2 * self.hidden_units
        in_planes = 4 if self.mask else 3
        if self.stn and train:
            ctrl = STNHead(bn_copies=self.bn_copies, name="stn_head")(x, train)
            x = tps_transform(
                x,
                ctrl,
                (self.height // self.scale_factor, self.width // self.scale_factor),
            )
        # NHWC trunk (see TATT); InfoGen stays NCHW, its map transposes once.
        b1 = PReLU(name="block1_act")(
            Conv2d(
                ch, (9, 9), padding=(4, 4), data_format="NHWC",
                name="block1_conv",
            )(x.transpose(0, 2, 3, 1))
        )
        tp_raw = InfoGen(
            self.out_text_channels, bn_copies=self.bn_copies, name="infoGen"
        )(text_emb, train)
        tp = resize_bilinear(tp_raw, x.shape[2], x.shape[3], align_corners=True)
        tp = SFTLayer(data_format="NHWC", name="sft_layer")(
            b1, tp.transpose(0, 2, 3, 1).astype(b1.dtype)
        )
        h = b1
        for i in range(self.srb_nums):
            h = RecurrentResidualBlockTL(
                ch,
                self.out_text_channels,
                bn_copies=self.bn_copies,
                data_format="NHWC",
                name=f"srb{i+2}",
            )(h, tp, train)
        h = Conv2d(ch, data_format="NHWC", name="post_conv")(h)
        h = BatchNorm2d(
            copies=self.bn_copies, data_format="NHWC", name="post_bn"
        )(h, train)
        h = b1 + h
        for i in range(int(math.log2(self.scale_factor))):
            h = UpsampleBlock(ch, 2, data_format="NHWC", name=f"up{i}")(h)
        out = jnp.tanh(
            Conv2d(
                in_planes, (9, 9), padding=(4, 4), lane_pack=4,
                data_format="NHWC", name="final_conv",
            )(h)
        ).transpose(0, 3, 1, 2)
        return out, {
            "spatial_t_emb": tp_raw,
            "in_feat": b1.transpose(0, 3, 1, 2),
            "trans_feat": tp.transpose(0, 3, 1, 2),
        }


class TSRN_C2F(nn.Module):
    """Coarse-to-fine TSRN (``model/tsrn.py:696-761``): a coarse RGB
    projection is concatenated before the upsample tail; returns
    (output, coarse)."""

    scale_factor: int = 2
    stn: bool = False
    srb_nums: int = 5
    mask: bool = True
    hidden_units: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        ch = 2 * self.hidden_units
        in_planes = 4 if self.mask else 3
        if self.stn and train:
            ctrl = STNHead(name="stn_head")(x, train)
            x = tps_transform(x, ctrl, (x.shape[2], x.shape[3]))
        # NHWC trunk (see TATT) with NCHW I/O
        b1 = PReLU(name="block1_act")(
            Conv2d(
                ch, (9, 9), padding=(4, 4), data_format="NHWC",
                name="block1_conv",
            )(x.transpose(0, 2, 3, 1))
        )
        h = b1
        for i in range(self.srb_nums):
            h = RecurrentResidualBlock(ch, data_format="NHWC", name=f"srb{i+2}")(
                h, train
            )
        h = Conv2d(ch, data_format="NHWC", name="post_conv")(h)
        h = BatchNorm2d(data_format="NHWC", name="post_bn")(h, train)
        coarse = Conv2d(
            in_planes, (9, 9), padding=(4, 4), lane_pack=4,
            data_format="NHWC", name="coarse_proj",
        )(h)
        cat = jnp.concatenate([b1 + h, coarse], axis=3)
        up = cat
        for i in range(int(math.log2(self.scale_factor))):
            up = UpsampleBlock(
                ch + in_planes, 2, data_format="NHWC", name=f"up{i}"
            )(up)
        out = jnp.tanh(
            Conv2d(
                in_planes, (9, 9), padding=(4, 4), lane_pack=4,
                data_format="NHWC", name="final_conv",
            )(up)
        )
        return out.transpose(0, 3, 1, 2), coarse.transpose(0, 3, 1, 2)


class TSRNEncoder(nn.Module):
    """Feature-space TSRN without the upsample tail
    (``model/tsrn.py:24-85``)."""

    stn: bool = False
    srb_nums: int = 5
    mask: bool = True
    hidden_units: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        ch = 2 * self.hidden_units
        if self.stn and train:
            ctrl = STNHead(name="stn_head")(x, train)
            x = tps_transform(x, ctrl, (x.shape[2], x.shape[3]))
        b1 = PReLU(name="block1_act")(
            Conv2d(ch, (9, 9), padding=(4, 4), name="block1_conv")(x)
        )
        h = b1
        for i in range(self.srb_nums):
            h = RecurrentResidualBlock(ch, name=f"srb{i+2}")(h, train)
        h = Conv2d(ch, name="post_conv")(h)
        h = BatchNorm2d(name="post_bn")(h, train)
        return b1 + h


class ReasoningResidualBlock(nn.Module):
    """``model/tsrn.py:945-976``: SRB whose recurrence is replaced by a
    self-attention FeatureEnhancerW2V.  NOTE the reference's enhancer
    ignores its word2vec argument entirely (``model_transformer.py:420-444``
    — the projection is commented out), so this block takes no word input.
    """

    channels: int
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, deterministic: bool = True
    ) -> jnp.ndarray:
        from tatt_tpu.models.transformer import MultiheadAttention
        from tatt_tpu.models.common import Dense
        from tatt_tpu.models.zoo.tbsrn import TorchLayerNorm

        r = Conv2d(self.channels, name="conv1")(x)
        r = mish(BatchNorm2d(name="bn1")(r, train))
        r = Conv2d(self.channels, name="conv2")(r)
        r = BatchNorm2d(name="bn2")(r, train)
        n, c, h, w = r.shape
        tokens = r.reshape(n, c, h * w).transpose(0, 2, 1)  # [N, T, C]
        attn, _ = MultiheadAttention(c, 4, self.dropout, name="mask_multihead")(
            tokens, tokens, tokens, deterministic
        )
        tokens = TorchLayerNorm(name="norm1")(tokens + attn)
        ff = Dense(c, name="pff_w1")(tokens)
        ff = Dense(c, name="pff_w2")(jnp.maximum(ff, 0.0))
        tokens = TorchLayerNorm(name="norm3")(tokens + ff)
        r = tokens.transpose(0, 2, 1).reshape(n, c, h, w)
        return x + r


class SEM_TSRN(nn.Module):
    """Word2vec-semantic TSRN ablation (``model/tsrn.py:764-848``): every
    SRB predicts a word vector via ``ImFeat2WordVec`` (returned for the
    semantic loss) and runs a reasoning block."""

    scale_factor: int = 2
    stn: bool = False
    srb_nums: int = 5
    mask: bool = True
    hidden_units: int = 32
    word_vec_d: int = 300

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, deterministic: bool = True
    ):
        from tatt_tpu.models.common import Dense

        ch = 2 * self.hidden_units
        in_planes = 4 if self.mask else 3
        if self.stn and train:
            ctrl = STNHead(name="stn_head")(x, train)
            x = tps_transform(x, ctrl, (x.shape[2], x.shape[3]))
        b1 = PReLU(name="block1_act")(
            Conv2d(ch, (9, 9), padding=(4, 4), name="block1_conv")(x)
        )
        w2v_proj = Dense(self.word_vec_d, name="w2v_proj")
        h = b1
        pred_vecs = []
        for i in range(self.srb_nums):
            pred_vecs.append(w2v_proj(h.mean(axis=(2, 3))))
            h = ReasoningResidualBlock(ch, name=f"srb{i+2}")(h, train, deterministic)
        h = Conv2d(ch, name="post_conv")(h)
        h = BatchNorm2d(name="post_bn")(h, train)
        h = b1 + h
        for i in range(int(math.log2(self.scale_factor))):
            h = UpsampleBlock(ch, 2, name=f"up{i}")(h)
        out = jnp.tanh(Conv2d(in_planes, (9, 9), padding=(4, 4), lane_pack=4, name="final_conv")(h))
        return out, pred_vecs


class TATT(nn.Module):
    """The TATT generator — ``TSRN_TL_TRANS`` (``model/tsrn.py:576-692``).

    Input: [N, 4, 16, 64] (RGB + binary mask channel) plus the text prior
    [N, 37, 1, 26] (softmax CRNN probabilities).  Output: [N, 4, 32, 128]
    in tanh range, plus an aux dict (training) / attention weights (eval).
    """

    scale_factor: int = 2
    width: int = 128
    height: int = 32
    stn: bool = False
    srb_nums: int = 5
    mask: bool = True
    hidden_units: int = 32
    text_emb: int = 37
    out_text_channels: int = 64
    dropout: float = 0.1
    query_gru_mode: str = "width"  # see TPInterpreter
    # >1: the batch packs bn_copies logical batches (fused-tssim 2B forward)
    # and every BatchNorm computes per-copy statistics — see BatchNorm2d.
    bn_copies: int = 1

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        text_emb: Optional[jnp.ndarray] = None,
        train: bool = False,
        deterministic: Optional[bool] = None,
    ) -> tuple[jnp.ndarray, dict[str, Any]]:
        if deterministic is None:
            deterministic = not train
        ch = 2 * self.hidden_units
        # The TP decoder uses the stem features directly as queries
        # (tsrn.py:206,218), so feature width must equal the prior width.
        assert ch == self.out_text_channels, (
            f"TATT requires 2*hidden_units == out_text_channels "
            f"({ch} != {self.out_text_channels})"
        )
        in_planes = 4 if self.mask else 3
        lr_h = self.height // self.scale_factor
        lr_w = self.width // self.scale_factor

        # STN rectification runs only during training (tsrn.py:648-650)
        if self.stn and train:
            ctrl = STNHead(bn_copies=self.bn_copies, name="stn_head")(x, train)
            x = tps_transform(x, ctrl, (lr_h, lr_w))

        if text_emb is None:
            text_emb = jnp.zeros((x.shape[0], self.text_emb, 1, 26), x.dtype)

        # TPU-native layout: the whole trunk runs feature-minor (NHWC).
        # Conv activations, the GruBlock sequence views [N*H, W, C], and
        # the TP decoder's [N, HW, C] flatten then share one physical
        # layout — the round-3 device trace measured ~5 ms/step of
        # relayout copies at exactly these seams in the NCHW formulation.
        # I/O stays NCHW (the reference's tensor contract).
        # NOTE: the stem is deliberately NOT lane-packed.  Round 4 added
        # lane_pack=4 here (few INPUT channels); a round-5 interleaved
        # A/B measured it at -148 img/s end-to-end (2,005 vs 2,153):
        # unlike the final conv (4 OUTPUT channels stranding 124 MXU
        # lanes), the stem's 64 output channels already tile well, and
        # packing pays 1.78x FLOPs for nothing.
        xh = x.transpose(0, 2, 3, 1)
        b1 = PReLU(name="block1_act")(
            Conv2d(
                ch, (9, 9), padding=(4, 4), data_format="NHWC",
                name="block1_conv",
            )(xh)
        )

        tp_map, pr_weights = TPInterpreter(
            text_emb=self.text_emb,
            d_model=self.out_text_channels,
            output_size=(lr_h, lr_w),
            dropout=self.dropout,
            query_gru_mode=self.query_gru_mode,
            data_format="NHWC",
            name="infoGen",
        )(b1, text_emb, deterministic)

        h = b1
        for i in range(self.srb_nums):
            h = RecurrentResidualBlockTL(
                ch,
                self.out_text_channels,
                bn_copies=self.bn_copies,
                data_format="NHWC",
                name=f"srb{i+2}",
            )(h, tp_map, train)
        h = Conv2d(ch, data_format="NHWC", name="post_conv")(h)
        h = BatchNorm2d(
            copies=self.bn_copies, data_format="NHWC", name="post_bn"
        )(h, train)
        h = b1 + h
        for i in range(int(math.log2(self.scale_factor))):
            h = UpsampleBlock(ch, 2, data_format="NHWC", name=f"up{i}")(h)
        out = Conv2d(
            in_planes, (9, 9), padding=(4, 4), lane_pack=4,
            data_format="NHWC", name="final_conv",
        )(h)
        out = jnp.tanh(out).transpose(0, 3, 1, 2)

        # aux stays NCHW for its consumers (learning_STN image_loss,
        # visualization); XLA DCEs the transposes when unused.
        aux = {
            "pr_weights": pr_weights,
            "spatial_t_emb": tp_map.transpose(0, 3, 1, 2),
            "in_feat": b1.transpose(0, 3, 1, 2),
            "trans_feat": tp_map.transpose(0, 3, 1, 2),
        }
        return out, aux
