"""SRTransformer_V4 (arch ``tranSR_v4``) — rebuilds
``model/transformerSR.py:794-923``.

Column-token SR transformer: a light conv encoder lifts the LR image to
64ch features; the TPInterpreter-style InfoGenTrans produces a text-prior
map; features + prior become W column tokens of size C*H = 1024; a full
DETR transformer (4 encoder layers over the prior columns, 8 decoder
layers with self-attention, queries = learned table, tgt = feature
columns) produces the fused representation, decoded by a pixel-shuffle
tail.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from tatt_tpu.models.common import BatchNorm2d, Conv2d, PReLU, pixel_shuffle
from tatt_tpu.models.tp_interpreter import TPInterpreter
from tatt_tpu.models.transformer import (
    DecoderLayer,
    EncoderLayer,
    LayerNorm,
    positional_encoding,
)


class _ResBlock(nn.Module):
    """``transformerSR.py:451-479`` (no downsample path used)."""

    channels: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        r = Conv2d(self.channels, name="conv1")(x)
        r = BatchNorm2d(name="bn1")(r, train)
        r = PReLU(name="prelu")(r)
        r = Conv2d(self.channels, name="conv2")(r)
        r = BatchNorm2d(name="bn2")(r, train)
        return x + r


class SRTransformerV4(nn.Module):
    d_model: int = 1024
    cnt_d_model: int = 64
    t_encoder_num: int = 4
    t_decoder_num: int = 8
    scale_factor: int = 2
    in_planes: int = 4
    text_emb: int = 37
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        img_lr: jnp.ndarray,
        text_prior: jnp.ndarray,
        train: bool = False,
        deterministic: bool | None = None,
    ) -> tuple[jnp.ndarray, dict[str, Any]]:
        if deterministic is None:
            deterministic = not train

        # conv encoder (ConvEncoder, transformerSR.py:552-567)
        x = PReLU(name="enc_act")(
            Conv2d(64, (9, 9), padding=(4, 4), name="enc_conv")(img_lr)
        )
        x = _ResBlock(name="enc_block1")(x, train)
        feat = _ResBlock(name="enc_block2")(x, train)

        n, c, h, w = feat.shape
        tp_map, pr_weights = TPInterpreter(
            text_emb=self.text_emb,
            d_model=self.cnt_d_model,
            output_size=(h, w),
            dropout=self.dropout,
            name="infoGen",
        )(feat, text_prior, deterministic)

        src = jnp.maximum(feat + tp_map, 0.0)

        def columns(z):
            # [N, C, H, W] -> [N, W, C*H]
            return z.reshape(n, c * h, w).transpose(0, 2, 1)

        src_cols = columns(src)
        prior_cols = columns(tp_map)
        feat_cols = columns(feat)

        pos = positional_encoding(w, self.d_model, feat.dtype)[None]

        memory = prior_cols
        for i in range(self.t_encoder_num):
            memory = EncoderLayer(
                self.d_model, 4, 1024, self.dropout, name=f"encoder_{i}"
            )(memory, pos, deterministic)

        query = self.param(
            "init_factor", nn.initializers.normal(1.0), (w, self.d_model)
        )
        query_pos = jnp.broadcast_to(
            query.astype(feat.dtype)[None], (n, w, self.d_model)
        )

        norm = LayerNorm(name="decoder_norm")
        out = feat_cols
        intermediates = []
        for i in range(self.t_decoder_num):
            out, _attn = DecoderLayer(
                self.d_model, 4, 1024, self.dropout, name=f"decoder_{i}"
            )(out, memory, pos, query_pos, deterministic)
            intermediates.append(norm(out))
        hs = sum(intermediates) / len(intermediates)  # mean over layers

        hs_map = hs.transpose(0, 2, 1).reshape(n, c, h, w)
        fused = hs_map + src

        # SRResConvDecoder (transformerSR.py:630-641)
        up = Conv2d(64 * 4, name="dec_up_conv")(fused)
        up = PReLU(name="dec_up_act")(pixel_shuffle(up, 2))
        out_img = Conv2d(self.in_planes, (9, 9), padding=(4, 4), lane_pack=4, name="dec_final")(up)
        out_img = jnp.tanh(out_img)
        return out_img, {"pr_weights": pr_weights, "spatial_t_emb": tp_map}
