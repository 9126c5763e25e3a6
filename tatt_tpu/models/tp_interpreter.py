"""TP Interpreter: text-prior -> spatial prior map via cross-attention.

Rebuilds ``TPInterpreter`` (``model/tsrn.py:155-224``) +
``InfoTransformer`` (``model/transformer_v2.py:154-244``):

  text prior [N, 37, 1, 26] --fc_in+PReLU--> [N, 26, 64] text tokens
  1 encoder layer self-attends the 26 tokens (sinusoidal PE as pos)
  learned query table (Embedding 1024 x 64) smoothed by a BiGRU along the
  width axis, used as query_pos
  2 cross-attention decoder layers with tgt = flattened image features
  mean over decoder intermediates -> reshape [N, 64, 16, 64] prior map

Known reference quirk (documented, not replicated): ``gru_encoding`` is
constructed with ``batch_first=True`` but fed [W, B, H*C]
(``transformer_v2.py:215-221``), so torch scans across the *batch* instead
of width.  All batch rows carry identical query embeddings, so the intended
semantics — a width-wise smoothing scan shared by the batch — is what we
implement: one BiGRU pass over the W axis of the (batch-independent) table.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from tatt_tpu.kernels.rnn import BiGRU
from tatt_tpu.models.common import Dense, PReLU
from tatt_tpu.models.transformer import (
    EncoderLayer,
    LayerNorm,
    TPDecoderLayer,
    positional_encoding,
)


class TPInterpreter(nn.Module):
    text_emb: int = 37
    d_model: int = 64
    output_size: tuple[int, int] = (16, 64)
    nhead: int = 4
    num_encoder_layers: int = 1
    num_decoder_layers: int = 2
    dropout: float = 0.1
    # 'width'     — the intended semantics: BiGRU smooths the query table
    #               along the W axis, shared across the batch (default).
    # 'reference' — bit-faithful to the reference's batch_first quirk
    #               (transformer_v2.py:215-221): torch scans across the
    #               BATCH, so each batch index gets a different query.
    #               Needed when importing reference generator checkpoints.
    query_gru_mode: str = "width"
    # 'NHWC': image features arrive feature-minor; the [N, HW, C] flatten
    # and the prior-map reshape are then free (no relayout copies).
    data_format: str = "NCHW"

    @nn.compact
    def __call__(
        self,
        image_feature: jnp.ndarray,  # [N, C, H, W] or [N, H, W, C]
        tp_input: jnp.ndarray,  # [N, text_emb, 1, T]
        deterministic: bool = True,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        nhwc = self.data_format == "NHWC"
        if nhwc:
            n, h, w, c_i = image_feature.shape
        else:
            n, c_i, h, w = image_feature.shape
        dt = image_feature.dtype
        # [N, T, text_emb]
        x = tp_input[:, :, 0, :].transpose(0, 2, 1).astype(dt)
        x = PReLU(name="fc_in_act")(Dense(self.d_model, name="fc_in")(x))
        t = x.shape[1]

        pos = positional_encoding(t, self.d_model, dt)[None]  # [1, T, C]
        if not deterministic and self.dropout > 0:
            # the reference's PE module applies dropout to the encoding
            # itself (transformer_v2.py:39-42)
            pos = nn.Dropout(rate=self.dropout, deterministic=False)(pos)

        memory = x
        for i in range(self.num_encoder_layers):
            memory = EncoderLayer(
                self.d_model,
                self.nhead,
                self.d_model,
                self.dropout,
                name=f"encoder_{i}",
            )(memory, pos, deterministic)

        # Learned query table [H*W, C], width-smoothed by a BiGRU whose
        # features pack the column (H x C); shared across the batch.
        seq_len = self.output_size[0] * self.output_size[1]
        init_factor = self.param(
            "init_factor",
            nn.initializers.normal(stddev=1.0),
            (seq_len, self.d_model),
        )
        fh, fw = self.output_size
        table = init_factor.astype(dt).reshape(fh, fw, self.d_model)
        gru = BiGRU(hidden=fh * self.d_model // 2, name="gru_encoding")
        if self.query_gru_mode == "reference":
            # torch batch_first quirk: rows = W positions, sequence = the
            # batch dimension (identical embeddings per step)
            cols = table.transpose(1, 0, 2).reshape(fw, 1, fh * self.d_model)
            cols = jnp.broadcast_to(cols, (fw, n, fh * self.d_model))
            cols = gru(cols)  # [W, N, H*C]
            query_pos = (
                cols.reshape(fw, n, fh, self.d_model)
                .transpose(1, 2, 0, 3)
                .reshape(n, seq_len, self.d_model)
            )
        else:
            cols = table.transpose(1, 0, 2).reshape(1, fw, fh * self.d_model)
            cols = gru(cols)
            query_pos = (
                cols.reshape(fw, fh, self.d_model)
                .transpose(1, 0, 2)
                .reshape(1, seq_len, self.d_model)
            )
            query_pos = jnp.broadcast_to(query_pos, (n, seq_len, self.d_model))

        # tgt = flattened image features [N, H*W, C] (row-major over H, W)
        if nhwc:
            tgt = image_feature.reshape(n, h * w, c_i)
        else:
            tgt = image_feature.reshape(n, c_i, h * w).transpose(0, 2, 1)

        norm = LayerNorm(name="decoder_norm")
        intermediates = []
        attn_weights = None
        out = tgt
        for i in range(self.num_decoder_layers):
            out, attn_weights = TPDecoderLayer(
                self.d_model,
                self.nhead,
                self.d_model,
                self.dropout,
                name=f"decoder_{i}",
            )(out, memory, pos, query_pos, deterministic)
            intermediates.append(norm(out))
        # return_intermediate semantics (transformer_v2.py:380-390): the mean
        # over per-layer normed outputs
        text_prior = sum(intermediates) / len(intermediates)  # [N, HW, C]
        if nhwc:
            text_prior = text_prior.reshape(n, h, w, self.d_model)
        else:
            text_prior = text_prior.transpose(0, 2, 1).reshape(
                n, self.d_model, h, w
            )
        return text_prior, attn_weights
