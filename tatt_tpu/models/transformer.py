"""Transformer pieces for the TP Interpreter.

Rebuilds the parts of ``model/transformer_v2.py`` the TATT path actually
uses: sinusoidal ``PositionalEncoding`` (:22-42), a post-norm
``TransformerEncoderLayer`` (:448-507), and ``TransformerDecoderLayer_TP``
(:773-833) whose self-attention is disabled — pure cross-attention between
1024 image-token queries and 26 text-token keys — inside a
``return_intermediate`` decoder (:346-392).

Internally batch-first [B, L, C] (TPU-friendly); the reference is [L, B, C].
Attention parameters follow torch ``nn.MultiheadAttention`` layout
(packed ``in_proj`` [3C, C]) for checkpoint import.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tatt_tpu.models.common import Dense


@lru_cache(maxsize=None)
def positional_encoding_table(max_len: int, d_model: int) -> np.ndarray:
    """Sin/cos table (``transformer_v2.py:22-42``): pe[:, 0::2]=sin,
    [:, 1::2]=cos with the log-space frequency schedule."""
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64) * -(math.log(10000.0) / d_model)
    )
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


def positional_encoding(length: int, d_model: int, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray(positional_encoding_table(length, d_model), dtype)


class MultiheadAttention(nn.Module):
    """Torch-parity MHA: packed qkv projection, scaled dot-product, output
    projection; returns (output, attn_weights averaged over heads)."""

    d_model: int
    nhead: int
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [B, Lq, C]
        key: jnp.ndarray,  # [B, Lk, C]
        value: jnp.ndarray,  # [B, Lk, C]
        deterministic: bool = True,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        c = self.d_model
        bound = 1.0 / math.sqrt(c)

        def xavier(key_, shape, dtype=jnp.float32):
            return nn.initializers.xavier_uniform()(key_, shape, dtype)

        in_proj_w = self.param("in_proj_weight", xavier, (3 * c, c))
        in_proj_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * c,))
        out_w = self.param(
            "out_proj_weight",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (c, c),
        )
        out_b = self.param("out_proj_bias", nn.initializers.zeros, (c,))

        dt = query.dtype
        wq, wk, wv = jnp.split(in_proj_w.astype(dt), 3, axis=0)
        bq, bk, bv = jnp.split(in_proj_b.astype(dt), 3, axis=0)
        q = query @ wq.T + bq
        k = key @ wk.T + bk
        v = value @ wv.T + bv

        b, lq, _ = q.shape
        lk = k.shape[1]
        hd = c // self.nhead
        q = q.reshape(b, lq, self.nhead, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, lk, self.nhead, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, lk, self.nhead, hd).transpose(0, 2, 1, 3)

        scale = 1.0 / math.sqrt(hd)
        # logits accumulate in f32 and the softmax normalizes in f32
        # (bf16 softmax weights carry rel 2^-8 rounding — the same class
        # of landmine as the TPS solve; pinned by test_precision_audit).
        # The QK^T multiplies stay in the compute dtype: the MXU pass is
        # where the time is, and rel 2e-3 logit noise pre-softmax is
        # benign (it perturbs weights ~0.4%, far under the f32->bf16
        # cast the weights pay anyway on the second einsum).
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk",
            q * scale,
            k,
            preferred_element_type=jnp.float32,
        )
        weights = jax.nn.softmax(logits, axis=-1)
        if self.dropout > 0.0 and not deterministic:
            weights = nn.Dropout(rate=self.dropout, deterministic=False)(weights)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights.astype(dt), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, c)
        out = out @ out_w.astype(dt).T + out_b.astype(dt)
        # torch returns weights averaged over heads: [B, Lq, Lk]
        return out, weights.mean(axis=1)


class LayerNorm(nn.Module):
    """LayerNorm with torch defaults (eps 1e-5), fp32 statistics."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        x32 = x.astype(jnp.float32)
        mean = x32.mean(-1, keepdims=True)
        var = x32.var(-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
        return (y * scale + bias).astype(x.dtype)


class EncoderLayer(nn.Module):
    """Post-norm encoder layer (``transformer_v2.py:470-484``):
    self-attn(q=k=src+pos, v=src) -> add&norm -> FFN -> add&norm."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,
        pos: Optional[jnp.ndarray],
        deterministic: bool = True,
    ) -> jnp.ndarray:
        q = src if pos is None else src + pos
        attn_out, _ = MultiheadAttention(
            self.d_model, self.nhead, self.dropout, name="self_attn"
        )(q, q, src, deterministic)
        drop = lambda y: (
            y
            if deterministic or self.dropout == 0.0
            else nn.Dropout(rate=self.dropout, deterministic=False)(y)
        )
        src = LayerNorm(name="norm1")(src + drop(attn_out))
        ff = Dense(self.dim_feedforward, name="linear1")(src)
        ff = drop(jax.nn.relu(ff))
        ff = Dense(self.d_model, name="linear2")(ff)
        src = LayerNorm(name="norm2")(src + drop(ff))
        return src


class DecoderLayer(nn.Module):
    """Full post-norm decoder layer with self-attention
    (``transformer_v2.py:707-734``): self-attn(q=k=tgt+query_pos, v=tgt)
    -> add&norm -> cross-attn -> add&norm -> FFN -> add&norm."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,
        memory: jnp.ndarray,
        pos: Optional[jnp.ndarray],
        query_pos: Optional[jnp.ndarray],
        deterministic: bool = True,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        drop = lambda y: (
            y
            if deterministic or self.dropout == 0.0
            else nn.Dropout(rate=self.dropout, deterministic=False)(y)
        )
        q = tgt if query_pos is None else tgt + query_pos
        sa, _ = MultiheadAttention(
            self.d_model, self.nhead, self.dropout, name="self_attn"
        )(q, q, tgt, deterministic)
        tgt = LayerNorm(name="norm1")(tgt + drop(sa))
        qc = tgt if query_pos is None else tgt + query_pos
        k = memory if pos is None else memory + pos
        ca, attn_weights = MultiheadAttention(
            self.d_model, self.nhead, self.dropout, name="multihead_attn"
        )(qc, k, memory, deterministic)
        tgt = LayerNorm(name="norm2")(tgt + drop(ca))
        ff = Dense(self.dim_feedforward, name="linear1")(tgt)
        ff = drop(jax.nn.relu(ff))
        ff = Dense(self.d_model, name="linear2")(ff)
        tgt = LayerNorm(name="norm3")(tgt + drop(ff))
        return tgt, attn_weights


class TPDecoderLayer(nn.Module):
    """``TransformerDecoderLayer_TP.forward_post`` (:806-833): the
    self-attention block is commented out in the reference, so this is
    cross-attn(q=tgt+query_pos, k=memory+pos, v=memory) -> add&norm ->
    FFN -> add&norm; returns (tgt, attn_weights)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,
        memory: jnp.ndarray,
        pos: Optional[jnp.ndarray],
        query_pos: Optional[jnp.ndarray],
        deterministic: bool = True,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        q = tgt if query_pos is None else tgt + query_pos
        k = memory if pos is None else memory + pos
        attn_out, attn_weights = MultiheadAttention(
            self.d_model, self.nhead, self.dropout, name="multihead_attn"
        )(q, k, memory, deterministic)
        drop = lambda y: (
            y
            if deterministic or self.dropout == 0.0
            else nn.Dropout(rate=self.dropout, deterministic=False)(y)
        )
        tgt = LayerNorm(name="norm2")(tgt + drop(attn_out))
        ff = Dense(self.dim_feedforward, name="linear1")(tgt)
        ff = drop(jax.nn.relu(ff))
        ff = Dense(self.d_model, name="linear2")(ff)
        tgt = LayerNorm(name="norm3")(tgt + drop(ff))
        return tgt, attn_weights
