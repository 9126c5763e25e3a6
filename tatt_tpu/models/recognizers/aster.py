"""ASTER recognizer — eval judge for ``--test_model=ASTER``.

Rebuilds ``model/recognizer/``:
  - ``RecognizerBuilder`` (``recognizer_builder.py:27-104``): STN(TPS,
    20 pts, 32x64 stn input -> 32x100 rectified) -> ResNet_ASTER encoder ->
    attention GRU decoder.  NOTE the reference passes the arch *string* as
    ``with_lstm`` (``recognizer_builder.py:44``), so the 2-layer BiLSTM
    encoder head is always on.
  - ``ResNet_ASTER`` (``resnet_aster.py:64-135``): 5 stages of AsterBlocks
    (1x1 conv -> 3x3 conv residual), strides [2,2],[2,2],[2,1],[2,1],[2,1].
  - ``AttentionRecognitionHead`` (``attention_recognition_head.py``):
    additive attention + GRU cell + linear head; greedy ``sample`` and
    ``beam_search`` (width 5) decoding.

Decoding is a ``lax.scan`` over ``max_len`` steps; beam search emits
(symbols, predecessors, scores) per step and backtracks on host — the
reference's dynamic-control-flow backtrack is eval-only bookkeeping.

The input adapter is ``parse_aster_data`` (``interfaces/base.py:850-859``):
images * 2 - 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tatt_tpu.kernels.resize import resize_bilinear
from tatt_tpu.kernels.rnn import BiLSTM, gru_cell
from tatt_tpu.models.common import BatchNorm2d, Conv2d
from tatt_tpu.models.stn import STNHead, tps_transform


class AsterBlock(nn.Module):
    planes: int
    stride: tuple[int, int] = (1, 1)
    downsample: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        residual = x
        out = Conv2d(
            self.planes, (1, 1), strides=self.stride, padding=(0, 0),
            use_bias=False, data_format="NHWC", name="conv1",
        )(x)
        out = BatchNorm2d(data_format="NHWC", name="bn1")(out, train)
        out = jnp.maximum(out, 0.0)
        out = Conv2d(
            self.planes, (3, 3), padding=(1, 1), use_bias=False,
            data_format="NHWC", name="conv2",
        )(out)
        out = BatchNorm2d(data_format="NHWC", name="bn2")(out, train)
        if self.downsample:
            residual = Conv2d(
                self.planes, (1, 1), strides=self.stride, padding=(0, 0),
                use_bias=False, data_format="NHWC", name="downsample_conv",
            )(x)
            residual = BatchNorm2d(data_format="NHWC", name="downsample_bn")(
                residual, train
            )
        return jnp.maximum(out + residual, 0.0)


class ResNetAster(nn.Module):
    """[N,3,32,100] -> [N, 25, 512] sequence features (with 2-layer BiLSTM).
    NHWC trunk (NCHW input): the final [N, W, C] view is a free reshape."""

    with_lstm: bool = True
    planes: tuple[int, ...] = (32, 64, 128, 256, 512)
    blocks: tuple[int, ...] = (3, 4, 6, 6, 3)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x.transpose(0, 2, 3, 1)
        x = Conv2d(
            self.planes[0], (3, 3), padding=(1, 1), use_bias=False,
            data_format="NHWC", name="conv0",
        )(x)
        x = BatchNorm2d(data_format="NHWC", name="bn0")(x, train)
        x = jnp.maximum(x, 0.0)
        strides = [(2, 2), (2, 2), (2, 1), (2, 1), (2, 1)]
        inplanes = self.planes[0]
        for li, (planes, nblocks, stride) in enumerate(
            zip(self.planes, self.blocks, strides)
        ):
            for bi in range(nblocks):
                s = stride if bi == 0 else (1, 1)
                down = bi == 0 and (s != (1, 1) or inplanes != planes)
                x = AsterBlock(
                    planes, s, down, name=f"layer{li+1}_{bi}"
                )(x, train)
                inplanes = planes
        # [N, 1, W, C] -> [N, W, C]
        seq = x[:, 0, :, :]
        if self.with_lstm:
            seq = BiLSTM(hidden=256, num_layers=2, name="rnn")(seq)
        return seq


class AsterDecoderParams(nn.Module):
    """Parameter container for the attention decoder (torch layout)."""

    num_classes: int
    in_planes: int = 512
    s_dim: int = 512
    att_dim: int = 512

    def setup(self):
        # raw params (no lazy submodules): the decode step runs inside
        # lax.scan, where first-call flax module init would leak tracers.
        from tatt_tpu.models.common import torch_conv_init

        self.sEmbed = {
            "kernel": self.param(
                "sEmbed_kernel", torch_conv_init(self.s_dim), (self.s_dim, self.att_dim)
            ),
            "bias": self.param(
                "sEmbed_bias", torch_conv_init(self.s_dim), (self.att_dim,)
            ),
        }
        self.xEmbed = {
            "kernel": self.param(
                "xEmbed_kernel",
                torch_conv_init(self.in_planes),
                (self.in_planes, self.att_dim),
            ),
            "bias": self.param(
                "xEmbed_bias", torch_conv_init(self.in_planes), (self.att_dim,)
            ),
        }
        self.wEmbed = {
            "kernel": self.param(
                "wEmbed_kernel", torch_conv_init(self.att_dim), (self.att_dim, 1)
            ),
            "bias": self.param("wEmbed_bias", torch_conv_init(self.att_dim), (1,)),
        }
        self.tgt_embedding = self.param(
            "tgt_embedding",
            nn.initializers.normal(1.0),
            (self.num_classes + 1, self.att_dim),
        )
        rinit = nn.initializers.uniform(scale=1.0 / np.sqrt(self.s_dim))
        self.gru_w_ih = self.param(
            "gru_w_ih", rinit, (3 * self.s_dim, self.in_planes + self.att_dim)
        )
        self.gru_w_hh = self.param("gru_w_hh", rinit, (3 * self.s_dim, self.s_dim))
        self.gru_b_ih = self.param("gru_b_ih", rinit, (3 * self.s_dim,))
        self.gru_b_hh = self.param("gru_b_hh", rinit, (3 * self.s_dim,))
        self.fc = {
            "kernel": self.param(
                "fc_kernel", torch_conv_init(self.s_dim), (self.s_dim, self.num_classes)
            ),
            "bias": self.param(
                "fc_bias", torch_conv_init(self.s_dim), (self.num_classes,)
            ),
        }

    @staticmethod
    def _lin(p, x):
        return x @ p["kernel"].astype(x.dtype) + p["bias"].astype(x.dtype)

    def x_embed(self, x):
        return self._lin(self.xEmbed, x)

    def decode_step(self, x_proj, x, state, y_prev):
        """One decoder step.  ``x``: [B, T, C]; ``x_proj``: [B, T, A]
        (precomputed xEmbed); ``state``: [B, S]; ``y_prev``: [B] int."""
        s_proj = self._lin(self.sEmbed, state)[:, None, :]
        v = self._lin(self.wEmbed, jnp.tanh(s_proj + x_proj))[..., 0]  # [B, T]
        alpha = jax.nn.softmax(v, axis=1)
        context = jnp.einsum("bt,btc->bc", alpha, x)
        y_emb = self.tgt_embedding[y_prev].astype(x.dtype)
        gru_in = jnp.concatenate([y_emb, context], axis=1)
        new_state = gru_cell(
            gru_in, state, self.gru_w_ih, self.gru_w_hh, self.gru_b_ih, self.gru_b_hh
        )
        logits = self._lin(self.fc, new_state)
        return logits, new_state

    def __call__(self, x, max_len: int):
        """Greedy decode: returns (pred_ids [B, max_len], scores)."""
        b = x.shape[0]
        x_proj = self.x_embed(x)
        state0 = jnp.zeros((b, self.s_dim), x.dtype)
        y0 = jnp.full((b,), self.num_classes, jnp.int32)  # <BOS>

        def step(carry, _):
            state, y_prev = carry
            logits, state = self.decode_step(x_proj, x, state, y_prev)
            probs = jax.nn.softmax(logits, axis=1)
            score = probs.max(axis=1)
            pred = jnp.argmax(logits, axis=1).astype(jnp.int32)
            return (state, pred), (pred, score)

        _, (preds, scores) = jax.lax.scan(
            step, (state0, y0), None, length=max_len
        )
        return preds.T, scores.T  # [B, max_len]

    def beam_step_fn(self, x, beam_width: int, max_len: int):
        """Beam search forward pass: returns per-step (symbols [B*K],
        predecessors [B*K], scores [B*K]) stacked over time, for host
        backtracking (mirrors ``attention_recognition_head.py:68-187``)."""
        b = x.shape[0]
        k = beam_width
        nc = self.num_classes
        x_inf = jnp.repeat(x, k, axis=0)  # AABBCC
        x_proj = self.x_embed(x_inf)
        state0 = jnp.zeros((b * k, self.s_dim), x.dtype)
        y0 = jnp.full((b * k,), nc, jnp.int32)
        seq0 = jnp.full((b, k), -jnp.inf).at[:, 0].set(0.0).reshape(b * k, 1)
        pos_index = (jnp.arange(b) * k)[:, None]

        def step(carry, _):
            state, y_prev, seq_scores = carry
            logits, state = self.decode_step(x_proj, x_inf, state, y_prev)
            logp = jax.nn.log_softmax(logits, axis=1)
            cand_scores = seq_scores + logp  # [B*K, nc]
            scores, candidates = jax.lax.top_k(
                cand_scores.reshape(b, k * nc), k
            )
            y = (candidates % nc).reshape(b * k).astype(jnp.int32)
            seq_scores = scores.reshape(b * k, 1)
            predecessors = (candidates // nc + pos_index).reshape(b * k)
            state = state[predecessors]
            out_scores = seq_scores[:, 0]
            return (state, y, seq_scores), (y, predecessors, out_scores)

        _, (symbols, predecessors, scores) = jax.lax.scan(
            step, (state0, y0, seq0), None, length=max_len
        )
        return symbols, predecessors, scores


class AsterRecognizer(nn.Module):
    """Full ASTER: STN rectification + encoder; decoding via methods."""

    num_classes: int
    max_len: int = 100
    stn_on: bool = True

    def setup(self):
        self.stn_head = STNHead(num_ctrlpoints=20, variant="aster")
        self.encoder = ResNetAster(with_lstm=True)
        self.decoder = AsterDecoderParams(num_classes=self.num_classes)

    def encode(self, images: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = images
        if self.stn_on:
            stn_in = resize_bilinear(x, 32, 64, align_corners=True)
            ctrl = self.stn_head(stn_in, train)
            x = tps_transform(x, ctrl, (32, 100))
        return self.encoder(x, train)

    def __call__(self, images: jnp.ndarray, train: bool = False):
        """Greedy decode path: returns (pred_ids, scores)."""
        feats = self.encode(images, train)
        return self.decoder(feats, self.max_len)

    def beam_tensors(self, images: jnp.ndarray, beam_width: int = 5):
        feats = self.encode(images, False)
        return self.decoder.beam_step_fn(feats, beam_width, self.max_len)


def beam_backtrack(
    symbols: np.ndarray,
    predecessors: np.ndarray,
    scores: np.ndarray,
    batch_size: int,
    beam_width: int,
    eos: int,
) -> np.ndarray:
    """Host-side backtrack of the scan outputs -> best sequence [B, T].

    Simplified relative to the reference's in-loop EOS bookkeeping: beams
    are followed from the best final score; sequences stop at EOS when
    decoded downstream (``get_string_aster`` stops at EOS anyway,
    ``utils/metrics.py:36-44``)."""
    t_max = symbols.shape[0]
    k = beam_width
    out = np.zeros((batch_size, t_max), dtype=np.int64)
    ptr = (
        np.argmax(scores[-1].reshape(batch_size, k), axis=1)
        + np.arange(batch_size) * k
    )
    for t in range(t_max - 1, -1, -1):
        out[:, t] = symbols[t][ptr]
        ptr = predecessors[t][ptr]
    return out


def parse_aster_input(images: jnp.ndarray) -> jnp.ndarray:
    """``parse_aster_data`` (``interfaces/base.py:850-859``): x*2 - 1."""
    return images[:, :3] * 2.0 - 1.0
