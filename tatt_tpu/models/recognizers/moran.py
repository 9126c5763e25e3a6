"""MORAN recognizer — eval judge for ``--test_model=MORAN``.

Rebuilds ``model/moran/`` for the inference path the eval loop uses
(``interfaces/super_resolution.py:1351-1370,1446-1450``; fracPickup and the
teacher-forced branch are train-only and MORAN is never trained here):

  - ``MORN`` (``morn.py:6-141``): conv offset field over the bilinear
    32x100 resample; vertical offsets added to a fixed inclusive grid and
    applied with grid_sample.  At test time the reference runs one extra
    ``enhance`` refinement pass (``morn.py:46-51``: ``enhance=1`` unless
    training) — reproduced.
  - ``ASRN`` (``asrn_res.py:214-259``): 5-stage strided residual CNN ->
    2 BiLSTM(256) -> bidirectional attention decoders (L2R + R2L) with a
    GRUCell; eval decodes greedily for 20 steps.

Input adapter ``parse_moran_data`` (``interfaces/base.py:694-710``):
bicubic to 32x100 + BT.601 luma; decode alphabet '0..9a..z$', cut at '$'.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tatt_tpu.kernels.grid_sample import grid_sample_bilinear
from tatt_tpu.kernels.resize import resize_bilinear
from tatt_tpu.kernels.rnn import BiLSTM, gru_cell
from tatt_tpu.models.common import (
    BatchNorm2d,
    Conv2d,
    Dense,
    max_pool_nchw,
    torch_conv_init,
)

MORAN_ALPHABET = "0123456789abcdefghijklmnopqrstuvwxyz$"


def parse_moran_input(images: jnp.ndarray, width: int = 100) -> jnp.ndarray:
    from tatt_tpu.kernels.resize import resize_bicubic, rgb_to_luma

    x = resize_bicubic(images[:, :3], 32, width)
    return rgb_to_luma(x)


def decode_moran_ids(ids: np.ndarray, alphabet: str = MORAN_ALPHABET) -> list[str]:
    """ids: [B, T] 0-based class ids; chars cut at '$' (EOS), mirroring
    ``strLabelConverterForAttention.decode`` + ``pred.split('$')[0]``."""
    out = []
    for row in ids:
        s = "".join(alphabet[int(i)] for i in row)
        out.append(s.split("$")[0])
    return out


class MORNOffsetCNN(nn.Module):
    """The MORN offset-field conv tower (``morn.py:15-22``)."""

    @nn.compact
    def __call__(self, z: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        z = max_pool_nchw(z, (2, 2), (2, 2))
        z = Conv2d(64, (3, 3), padding=(1, 1), name="conv1")(z)
        z = jnp.maximum(BatchNorm2d(name="bn1")(z, train), 0.0)
        z = max_pool_nchw(z, (2, 2), (2, 2))
        z = Conv2d(128, (3, 3), padding=(1, 1), name="conv2")(z)
        z = jnp.maximum(BatchNorm2d(name="bn2")(z, train), 0.0)
        z = max_pool_nchw(z, (2, 2), (2, 2))
        z = Conv2d(64, (3, 3), padding=(1, 1), name="conv3")(z)
        z = jnp.maximum(BatchNorm2d(name="bn3")(z, train), 0.0)
        z = Conv2d(16, (3, 3), padding=(1, 1), name="conv4")(z)
        z = jnp.maximum(BatchNorm2d(name="bn4")(z, train), 0.0)
        z = Conv2d(1, (3, 3), padding=(1, 1), name="conv5")(z)
        return BatchNorm2d(name="bn5")(z, train)


class MORN(nn.Module):
    """Offset-grid rectifier; eval path with ``enhance`` refinements."""

    target_h: int = 32
    target_w: int = 100
    enhance: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        th, tw = self.target_h, self.target_w
        cnn = MORNOffsetCNN(name="offsets")

        def offsets_cnn(z, train):
            return cnn(z, train)

        n = x.shape[0]
        # fixed inclusive grid (morn.py:26-44)
        ys = jnp.arange(th) * 2.0 / (th - 1) - 1.0
        xs = jnp.arange(tw) * 2.0 / (tw - 1) - 1.0
        gx, gy = jnp.meshgrid(xs, ys)  # [th, tw]
        grid = jnp.stack([gx, gy], axis=-1)[None].astype(x.dtype)
        grid = jnp.broadcast_to(grid, (n, th, tw, 2))

        x_small = resize_bilinear(x, th, tw, align_corners=False)

        def rectify(src_offsets_input, offsets_grid_prev):
            off = offsets_cnn(src_offsets_input, train)
            off_pool = max_pool_nchw(jnp.maximum(off, 0.0), (2, 2), (1, 1)) - \
                max_pool_nchw(jnp.maximum(-off, 0.0), (2, 2), (1, 1))
            og = grid_sample_bilinear(off_pool, grid)  # [N,1,th,tw]
            og = og.transpose(0, 2, 3, 1)  # [N,th,tw,1]
            if offsets_grid_prev is not None:
                og = og + offsets_grid_prev
            warp = jnp.concatenate([grid[..., :1], grid[..., 1:] + og], axis=-1)
            return grid_sample_bilinear(x, warp), og

        x_rect, og = rectify(x_small, None)
        for _ in range(self.enhance):
            x_rect, og = rectify(x_rect, og)
        return x_rect


class MoranResidualBlock(nn.Module):
    c_out: int
    stride: tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        down = self.stride[0] > 1
        residual = x
        if down:
            conv1 = Conv2d(self.c_out, (3, 3), strides=self.stride, padding=(1, 1), name="conv1")(x)
            residual = Conv2d(
                self.c_out, (3, 3), strides=self.stride, padding=(1, 1), name="downsample_conv"
            )(x)
            residual = BatchNorm2d(name="downsample_bn")(residual, train)
        else:
            conv1 = Conv2d(self.c_out, (1, 1), padding=(0, 0), name="conv1")(x)
        conv1 = BatchNorm2d(name="bn1")(conv1, train)
        conv2 = Conv2d(self.c_out, (3, 3), padding=(1, 1), name="conv2")(conv1)
        conv2 = BatchNorm2d(name="bn2")(conv2, train)
        return jnp.maximum(residual + conv2, 0.0)


class MoranResNet(nn.Module):
    """``asrn_res.py:188-212``: [N,1,32,100] -> [N,512,1,25]."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = Conv2d(32, (3, 3), padding=(1, 1), name="block0_conv")(x)
        x = BatchNorm2d(name="block0_bn")(x, train)
        plan = [
            (32, (2, 2), 3),
            (64, (2, 2), 4),
            (128, (2, 1), 6),
            (256, (2, 1), 6),
            (512, (2, 1), 3),
        ]
        for li, (c, s, rep) in enumerate(plan, start=1):
            for bi in range(rep):
                x = MoranResidualBlock(
                    c, s if bi == 0 else (1, 1), name=f"block{li}_{bi}"
                )(x, train)
        return x


class MoranAttention(nn.Module):
    """Greedy eval decode of one direction (``asrn_res.py:127-155``)."""

    num_classes: int
    hidden: int = 256
    num_embeddings: int = 256
    num_steps: int = 20

    def setup(self):
        h, e = self.hidden, self.num_embeddings
        init = torch_conv_init(h)
        self.i2h_w = self.param("i2h_w", init, (h, h))  # input_size == hidden
        self.h2h_w = self.param("h2h_w", init, (h, h))
        self.h2h_b = self.param("h2h_b", init, (h,))
        self.score_w = self.param("score_w", init, (1, h))
        self.gru_w_ih = self.param("gru_w_ih", init, (3 * h, h + e))
        self.gru_w_hh = self.param("gru_w_hh", init, (3 * h, h))
        self.gru_b_ih = self.param("gru_b_ih", init, (3 * h,))
        self.gru_b_hh = self.param("gru_b_hh", init, (3 * h,))
        self.generator_w = self.param("generator_w", init, (self.num_classes, h))
        self.generator_b = self.param("generator_b", init, (self.num_classes,))
        self.char_embeddings = self.param(
            "char_embeddings",
            nn.initializers.normal(1.0),
            (self.num_classes + 1, e),
        )

    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        """``feats``: [T, B, C]; returns probs [B, num_steps, nclass]."""
        t, b, c = feats.shape
        dt = feats.dtype
        feats_proj = feats @ self.i2h_w.T.astype(dt)  # [T, B, H]

        def step(carry, _):
            hidden, tgt = carry
            hp = hidden @ self.h2h_w.T.astype(dt) + self.h2h_b.astype(dt)
            e = jnp.tanh(feats_proj + hp[None]) @ self.score_w[0].astype(dt)  # [T, B]
            alpha = jax.nn.softmax(e, axis=0)
            context = (feats * alpha[:, :, None]).sum(0)  # [B, C]
            emb = self.char_embeddings[tgt].astype(dt)
            gru_in = jnp.concatenate([context, emb], axis=1)
            hidden = gru_cell(
                gru_in, hidden, self.gru_w_ih, self.gru_w_hh, self.gru_b_ih, self.gru_b_hh
            )
            logits = hidden @ self.generator_w.T.astype(dt) + self.generator_b.astype(dt)
            tgt = jnp.argmax(logits, axis=1).astype(jnp.int32) + 1
            return (hidden, tgt), logits

        h0 = jnp.zeros((b, self.hidden), dt)
        t0 = jnp.zeros((b,), jnp.int32)
        _, logits = jax.lax.scan(step, (h0, t0), None, length=self.num_steps)
        return logits.transpose(1, 0, 2)  # [B, steps, nclass]


class MORAN(nn.Module):
    """MORN + ASRN, eval path; returns (probs_l2r, probs_r2l)."""

    num_classes: int = 37
    hidden: int = 256
    num_steps: int = 20

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        x = MORN(name="MORN")(x, train)
        feats = MoranResNet(name="cnn")(x, train)
        n, c, h, w = feats.shape
        seq = feats[:, :, 0, :].transpose(0, 2, 1)  # [B, W, C]
        seq = Dense(self.hidden, name="rnn0_embedding")(
            BiLSTM(hidden=self.hidden, name="rnn0")(seq)
        )
        seq = Dense(self.hidden, name="rnn1_embedding")(
            BiLSTM(hidden=self.hidden, name="rnn1")(seq)
        )
        feats_tbc = seq.transpose(1, 0, 2)  # [T, B, C]
        l2r = MoranAttention(
            self.num_classes, self.hidden, 256, self.num_steps, name="attentionL2R"
        )(feats_tbc)
        r2l = MoranAttention(
            self.num_classes, self.hidden, 256, self.num_steps, name="attentionR2L"
        )(feats_tbc)
        return l2r, r2l
