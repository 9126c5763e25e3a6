"""CRNN recognizer — text-prior generator (TPG) and default eval judge.

Rebuilds ``model/crnn/crnn.py:29-92``: 7-layer VGG-style CNN whose pools
collapse H 32 -> 1 and map W 100 -> 26, followed by two BiLSTM(256) heads
emitting [T=26, B, 37] CTC logits over ``-0123456789a..z``.

The input adapter (``parse_crnn_data``, ``interfaces/base.py:797-815``)
is :func:`parse_crnn_input`: bicubic resize to 32x100 + BT.601 luma.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from tatt_tpu.kernels.resize import resize_bicubic, rgb_to_luma
from tatt_tpu.kernels.rnn import BiLSTM
from tatt_tpu.models.common import BatchNorm2d, Conv2d, Dense, max_pool_nhwc


def parse_crnn_input(images: jnp.ndarray, width: int = 100) -> jnp.ndarray:
    """[N, >=3, H, W] RGB (first 3 channels) -> [N, 1, 32, width] luma."""
    x = resize_bicubic(images[:, :3], 32, width)
    return rgb_to_luma(x)


class BidirectionalLSTM(nn.Module):
    """BiLSTM + linear head (``model/crnn/crnn.py:5-26``). [B,T,C] layout."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = BiLSTM(hidden=self.hidden, name="rnn")(x)
        return Dense(self.out, name="embedding")(y)


class CRNN(nn.Module):
    """Returns [T, B, nclass] logits like the reference module.

    ``nm`` follows the reference channel plan [64,128,256,256,512,512,512]
    (``crnn.py:38``); smaller values are used only by tests.
    """

    nclass: int = 37
    nh: int = 256
    nm: tuple[int, ...] = (64, 128, 256, 256, 512, 512, 512)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        nm = self.nm
        # NHWC trunk (NCHW I/O): the [B, T, C] sequence view at the conv ->
        # BiLSTM seam is then a pure reshape of the feature-minor layout.
        x = x.transpose(0, 2, 3, 1)
        x = Conv2d(nm[0], (3, 3), padding=(1, 1), data_format="NHWC", name="conv0")(x)
        x = jnp.maximum(x, 0.0)
        x = max_pool_nhwc(x, (2, 2), (2, 2))
        x = Conv2d(nm[1], (3, 3), padding=(1, 1), data_format="NHWC", name="conv1")(x)
        x = jnp.maximum(x, 0.0)
        x = max_pool_nhwc(x, (2, 2), (2, 2))
        x = Conv2d(nm[2], (3, 3), padding=(1, 1), data_format="NHWC", name="conv2")(x)
        x = BatchNorm2d(data_format="NHWC", name="batchnorm2")(x, train)
        x = jnp.maximum(x, 0.0)
        x = Conv2d(nm[3], (3, 3), padding=(1, 1), data_format="NHWC", name="conv3")(x)
        x = jnp.maximum(x, 0.0)
        x = max_pool_nhwc(x, (2, 2), (2, 1), (0, 1))
        x = Conv2d(nm[4], (3, 3), padding=(1, 1), data_format="NHWC", name="conv4")(x)
        x = BatchNorm2d(data_format="NHWC", name="batchnorm4")(x, train)
        x = jnp.maximum(x, 0.0)
        x = Conv2d(nm[5], (3, 3), padding=(1, 1), data_format="NHWC", name="conv5")(x)
        x = jnp.maximum(x, 0.0)
        x = max_pool_nhwc(x, (2, 2), (2, 1), (0, 1))
        x = Conv2d(nm[6], (2, 2), padding=(0, 0), data_format="NHWC", name="conv6")(x)
        x = BatchNorm2d(data_format="NHWC", name="batchnorm6")(x, train)
        x = jnp.maximum(x, 0.0)

        n, h, w, c = x.shape
        assert h == 1, f"conv tower must collapse height to 1, got {h}"
        seq = x[:, 0, :, :]  # [B, T, 512] — free view in NHWC
        seq = BidirectionalLSTM(self.nh, self.nh, name="rnn0")(seq)
        seq = BidirectionalLSTM(self.nh, self.nclass, name="rnn1")(seq)
        return seq.transpose(1, 0, 2)  # [T, B, nclass]
