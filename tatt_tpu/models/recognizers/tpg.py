"""TPG recognizer for the Chinese path — the NAVER deep-text-recognition
"Model" (``model/crnn/model.py`` + ``modules/``).

The reference's shipped ``opt_TPG`` (``main.py:127-144``) uses
Transformation='None', FeatureExtraction='ResNet' (FAN ResNet with block
plan [1, 2, 5, 3]), SequenceModeling='None', Prediction='CTC', so this
module implements that pipeline (with the optional BiLSTM stage for the
'BiLSTM' configuration).  Input adapter: ``parse_OPT_data``
(``interfaces/base.py:817-835``) — bicubic to 32x512 luma.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from tatt_tpu.kernels.resize import resize_bicubic, rgb_to_luma
from tatt_tpu.kernels.rnn import BiLSTM
from tatt_tpu.models.common import BatchNorm2d, Conv2d, Dense, max_pool_nchw


def parse_opt_input(images: jnp.ndarray, width: int = 512) -> jnp.ndarray:
    """[N, >=3, H, W] -> [N, 1, 32, width] luma (``base.py:817-835``)."""
    x = resize_bicubic(images[:, :3], 32, width)
    return rgb_to_luma(x)


class FanBasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        residual = x
        out = Conv2d(self.planes, (3, 3), strides=(self.stride,) * 2,
                     padding=(1, 1), use_bias=False, name="conv1")(x)
        out = BatchNorm2d(name="bn1")(out, train)
        out = jnp.maximum(out, 0.0)
        out = Conv2d(self.planes, (3, 3), padding=(1, 1), use_bias=False, name="conv2")(out)
        out = BatchNorm2d(name="bn2")(out, train)
        if self.downsample:
            residual = Conv2d(self.planes, (1, 1), strides=(self.stride,) * 2,
                              padding=(0, 0), use_bias=False, name="downsample_conv")(x)
            residual = BatchNorm2d(name="downsample_bn")(residual, train)
        return jnp.maximum(out + residual, 0.0)


class FanResNet(nn.Module):
    """``modules/feature_extraction.py:153-246`` with layers [1, 2, 5, 3].
    [N,1,32,W] -> [N, C=512, 1, W/4 + 1]."""

    output_channel: int = 512
    layers: tuple[int, ...] = (1, 2, 5, 3)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        oc = self.output_channel
        blocks_ch = [oc // 4, oc // 2, oc, oc]

        def conv_bn_relu(z, ch, name, kernel=(3, 3), stride=(1, 1), pad=(1, 1)):
            z = Conv2d(ch, kernel, strides=stride, padding=pad, use_bias=False,
                       name=f"{name}_conv")(z)
            z = BatchNorm2d(name=f"{name}_bn")(z, train)
            return jnp.maximum(z, 0.0)

        x = conv_bn_relu(x, oc // 16, "conv0_1")
        x = conv_bn_relu(x, oc // 8, "conv0_2")
        inplanes = oc // 8

        def make_layer(z, planes, n_blocks, prefix):
            nonlocal inplanes
            for b in range(n_blocks):
                down = b == 0 and inplanes != planes
                z = FanBasicBlock(planes, 1, down, name=f"{prefix}_{b}")(z, train)
                inplanes = planes
            return z

        x = max_pool_nchw(x, (2, 2), (2, 2))
        x = make_layer(x, blocks_ch[0], self.layers[0], "layer1")
        x = conv_bn_relu(x, blocks_ch[0], "conv1")
        x = max_pool_nchw(x, (2, 2), (2, 2))
        x = make_layer(x, blocks_ch[1], self.layers[1], "layer2")
        x = conv_bn_relu(x, blocks_ch[1], "conv2")
        x = max_pool_nchw(x, (2, 2), (2, 1), (0, 1))
        x = make_layer(x, blocks_ch[2], self.layers[2], "layer3")
        x = conv_bn_relu(x, blocks_ch[2], "conv3")
        x = make_layer(x, blocks_ch[3], self.layers[3], "layer4")
        x = conv_bn_relu(x, blocks_ch[3], "conv4_1", kernel=(2, 2), stride=(2, 1), pad=(0, 1))
        x = conv_bn_relu(x, blocks_ch[3], "conv4_2", kernel=(2, 2), stride=(1, 1), pad=(0, 0))
        return x


class TPGModel(nn.Module):
    """NAVER pipeline: [feature -> (BiLSTM) -> CTC linear], returning
    [T, B, num_class] logits like the reference Model.forward."""

    num_class: int = 37
    hidden_size: int = 256
    sequence_modeling: str = "None"  # "None" | "BiLSTM"
    output_channel: int = 512

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        feat = FanResNet(self.output_channel, name="FeatureExtraction")(x, train)
        # AdaptiveAvgPool2d((None, 1)) on [b,c,h,w]->[b,w,c,h]: mean over h
        seq = feat.mean(axis=2).transpose(0, 2, 1)  # [B, W, C]
        if self.sequence_modeling == "BiLSTM":
            seq = Dense(self.hidden_size, name="seq0_embedding")(
                BiLSTM(hidden=self.hidden_size, name="seq0")(seq)
            )
            seq = Dense(self.hidden_size, name="seq1_embedding")(
                BiLSTM(hidden=self.hidden_size, name="seq1")(seq)
            )
        logits = Dense(self.num_class, name="Prediction")(seq)
        return logits.transpose(1, 0, 2)  # [T, B, C]
