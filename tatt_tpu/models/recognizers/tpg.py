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

import jax
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


class VGGFeatureExtractor(nn.Module):
    """CRNN-style VGG tower (``modules/feature_extraction.py:5-28``):
    [N,1,32,W] -> [N, C, 1, W/4 - 1]."""

    output_channel: int = 512

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        oc = [self.output_channel // 8, self.output_channel // 4,
              self.output_channel // 2, self.output_channel]
        x = jnp.maximum(Conv2d(oc[0], (3, 3), padding=(1, 1), name="conv0")(x), 0.0)
        x = max_pool_nchw(x, (2, 2), (2, 2))
        x = jnp.maximum(Conv2d(oc[1], (3, 3), padding=(1, 1), name="conv1")(x), 0.0)
        x = max_pool_nchw(x, (2, 2), (2, 2))
        x = jnp.maximum(Conv2d(oc[2], (3, 3), padding=(1, 1), name="conv2")(x), 0.0)
        x = jnp.maximum(Conv2d(oc[2], (3, 3), padding=(1, 1), name="conv3")(x), 0.0)
        x = max_pool_nchw(x, (2, 1), (2, 1))
        x = Conv2d(oc[3], (3, 3), padding=(1, 1), use_bias=False, name="conv4")(x)
        x = jnp.maximum(BatchNorm2d(name="bn4")(x, train), 0.0)
        x = Conv2d(oc[3], (3, 3), padding=(1, 1), use_bias=False, name="conv5")(x)
        x = jnp.maximum(BatchNorm2d(name="bn5")(x, train), 0.0)
        x = max_pool_nchw(x, (2, 1), (2, 1))
        return jnp.maximum(
            Conv2d(oc[3], (2, 2), padding=(0, 0), name="conv6")(x), 0.0
        )


class GRCL(nn.Module):
    """Gated recurrent conv layer (``modules/feature_extraction.py:66-119``)."""

    output_channel: int
    num_iteration: int = 5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        oc = self.output_channel
        wgf_u = Conv2d(oc, (1, 1), padding=(0, 0), use_bias=False, name="wgf_u")(x)
        wf_u = Conv2d(oc, (3, 3), padding=(1, 1), use_bias=False, name="wf_u")(x)
        h = jnp.maximum(BatchNorm2d(name="bn_x_init")(wf_u, train), 0.0)
        for i in range(self.num_iteration):
            g1 = BatchNorm2d(name=f"bn_gfu_{i}")(wgf_u, train)
            g2 = BatchNorm2d(name=f"bn_grx_{i}")(
                Conv2d(oc, (1, 1), padding=(0, 0), use_bias=False,
                       name=f"wgr_x_{i}")(h), train
            )
            gate = jax.nn.sigmoid(g1 + g2)
            f1 = BatchNorm2d(name=f"bn_fu_{i}")(wf_u, train)
            f2 = BatchNorm2d(name=f"bn_gx_{i}")(
                Conv2d(oc, (3, 3), padding=(1, 1), use_bias=False,
                       name=f"wr_x_{i}")(h), train
            )
            h = jnp.maximum(f1 + BatchNorm2d(name=f"bn_gated_{i}")(f2 * gate, train), 0.0)
        return h


class RCNNFeatureExtractor(nn.Module):
    """GRCNN tower (``modules/feature_extraction.py:31-52``)."""

    output_channel: int = 512

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        oc = [self.output_channel // 8, self.output_channel // 4,
              self.output_channel // 2, self.output_channel]
        x = jnp.maximum(Conv2d(oc[0], (3, 3), padding=(1, 1), name="conv0")(x), 0.0)
        x = max_pool_nchw(x, (2, 2), (2, 2))
        x = GRCL(oc[0], name="grcl0")(x, train)
        x = max_pool_nchw(x, (2, 2), (2, 2))
        x = GRCL(oc[1], name="grcl1")(x, train)
        x = max_pool_nchw(x, (2, 2), (2, 1), (0, 1))
        x = GRCL(oc[2], name="grcl2")(x, train)
        x = max_pool_nchw(x, (2, 2), (2, 1), (0, 1))
        x = Conv2d(oc[3], (2, 2), padding=(0, 0), use_bias=False, name="conv1")(x)
        return jnp.maximum(BatchNorm2d(name="bn1")(x, train), 0.0)


class AttentionHead(nn.Module):
    """Attn prediction head (``modules/prediction.py:6-58``): LSTM decoder
    with additive attention over encoder steps; teacher-forced when
    ``text`` is given, greedy otherwise."""

    hidden_size: int = 256
    num_classes: int = 38

    @nn.compact
    def __call__(
        self,
        batch_h: jnp.ndarray,  # [B, T_enc, C]
        text: jnp.ndarray | None = None,  # [B, max_len+1] int ids ([GO]=0 first)
        batch_max_length: int = 25,
    ) -> jnp.ndarray:
        i2h = Dense(self.hidden_size, use_bias=False, name="i2h")
        h2h = Dense(self.hidden_size, name="h2h")
        score = Dense(1, use_bias=False, name="score")
        cell = nn.LSTMCell(self.hidden_size, name="rnn")
        generator = Dense(self.num_classes, name="generator")

        b = batch_h.shape[0]
        num_steps = batch_max_length + 1
        carry = (
            jnp.zeros((b, self.hidden_size), batch_h.dtype),
            jnp.zeros((b, self.hidden_size), batch_h.dtype),
        )
        h_proj = i2h(batch_h)

        def attend(carry, onehots):
            e = score(jnp.tanh(h_proj + h2h(carry[1])[:, None]))
            alpha = jax.nn.softmax(e, axis=1)
            context = (alpha * batch_h).sum(axis=1)
            return cell(carry, jnp.concatenate([context, onehots], axis=-1))

        probs = []
        targets = jnp.zeros((b,), jnp.int32)  # [GO]
        for i in range(num_steps):
            ids = text[:, i] if text is not None else targets
            onehots = jax.nn.one_hot(ids, self.num_classes, dtype=batch_h.dtype)
            carry, out = attend(carry, onehots)
            step_logits = generator(out)
            probs.append(step_logits)
            if text is None:
                targets = jnp.argmax(step_logits, axis=-1)
        return jnp.stack(probs, axis=1)  # [B, num_steps, num_classes]


class TPGModel(nn.Module):
    """NAVER pipeline: [feature -> (BiLSTM) -> CTC linear | Attn],
    returning [T, B, num_class] logits like the reference Model.forward
    (``model/crnn/model.py:27-95``)."""

    num_class: int = 37
    hidden_size: int = 256
    feature_extraction: str = "ResNet"  # "ResNet" | "VGG" | "RCNN"
    sequence_modeling: str = "None"  # "None" | "BiLSTM"
    prediction: str = "CTC"  # "CTC" | "Attn"
    output_channel: int = 512

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        text: jnp.ndarray | None = None,
        batch_max_length: int = 25,
    ) -> jnp.ndarray:
        if self.feature_extraction == "VGG":
            feat = VGGFeatureExtractor(
                self.output_channel, name="FeatureExtraction"
            )(x, train)
        elif self.feature_extraction == "RCNN":
            feat = RCNNFeatureExtractor(
                self.output_channel, name="FeatureExtraction"
            )(x, train)
        else:
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
        if self.prediction == "Attn":
            probs = AttentionHead(
                self.hidden_size, self.num_class, name="Prediction"
            )(seq, text=text if train else None, batch_max_length=batch_max_length)
            return probs.transpose(1, 0, 2)  # [T, B, C]
        logits = Dense(self.num_class, name="Prediction")(seq)
        return logits.transpose(1, 0, 2)  # [T, B, C]
