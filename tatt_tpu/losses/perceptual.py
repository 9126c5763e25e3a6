"""VGG16 perceptual loss + LPIPS-VGG metric.

Reference use:
  - ``GeneratorLoss`` = VGG16(:31)-feature MSE + image MSE + TV
    (``loss/percptual_loss.py:7-47``) — imported by ``interfaces/base.py:32``
    but not active in the TATT loss path.
  - LPIPS-VGG evaluated per batch at eval (``super_resolution.py:41-43,
    1415,1420``).

Pretrained VGG16/LPIPS weights are external inputs (torchvision /
lpips package checkpoints); importers below map their state dicts.  If no
weights are supplied the callers must skip these metrics (the eval loop
reports LPIPS only when weights are configured).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tatt_tpu.models.common import Conv2d, max_pool_nchw

# torchvision VGG16 conv plan: channels per conv, 'M' = maxpool
VGG16_PLAN = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"]
# conv layer indices (torchvision .features numbering) for LPIPS taps:
# relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
LPIPS_TAPS = (3, 8, 15, 22, 29)


class VGG16Features(nn.Module):
    """VGG16 ``.features`` tower returning activations after every ReLU,
    keyed by the torchvision layer index."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> dict[int, jnp.ndarray]:
        outs = {}
        idx = 0
        for spec in VGG16_PLAN:
            if spec == "M":
                x = max_pool_nchw(x, (2, 2), (2, 2))
                outs[idx] = x  # pool outputs land on their torchvision index
                idx += 1
                continue
            x = Conv2d(spec, (3, 3), padding=(1, 1), name=f"conv{idx}")(x)
            idx += 1
            x = jnp.maximum(x, 0.0)
            outs[idx] = x
            idx += 1
        return outs


def import_vgg16_features(sd) -> dict:
    """torchvision ``vgg16().features.state_dict()`` (keys ``N.weight``)
    -> flax params for :class:`VGG16Features`."""
    params = {}
    for key, value in sd.items():
        if key.endswith(".weight"):
            layer = int(key.split(".")[0])
            params[f"conv{layer}"] = {
                "kernel": np.asarray(value),
                "bias": np.asarray(sd[f"{layer}.bias"]),
            }
    return {"params": params}


def total_variation(x: jnp.ndarray) -> jnp.ndarray:
    """TV loss term as in ``percptual_loss.py:30-41``."""
    h = x.shape[2]
    w = x.shape[3]
    count_h = x[:, :, 1:, :].size / x.shape[0]
    count_w = x[:, :, :, 1:].size / x.shape[0]
    h_tv = ((x[:, :, 1:, :] - x[:, :, : h - 1, :]) ** 2).sum()
    w_tv = ((x[:, :, :, 1:] - x[:, :, :, : w - 1]) ** 2).sum()
    return 2.0 * (h_tv / count_h + w_tv / count_w) / x.shape[0]


def generator_loss(
    vgg_variables,
    out_images: jnp.ndarray,
    target_images: jnp.ndarray,
    tap: int = 31,
) -> jnp.ndarray:
    """``GeneratorLoss`` (``percptual_loss.py:7-29``): image MSE +
    0.006 * VGG-feature MSE + 2e-8 * TV."""
    vgg = VGG16Features()
    f_out = vgg.apply(vgg_variables, out_images[:, :3])
    f_tgt = vgg.apply(vgg_variables, target_images[:, :3])
    # the reference network is ``features[:31]`` (``percptual_loss.py:13``)
    # — slice semantics: last layer is index 30, the pool5 maxpool
    key = max(k for k in f_out if k < tap)
    perception = ((f_out[key] - f_tgt[key]) ** 2).mean()
    image_loss_term = ((out_images - target_images) ** 2).mean()
    tv = total_variation(out_images)
    return image_loss_term + 0.006 * perception + 2e-8 * tv


# ----------------------------------------------------------------- LPIPS
_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def import_lpips(vgg16_path_or_sd, lpips_path_or_sd):
    """Load the two external checkpoints behind ``lpips.LPIPS(net='vgg')``
    (reference ``super_resolution.py:41-43``): the torchvision VGG16
    backbone and the lpips linear heads.

    Returns ``(vgg_variables, lin_weights)`` for :func:`lpips_vgg`."""
    from tatt_tpu.core.torch_import import load_state_dict

    vgg_sd = (
        load_state_dict(vgg16_path_or_sd)
        if isinstance(vgg16_path_or_sd, str)
        else vgg16_path_or_sd
    )
    feats = {
        k[len("features."):]: v
        for k, v in vgg_sd.items()
        if k.startswith("features.")
    } or vgg_sd  # accept a features-only state dict too
    vgg_variables = import_vgg16_features(feats)

    lp_sd = (
        load_state_dict(lpips_path_or_sd)
        if isinstance(lpips_path_or_sd, str)
        else lpips_path_or_sd
    )
    lin_weights = [
        np.asarray(lp_sd[f"lin{i}.model.1.weight"]).reshape(-1)
        for i in range(5)
    ]
    return vgg_variables, lin_weights


def lpips_vgg(
    vgg_variables,
    lin_weights: Sequence[np.ndarray],
    img0: jnp.ndarray,
    img1: jnp.ndarray,
) -> jnp.ndarray:
    """LPIPS(VGG) distance per sample.

    ``lin_weights``: the 5 [C] linear-head weights from the lpips package
    (``lin{i}.model.1.weight`` squeezed).  Inputs in [0, 1] (the reference
    feeds [0,1]; lpips rescales internally via shift/scale after x2-1)."""
    x0 = img0[:, :3] * 2.0 - 1.0
    x1 = img1[:, :3] * 2.0 - 1.0
    shift = jnp.asarray(_LPIPS_SHIFT)[None, :, None, None]
    scale = jnp.asarray(_LPIPS_SCALE)[None, :, None, None]
    x0 = (x0 - shift) / scale
    x1 = (x1 - shift) / scale
    vgg = VGG16Features()
    f0 = vgg.apply(vgg_variables, x0)
    f1 = vgg.apply(vgg_variables, x1)
    total = 0.0
    for tap, w in zip(LPIPS_TAPS, lin_weights):
        a = f0[tap]
        b = f1[tap]
        a = a / (jnp.sqrt((a**2).sum(1, keepdims=True)) + 1e-10)
        b = b / (jnp.sqrt((b**2).sum(1, keepdims=True)) + 1e-10)
        diff = (a - b) ** 2
        wj = jnp.asarray(np.asarray(w).reshape(1, -1, 1, 1), diff.dtype)
        total = total + (diff * wj).sum(1, keepdims=True).mean(axis=(1, 2, 3))
    return total
