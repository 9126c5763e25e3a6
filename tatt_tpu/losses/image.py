"""Image reconstruction losses.

``image_loss(...)`` mirrors ``loss/image_loss.py:10-57``: per-sample MSE
plus a weighted L1 between central-difference gradient-magnitude maps of
the RGB channels.  Constructed with ``loss_weight=[1, 1e-4]`` for every TL
arch (``interfaces/base.py:265,298``); the train loop multiplies the mean
by 100 (``interfaces/super_resolution.py:894``).
"""

from __future__ import annotations

import jax.numpy as jnp


def gradient_map(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt(((r-l)/2)^2 + ((t-b)/2)^2 + 1e-6) with zero-padded shifts
    (``loss/image_loss.py:50-58``)."""
    w = x.shape[-1]
    h = x.shape[-2]
    r = jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, 1),))[..., :, 1:]
    l = jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((1, 0),))[..., :, :w]
    t = jnp.pad(x, ((0, 0),) * (x.ndim - 2) + ((1, 0), (0, 0)))[..., :h, :]
    b = jnp.pad(x, ((0, 0),) * (x.ndim - 2) + ((0, 1), (0, 0)))[..., 1:, :]
    return jnp.sqrt(((r - l) * 0.5) ** 2 + ((t - b) * 0.5) ** 2 + 1e-6)


def gradient_prior_loss(out_images: jnp.ndarray, target_images: jnp.ndarray) -> jnp.ndarray:
    """Per-sample L1 between gradient maps -> [N]."""
    diff = jnp.abs(gradient_map(out_images) - gradient_map(target_images))
    return diff.mean(axis=(1, 2, 3))


def mse_loss(out_images: jnp.ndarray, target_images: jnp.ndarray) -> jnp.ndarray:
    """Per-sample MSE [N] (``nn.MSELoss`` with late .mean())."""
    return ((out_images - target_images) ** 2).mean(axis=(1, 2, 3))


def l1_loss(out_images: jnp.ndarray, target_images: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(out_images - target_images).mean(axis=(1, 2, 3))


def charbonnier_loss(
    out_images: jnp.ndarray, target_images: jnp.ndarray, eps: float = 1e-6
) -> jnp.ndarray:
    """L1-Charbonnier (``model/lapsrn.py:126-137``; the reference sums, we
    keep per-sample means so the x100 train weighting stays comparable)."""
    diff = out_images - target_images
    return jnp.sqrt(diff * diff + eps).mean(axis=(1, 2, 3))


def _sobel_map(x: jnp.ndarray) -> jnp.ndarray:
    """Sobel edge magnitude over RGB (``loss/image_loss.py:88-126``)."""
    import jax

    kh = jnp.asarray(
        [[-1.0, -2.0, -1.0], [0.0, 0.0, 0.0], [1.0, 2.0, 1.0]], x.dtype
    )
    kv = jnp.asarray(
        [[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]], x.dtype
    )
    c = x.shape[1]

    def conv(img, k):
        kernel = jnp.broadcast_to(k[None, None], (c, c, 3, 3))
        return jax.lax.conv_general_dilated(
            img,
            kernel,
            (1, 1),
            [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )

    h = conv(x, kh)
    v = conv(x, kv)
    return jnp.sqrt((h * 0.5) ** 2 + (v * 0.5) ** 2 + 1e-6)


def edge_image_loss(
    out_images: jnp.ndarray,
    target_images: jnp.ndarray,
    loss_weight: tuple[float, float] = (20.0, 1e-4),
) -> jnp.ndarray:
    """``EdgeImageLoss`` (``loss/image_loss.py:61-80``): w0*MSE +
    w1*0.1*L1(sobel maps); scalar in the reference — returned per-sample."""
    mse = mse_loss(out_images, target_images)
    edge = jnp.abs(
        _sobel_map(out_images[:, :3]) - _sobel_map(target_images[:, :3])
    ).mean(axis=(1, 2, 3))
    return loss_weight[0] * mse + loss_weight[1] * edge * 0.1


def image_loss(
    out_images: jnp.ndarray,
    target_images: jnp.ndarray,
    gradient: bool = True,
    loss_weight: tuple[float, float] = (1.0, 1e-4),
) -> jnp.ndarray:
    """Per-sample loss vector [N] (reduction happens in the train step so
    ``--training_stablize`` top-k clamping can apply first, mirroring
    ``loss_stablizing``, ``interfaces/super_resolution.py:84-93``)."""
    mse = ((out_images - target_images) ** 2).mean(axis=(1, 2, 3))
    loss = loss_weight[0] * mse
    if gradient:
        loss = loss + loss_weight[1] * gradient_prior_loss(
            out_images[:, :3], target_images[:, :3]
        )
    return loss
