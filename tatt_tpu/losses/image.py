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
