"""YUV <-> RGB conversions for the ``--y_domain`` training path
(``interfaces/super_resolution.py:160-237``, kornia coefficients)."""

from __future__ import annotations

import jax.numpy as jnp


def yuv_to_rgb(image: jnp.ndarray) -> jnp.ndarray:
    """[*, 3, H, W] YUV in [0,1] -> RGB (``super_resolution.py:160-193``)."""
    y = image[..., 0, :, :]
    u = image[..., 1, :, :]
    v = image[..., 2, :, :]
    r = y + 1.14 * v
    g = y - 0.396 * u - 0.581 * v
    b = y + 2.029 * u
    return jnp.stack([r, g, b], axis=-3)


def rgb_to_yuv(image: jnp.ndarray) -> jnp.ndarray:
    """[*, 3, H, W] RGB -> YUV (``super_resolution.py:204-237``)."""
    r = image[..., 0, :, :]
    g = image[..., 1, :, :]
    b = image[..., 2, :, :]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.147 * r - 0.289 * g + 0.436 * b
    v = 0.615 * r - 0.515 * g - 0.100 * b
    return jnp.stack([y, u, v], axis=-3)
