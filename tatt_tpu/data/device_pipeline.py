"""Device-side batch normalization — the uint8 fast path.

The reference does all image prep in DataLoader workers (``resizeNormalize``,
``dataset/dataset.py:1266-1319``): float conversion, layout, and the mask
channel on the host, shipping float32 tensors.  On TPU that wastes the two
scarce host resources — CPU cycles (this box has ONE vCPU feeding a chip
that consumes ~2.3k img/s) and H2D bandwidth (f32 is 4x the bytes of the
decoded uint8).  The fast path ships stacked uint8 NHWC crops and runs the
arithmetic inside the jitted train/eval step, where XLA fuses the u8->f32
convert + transpose + mask build into the first conv's input processing.

Numerics: the mask channel uses PIL's exact fixed-point luma
((r*19595 + g*38470 + b*7471 + 0x8000) >> 16 — integer math, bit-equal to
the host path); the f32 division by 255 is the same operation in both
paths.  The only tolerance is the grayscale mean's summation order at the
threshold comparison (ties may round differently), covered by the
equivalence test.
"""

from __future__ import annotations

import jax.numpy as jnp


def device_normalize(u8_nhwc: jnp.ndarray, mask: bool) -> jnp.ndarray:
    """[B, H, W, 3] uint8 -> [B, C, H, W] float32 in [0, 1] (+ mask ch).

    The device twin of ``collate.batch_normalize`` (which itself mirrors
    ``resizeNormalize``, ``dataset.py:1266-1319``)."""
    x = u8_nhwc.astype(jnp.float32) / 255.0
    out = x.transpose(0, 3, 1, 2)  # NCHW module boundary
    if not mask:
        return out
    u = u8_nhwc.astype(jnp.uint32)
    luma = (
        u[..., 0] * 19595 + u[..., 1] * 38470 + u[..., 2] * 7471 + 0x8000
    ) >> 16  # PIL convert('L') fixed point, exact
    gray = luma.astype(jnp.float32)
    thres = gray.mean(axis=(1, 2), keepdims=True)
    m = (gray <= thres).astype(jnp.float32)
    return jnp.concatenate([out, m[:, None]], axis=1)


def host_normalize_u8(u8_nhwc, mask: bool):
    """Numpy twin of :func:`device_normalize` for host-side consumers
    (eval metrics on ground-truth HR, visualization) when a raw batch is
    in play.  Same fixed-point luma, same threshold rule."""
    import numpy as np

    x = u8_nhwc.astype(np.float32) / 255.0
    out = x.transpose(0, 3, 1, 2)
    if not mask:
        return out
    u = u8_nhwc.astype(np.uint32)
    luma = (
        u[..., 0] * 19595 + u[..., 1] * 38470 + u[..., 2] * 7471 + 0x8000
    ) >> 16
    gray = luma.astype(np.float32)
    thres = gray.mean(axis=(1, 2), keepdims=True)
    m = (gray <= thres).astype(np.float32)
    return np.concatenate([out, m[:, None]], axis=1)


def prep_image_batch(batch: dict, mask: bool) -> dict:
    """Normalize any uint8 image leaves in a batch dict on device; float
    leaves (host-collated) pass through untouched.  Called at the top of
    the jitted train/eval steps, so the uint8 and float paths compile to
    the same downstream graph."""
    out = dict(batch)
    for key in ("images_hr", "images_lr", "images_pseudo_lr"):
        v = out.get(key)
        if v is not None and v.dtype == jnp.uint8:
            out[key] = device_normalize(v, mask)
    return out
