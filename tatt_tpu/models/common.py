"""Shared model building blocks (flax.linen).

Conventions:
  - Layout is NCHW at module boundaries to mirror the reference's tensor
    contracts exactly (shapes in docstrings cite the reference); XLA on TPU
    re-lays out internally, so this costs nothing after compilation.
  - BatchNorm carries batch stats in a ``batch_stats`` collection; training
    dynamics match per-replica torch BN (no cross-device sync), which is
    what ``DataParallel`` gives the reference (SURVEY §7 "BN semantics").
  - Initializers mirror torch defaults (kaiming-uniform conv kernels,
    uniform fan-in bias) so training starts from the same distribution.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def mish(x: jnp.ndarray) -> jnp.ndarray:
    """x * tanh(softplus(x)) — reference ``model/tsrn.py:1056-1064``."""
    return x * jnp.tanh(jax.nn.softplus(x))


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """NCHW PixelShuffle (reference uses ``nn.PixelShuffle`` in
    ``UpsampleBLock``, ``model/tsrn.py:1045``): [N, C*r^2, H, W] ->
    [N, C, H*r, W*r].  Pure reshape/transpose — XLA-native."""
    n, c, h, w = x.shape
    oc = c // (r * r)
    x = x.reshape(n, oc, r, r, h, w)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, oc, h * r, w * r)


def torch_conv_init(fan_in: int):
    """Torch Conv2d default init: kaiming_uniform(a=sqrt(5)) == U(-b, b)
    with b = 1/sqrt(fan_in); bias likewise."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv2d(nn.Module):
    """NCHW conv with torch-default initialization and 'same'-style
    explicit padding."""

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (1, 1)
    use_bias: bool = True
    feature_group_count: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[1]
        kh, kw = self.kernel_size
        fan_in = in_ch // self.feature_group_count * kh * kw
        kernel = self.param(
            "kernel",
            torch_conv_init(fan_in),
            (self.features, in_ch // self.feature_group_count, kh, kw),
        )
        dt = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dt),
            kernel.astype(dt),
            window_strides=self.strides,
            padding=[(self.padding[0],) * 2, (self.padding[1],) * 2],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=self.feature_group_count,
        )
        if self.use_bias:
            bias = self.param("bias", torch_conv_init(fan_in), (self.features,))
            y = y + bias.astype(dt)[None, :, None, None]
        return y


class ConvTranspose2d(nn.Module):
    """NCHW transposed conv matching torch ``nn.ConvTranspose2d`` geometry
    (used by InfoGen, reference ``model/tsrn.py:284-317``)."""

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (2, 2)
    padding: tuple[int, int] = (0, 0)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[1]
        kh, kw = self.kernel_size
        # torch ConvTranspose2d fan_in = out_channels * kh * kw
        fan_in = self.features * kh * kw
        kernel = self.param(
            "kernel",
            torch_conv_init(fan_in),
            (in_ch, self.features, kh, kw),  # torch IOHW layout
        )
        # transposed conv = lhs-dilated conv with flipped kernel
        sh, sw = self.strides
        ph, pw = self.padding
        y = jax.lax.conv_general_dilated(
            x,
            jnp.flip(kernel, axis=(2, 3)).transpose(1, 0, 2, 3),
            window_strides=(1, 1),
            padding=[(kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw)],
            lhs_dilation=(sh, sw),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        if self.use_bias:
            bias = self.param("bias", torch_conv_init(fan_in), (self.features,))
            y = y + bias[None, :, None, None]
        return y


class BatchNorm2d(nn.Module):
    """NCHW BatchNorm over (N, H, W), torch eps/momentum defaults.

    ``copies > 1``: the batch axis packs ``copies`` independent logical
    batches of equal size (the fused-tssim 2B forward concatenates the main
    and counter-rotated copies).  Batch statistics are then computed
    PER-COPY — each copy is normalized exactly as it would be by its own
    separate forward, and the running averages fold the per-copy stats
    sequentially in concat order, matching the reference's two consecutive
    forwards (``super_resolution.py:873,910-914``)."""

    momentum: float = 0.9  # = 1 - torch momentum(0.1)
    epsilon: float = 1e-5
    copies: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        c = x.shape[1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if train:
            x32 = x.astype(jnp.float32)
            if self.copies > 1:
                k = self.copies
                nb = x.shape[0] // k
                assert nb * k == x.shape[0], (
                    f"batch {x.shape[0]} not divisible by copies={k}"
                )
                xg = x32.reshape(k, nb, c, x.shape[2], x.shape[3])
                mean_g = xg.mean(axis=(1, 3, 4))  # [k, C]
                var_g = xg.var(axis=(1, 3, 4))  # [k, C]
                if not self.is_initializing():
                    n = nb * x.shape[2] * x.shape[3]
                    unb = var_g * n / max(n - 1, 1)
                    rm, rv = ra_mean.value, ra_var.value
                    for i in range(k):
                        rm = self.momentum * rm + (1 - self.momentum) * mean_g[i]
                        rv = self.momentum * rv + (1 - self.momentum) * unb[i]
                    ra_mean.value, ra_var.value = rm, rv
                # broadcast per-copy stats over the packed batch and
                # normalize in the original [2B, C, H, W] layout.  (Doing
                # the elementwise on the reshaped [k, nb, ...] view instead
                # measured 12% SLOWER end-to-end on v5e: the reshape forces
                # relayouts through every BN's fwd+bwd.)
                mean = jnp.repeat(mean_g, nb, axis=0)[:, :, None, None]
                var = jnp.repeat(var_g, nb, axis=0)[:, :, None, None]
                inv = jax.lax.rsqrt(var + self.epsilon) * scale[None, :, None, None]
                return (x - mean.astype(x.dtype)) * inv.astype(x.dtype) + bias[
                    None, :, None, None
                ].astype(x.dtype)
            mean = x32.mean(axis=(0, 2, 3))
            var = x32.var(axis=(0, 2, 3))
            if not self.is_initializing():
                n = x.shape[0] * x.shape[2] * x.shape[3]
                unbiased = var * n / max(n - 1, 1)
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * unbiased
                )
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x - mean[None, :, None, None].astype(x.dtype)) * inv[
            None, :, None, None
        ].astype(x.dtype) + bias[None, :, None, None].astype(x.dtype)
        return y


class BatchNorm1d(nn.Module):
    """BatchNorm over the batch dim of [N, C] (STN head fc,
    ``model/stn_head.py:51``).  ``copies``: see BatchNorm2d."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    copies: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        c = x.shape[1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if train:
            x32 = x.astype(jnp.float32)
            if self.copies > 1:
                k = self.copies
                nb = x.shape[0] // k
                assert nb * k == x.shape[0], (
                    f"batch {x.shape[0]} not divisible by copies={k}"
                )
                xg = x32.reshape(k, nb, c)
                mean_g, var_g = xg.mean(axis=1), xg.var(axis=1)
                if not self.is_initializing():
                    unb = var_g * nb / max(nb - 1, 1)
                    rm, rv = ra_mean.value, ra_var.value
                    for i in range(k):
                        rm = self.momentum * rm + (1 - self.momentum) * mean_g[i]
                        rv = self.momentum * rv + (1 - self.momentum) * unb[i]
                    ra_mean.value, ra_var.value = rm, rv
                mean = jnp.repeat(mean_g, nb, axis=0)
                var = jnp.repeat(var_g, nb, axis=0)
                inv = jax.lax.rsqrt(var + self.epsilon) * scale[None]
                return (x - mean.astype(x.dtype)) * inv.astype(x.dtype) + bias[
                    None
                ].astype(x.dtype)
            mean, var = x32.mean(axis=0), x32.var(axis=0)
            if not self.is_initializing():
                n = x.shape[0]
                unbiased = var * n / max(n - 1, 1)
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * unbiased
                )
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        return (x - mean.astype(x.dtype)) * inv.astype(x.dtype) + bias.astype(
            x.dtype
        )


class PReLU(nn.Module):
    """Torch-style PReLU: single learned slope, init 0.25."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param(
            "alpha", lambda key, shape: jnp.full(shape, 0.25), (1,)
        )
        return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)


class Dense(nn.Module):
    """Linear layer with torch default init, applied to the last axis."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_f = x.shape[-1]
        kernel = self.param(
            "kernel", torch_conv_init(in_f), (in_f, self.features)
        )
        out = x @ kernel.astype(x.dtype)
        if self.use_bias:
            bias = self.param("bias", torch_conv_init(in_f), (self.features,))
            out = out + bias.astype(x.dtype)
        return out


def max_pool_nchw(
    x: jnp.ndarray,
    window: tuple[int, int],
    strides: tuple[int, int],
    padding: tuple[int, int] = (0, 0),
) -> jnp.ndarray:
    """Torch-style MaxPool2d on NCHW (CRNN stack, ``model/crnn/crnn.py:58-68``)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 1, *window),
        window_strides=(1, 1, *strides),
        padding=[(0, 0), (0, 0), (padding[0],) * 2, (padding[1],) * 2],
    )
