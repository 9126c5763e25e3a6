"""Shared model building blocks (flax.linen).

Conventions:
  - Layout is NCHW at module boundaries to mirror the reference's tensor
    contracts exactly (shapes in docstrings cite the reference); XLA on TPU
    re-lays out internally, so this costs nothing after compilation.
  - BatchNorm carries batch stats in a ``batch_stats`` collection.  On a
    single device the dynamics match torch BN exactly — and the reference
    SHIPS ``ngpu: 1`` (config/super_resolution.yaml), so the canonical
    recipe is single-replica BN, which we reproduce bit-for-close.  On a
    multi-device mesh the jitted batch-mean is a global reduction, i.e.
    sync-BN semantics — a deliberate deviation from ``DataParallel``'s
    per-replica stats (whose running-stat updates torch silently drops on
    every replica but device 0): sync-BN is the better-defined scaling
    behavior, and XLA folds the tiny per-channel all-reduces into the
    gradient collective schedule.
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


def pixel_unshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Inverse of :func:`pixel_shuffle` (space-to-depth): [N, C, H, W] ->
    [N, C*r^2, H/r, W/r] with channel order (c, qy, qx)."""
    n, c, h, w = x.shape
    x = x.reshape(n, c, h // r, r, w // r, r)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(n, c * r * r, h // r, w // r)


def pixel_shuffle_nhwc(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """NHWC PixelShuffle: [N, H, W, C*r^2] -> [N, H*r, W*r, C], with the
    TORCH channel packing order (c, py, px) — the same weights produce the
    same image as the NCHW :func:`pixel_shuffle` (checkpoint compat)."""
    n, h, w, c = x.shape
    oc = c // (r * r)
    x = x.reshape(n, h, w, oc, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # [n, h, py, w, px, oc]
    return x.reshape(n, h * r, w * r, oc)


def pixel_unshuffle_nhwc(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Inverse of :func:`pixel_shuffle_nhwc` (space-to-depth): [N, H, W, C]
    -> [N, H/r, W/r, r^2*C] with channel order (qy, qx, c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // r, w // r, r * r * c)


def _lane_pack_kernel(w: jnp.ndarray, r: int) -> jnp.ndarray:
    """Re-express an OIHW conv kernel on the r x r space-to-depth domain.

    For a stride-1 conv whose padding equals ``r * p`` on each side, the
    conv commutes with pixel-unshuffle: ``conv(x, w) ==
    pixel_shuffle(conv(pixel_unshuffle(x, r), big_w), r)`` where ``big_w``
    has shape [O*r^2, I*r^2, Eh, Ew].  Because the padding is a multiple of
    r, each output phase's taps are a pure SHIFT of the original kernel
    (dy = t - py), so ``big_w`` is built from pads/stacks only — no
    scatter, fully differentiable, negligible per-step cost.
    """
    o, i, kh, kw = w.shape
    th = r * -(-(kh + r - 1) // r)  # ceil to multiple of r
    tw = r * -(-(kw + r - 1) // r)
    rows = [
        jnp.pad(w, ((0, 0), (0, 0), (py, th - kh - py), (0, 0)))
        for py in range(r)
    ]
    wy = jnp.stack(rows, axis=1)  # [O, r(py), I, Th, kw]
    cols = [
        jnp.pad(wy, ((0, 0), (0, 0), (0, 0), (0, 0), (px, tw - kw - px)))
        for px in range(r)
    ]
    wxy = jnp.stack(cols, axis=2)  # [O, r(py), r(px), I, Th, Tw]
    eh, ew = th // r, tw // r
    wxy = wxy.reshape(o, r, r, i, eh, r, ew, r)
    # -> [O, py, px, I, qy, qx, Eh, Ew] matching pixel_(un)shuffle order
    wxy = wxy.transpose(0, 1, 2, 3, 5, 7, 4, 6)
    return wxy.reshape(o * r * r, i * r * r, eh, ew)


def _lane_pack_kernel_nhwc(w: jnp.ndarray, r: int) -> jnp.ndarray:
    """As :func:`_lane_pack_kernel`, but emitting HWIO with channel packing
    orders matching the NHWC shuffles: in (qy, qx, i), out (o, py, px)."""
    o, i, kh, kw = w.shape
    th = r * -(-(kh + r - 1) // r)
    tw = r * -(-(kw + r - 1) // r)
    rows = [
        jnp.pad(w, ((0, 0), (0, 0), (py, th - kh - py), (0, 0)))
        for py in range(r)
    ]
    wy = jnp.stack(rows, axis=1)  # [O, r(py), I, Th, kw]
    cols = [
        jnp.pad(wy, ((0, 0), (0, 0), (0, 0), (0, 0), (px, tw - kw - px)))
        for px in range(r)
    ]
    wxy = jnp.stack(cols, axis=2)  # [O, py, px, I, Th, Tw]
    eh, ew = th // r, tw // r
    wxy = wxy.reshape(o, r, r, i, eh, r, ew, r)
    # -> [Eh, Ew, qy, qx, I, O, py, px] (HWIO with packed channel orders)
    wxy = wxy.transpose(4, 6, 5, 7, 3, 0, 1, 2)
    return wxy.reshape(eh, ew, r * r * i, o * r * r)


def lane_packed_conv_nhwc(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    r: int,
    padding: tuple[int, int],
) -> jnp.ndarray:
    """NHWC twin of :func:`lane_packed_conv` (kernel still OIHW)."""
    ph, pw = padding
    kh, kw = kernel.shape[2], kernel.shape[3]
    assert ph % r == 0 and pw % r == 0 and 2 * ph == kh - 1 and 2 * pw == kw - 1
    xu = pixel_unshuffle_nhwc(x, r)
    big = _lane_pack_kernel_nhwc(kernel, r).astype(x.dtype)
    eh, ew = big.shape[0], big.shape[1]
    plo_h, plo_w = ph // r, pw // r
    yu = jax.lax.conv_general_dilated(
        xu,
        big,
        window_strides=(1, 1),
        padding=[(plo_h, eh - 1 - plo_h), (plo_w, ew - 1 - plo_w)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return pixel_shuffle_nhwc(yu, r)


def lane_packed_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    r: int,
    padding: tuple[int, int],
) -> jnp.ndarray:
    """Stride-1 NCHW conv computed on the r x r space-to-depth domain.

    Mathematically identical to the direct conv (same contraction, same
    zero padding — requires ``padding % r == 0`` and H, W divisible by r),
    but with r^2 x the channel count and 1/r^2 the positions, so a
    few-output-channel conv (e.g. TSRN's final 9x9 64->4, reference
    ``model/tsrn.py:613-616``) fills the MXU's 128 output lanes instead of
    stranding 124 of them.  Measured round 3: the final-conv fwd+bwd was
    the single most expensive op family in the step trace (3.4 ms/step,
    10-14 TF/s) — lane-packing trades 1.78x the FLOPs for 16x the lane
    utilization.
    """
    ph, pw = padding
    kh, kw = kernel.shape[2], kernel.shape[3]
    # same-size ('same'-style) stride-1 convs only
    assert ph % r == 0 and pw % r == 0 and 2 * ph == kh - 1 and 2 * pw == kw - 1
    xu = pixel_unshuffle(x, r)
    big = _lane_pack_kernel(kernel, r).astype(x.dtype)
    eh, ew = big.shape[2], big.shape[3]
    plo_h, plo_w = ph // r, pw // r
    yu = jax.lax.conv_general_dilated(
        xu,
        big,
        window_strides=(1, 1),
        padding=[(plo_h, eh - 1 - plo_h), (plo_w, ew - 1 - plo_w)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return pixel_shuffle(yu, r)


def torch_conv_init(fan_in: int):
    """Torch Conv2d default init: kaiming_uniform(a=sqrt(5)) == U(-b, b)
    with b = 1/sqrt(fan_in); bias likewise."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv2d(nn.Module):
    """Conv with torch-default initialization and 'same'-style explicit
    padding.  The kernel param is always OIHW (torch checkpoint layout);
    ``data_format='NHWC'`` runs the conv feature-minor, which on TPU
    avoids the relayout copies XLA inserts between NCHW convs and
    matmul-consuming neighbors (GRU sequence buffers, attention)."""

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (1, 1)
    use_bias: bool = True
    feature_group_count: int = 1
    dtype: Optional[jnp.dtype] = None
    # >1: compute via lane_packed_conv on the r x r space-to-depth domain
    # when shapes allow (exact same math; MXU lane utilization for convs
    # with few output channels).  Falls back to the direct conv otherwise.
    lane_pack: int = 1
    data_format: str = "NCHW"
    # declare the (checkpoint-identical) params and return them instead of
    # convolving — lets a caller fold a 1x1 conv into an adjacent linear
    # op (GruBlock fuses conv1 into the GRU input projection)
    params_only: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        nhwc = self.data_format == "NHWC"
        in_ch = x.shape[3] if nhwc else x.shape[1]
        kh, kw = self.kernel_size
        fan_in = in_ch // self.feature_group_count * kh * kw
        kernel = self.param(
            "kernel",
            torch_conv_init(fan_in),
            (self.features, in_ch // self.feature_group_count, kh, kw),
        )
        dt = self.dtype or x.dtype
        h_ax, w_ax = (1, 2) if nhwc else (2, 3)
        r = self.lane_pack
        bias = (
            self.param("bias", torch_conv_init(fan_in), (self.features,))
            if self.use_bias
            else None
        )
        if self.params_only:
            return kernel, bias
        if (
            r > 1
            and self.strides == (1, 1)
            and self.feature_group_count == 1
            and self.padding[0] % r == 0
            and self.padding[1] % r == 0
            and 2 * self.padding[0] == kh - 1
            and 2 * self.padding[1] == kw - 1
            and x.shape[h_ax] % r == 0
            and x.shape[w_ax] % r == 0
        ):
            packed = lane_packed_conv_nhwc if nhwc else lane_packed_conv
            y = packed(x.astype(dt), kernel.astype(dt), r, self.padding)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(dt),
                kernel.astype(dt),
                window_strides=self.strides,
                padding=[(self.padding[0],) * 2, (self.padding[1],) * 2],
                dimension_numbers=(
                    ("NHWC", "OIHW", "NHWC") if nhwc else ("NCHW", "OIHW", "NCHW")
                ),
                feature_group_count=self.feature_group_count,
            )
        if bias is not None:
            b = bias.astype(dt)
            y = y + (b if nhwc else b[None, :, None, None])
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


_BN_REPLICAS = 1


def set_bn_replicas(n: int) -> None:
    """Per-replica BN compat knob (``--bn_per_replica``): set to the data-
    parallel device count BEFORE tracing to have every BatchNorm compute
    batch statistics per contiguous batch shard instead of globally —
    mirroring ``torch.nn.DataParallel``'s per-replica stats
    (``interfaces/base.py:390,688,846``; the reference wraps the SR model
    AND the recognizers).  Running averages fold only each copy's
    replica-0 group, matching DataParallel keeping only the master
    replica's buffer updates.  Default 1 = sync-BN (see module docstring:
    the deliberate, better-defined multi-chip default)."""
    global _BN_REPLICAS
    assert n >= 1
    _BN_REPLICAS = int(n)


def bn_replicas() -> int:
    return _BN_REPLICAS


class BatchNorm2d(nn.Module):
    """NCHW BatchNorm over (N, H, W), torch eps/momentum defaults.

    ``copies > 1``: the batch axis packs ``copies`` independent logical
    batches of equal size (the fused-tssim 2B forward concatenates the main
    and counter-rotated copies).  Batch statistics are then computed
    PER-COPY — each copy is normalized exactly as it would be by its own
    separate forward, and the running averages fold the per-copy stats
    sequentially in concat order, matching the reference's two consecutive
    forwards (``super_resolution.py:873,910-914``).

    ``set_bn_replicas(D)`` further splits every copy into D contiguous
    groups (= the 1-D mesh's batch shards, so each group's stats are
    device-local under jit) — per-replica DataParallel semantics."""

    momentum: float = 0.9  # = 1 - torch momentum(0.1)
    epsilon: float = 1e-5
    copies: int = 1
    data_format: str = "NCHW"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        nhwc = self.data_format == "NHWC"
        c = x.shape[3] if nhwc else x.shape[1]
        red = (0, 1, 2) if nhwc else (0, 2, 3)

        def bc(v):  # [C] -> broadcastable over x
            return v if nhwc else v[:, None, None]

        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        hw = (x.shape[1] * x.shape[2]) if nhwc else (x.shape[2] * x.shape[3])
        reps = 1 if self.is_initializing() else _BN_REPLICAS
        if train:
            if self.copies * reps > 1:
                k = self.copies * reps
                nb = x.shape[0] // k
                assert nb * k == x.shape[0], (
                    f"batch {x.shape[0]} not divisible by "
                    f"copies*replicas={k}"
                )
                x32 = x.astype(jnp.float32)
                if reps > 1:
                    # per-replica mode: per-group stats via PER-SAMPLE
                    # moments — the big tensor only sees elementwise ops
                    # and per-sample (H, W) reductions, so the batch axis
                    # stays sharded on the mesh (batch-axis slices provoke
                    # collective-permutes from the SPMD partitioner; see
                    # test_bn_per_replica HLO pin).  The tiny [N, C]
                    # moments group-reduce via a free [k, nb, C] view.
                    prs = red[1:]  # per-sample reduction axes (H, W)
                    sm = x32.mean(axis=prs)  # [N, C]
                    mean_g = sm.reshape(k, nb, c).mean(axis=1)  # [k, C]
                    mean = jnp.repeat(mean_g, nb, axis=0)  # [N, C]
                    mb = (
                        mean[:, None, None, :]
                        if nhwc
                        else mean[:, :, None, None]
                    )
                    sv = jnp.square(x32 - mb).mean(axis=prs)  # [N, C]
                    var_g = sv.reshape(k, nb, c).mean(axis=1)  # [k, C]
                else:
                    # fused-copies default: per-copy stats via BATCH-AXIS
                    # SLICES, not a [k, nb, ...] reshape (the reshape
                    # materialized a relayouted activation copy per BN,
                    # ~83 us each, round-3 trace; the per-sample-moments
                    # form above benched 5% slower end-to-end on v5e —
                    # 2,105 vs 2,220 img/s, round 5).  Two-pass variance
                    # keeps the f32 cancellation safety (r2).
                    parts = [
                        x32[i * nb : (i + 1) * nb] for i in range(k)
                    ]
                    mean_l = [p.mean(axis=red) for p in parts]
                    var_l = [
                        jnp.square(p - bc(m)[None]).mean(axis=red)
                        for p, m in zip(parts, mean_l)
                    ]
                    mean_g = jnp.stack(mean_l)  # [k, C]
                    var_g = jnp.stack(var_l)  # [k, C]
                    mean = jnp.repeat(mean_g, nb, axis=0)  # [N, C]
                    mb = (
                        mean[:, None, None, :]
                        if nhwc
                        else mean[:, :, None, None]
                    )
                if not self.is_initializing():
                    n = nb * hw
                    unb = var_g * n / max(n - 1, 1)
                    rm, rv = ra_mean.value, ra_var.value
                    for i in range(k):
                        if i % reps != 0:
                            # per-replica mode: only each copy's replica-0
                            # group updates the running stats (DataParallel
                            # keeps only the master replica's buffers)
                            continue
                        rm = self.momentum * rm + (1 - self.momentum) * mean_g[i]
                        rv = self.momentum * rv + (1 - self.momentum) * unb[i]
                    ra_mean.value, ra_var.value = rm, rv
                # normalize in the original packed layout (doing the
                # elementwise on a reshaped [k, nb, ...] view measured 12%
                # SLOWER end-to-end on v5e: relayouts through every BN's
                # fwd+bwd) and in f32: centering with a bf16-cast mean
                # loses eps*|mean| (test_precision_audit BN probe); the
                # converts fuse into this elementwise.  (A bias-folded
                # bf16 variant benched within run noise of this form —
                # round-5 A/B — so the simpler exact form is kept.)
                var = jnp.repeat(var_g, nb, axis=0)  # [N, C]
                vb = var[:, None, None, :] if nhwc else var[:, :, None, None]
                inv = jax.lax.rsqrt(vb + self.epsilon) * bc(scale)[None]
                return ((x32 - mb) * inv + bc(bias)[None]).astype(x.dtype)
            x32 = x.astype(jnp.float32)
            mean = x32.mean(axis=red)
            var = x32.var(axis=red)
            if not self.is_initializing():
                n = x.shape[0] * hw
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
        # f32 normalize (see copies>1 branch): the f32 stats are exact but
        # centering must not round the mean back to the compute dtype
        y = (x.astype(jnp.float32) - bc(mean)[None]) * bc(inv)[None] + bc(
            bias
        )[None]
        return y.astype(x.dtype)


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
        reps = 1 if self.is_initializing() else _BN_REPLICAS
        if train:
            x32 = x.astype(jnp.float32)
            if self.copies * reps > 1:
                k = self.copies * reps
                nb = x.shape[0] // k
                assert nb * k == x.shape[0], (
                    f"batch {x.shape[0]} not divisible by "
                    f"copies*replicas={k}"
                )
                xg = x32.reshape(k, nb, c)
                mean_g, var_g = xg.mean(axis=1), xg.var(axis=1)
                if not self.is_initializing():
                    unb = var_g * nb / max(nb - 1, 1)
                    rm, rv = ra_mean.value, ra_var.value
                    for i in range(k):
                        if i % reps != 0:  # see BatchNorm2d: replica-0 only
                            continue
                        rm = self.momentum * rm + (1 - self.momentum) * mean_g[i]
                        rv = self.momentum * rv + (1 - self.momentum) * unb[i]
                    ra_mean.value, ra_var.value = rm, rv
                mean = jnp.repeat(mean_g, nb, axis=0)
                var = jnp.repeat(var_g, nb, axis=0)
                inv = jax.lax.rsqrt(var + self.epsilon) * scale[None]
                return (
                    (x.astype(jnp.float32) - mean) * inv + bias[None]
                ).astype(x.dtype)
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
        return ((x.astype(jnp.float32) - mean) * inv + bias).astype(x.dtype)


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


def max_pool_nhwc(
    x: jnp.ndarray,
    window: tuple[int, int],
    strides: tuple[int, int],
    padding: tuple[int, int] = (0, 0),
) -> jnp.ndarray:
    """Torch-style MaxPool2d on NHWC."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, *window, 1),
        window_strides=(1, *strides, 1),
        padding=[(0, 0), (padding[0],) * 2, (padding[1],) * 2, (0, 0)],
    )
