"""STN head + thin-plate-spline rectification.

Rebuilds ``model/stn_head.py`` (6 conv-pool blocks -> FC -> 20 control
points initialized to the identity border grid) and
``model/tps_spatial_transformer.py`` (precomputed inverse TPS kernel and
target-coordinate representation; forward solves the mapping matrix and
bilinearly samples).  The TPS matrices are compile-time constants
(precomputed with numpy exactly as the reference precomputes buffers),
so the whole rectification is matmuls + one grid_sample.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tatt_tpu.kernels.grid_sample import grid_sample
from tatt_tpu.models.common import (
    BatchNorm1d,
    BatchNorm2d,
    Conv2d,
    Dense,
    max_pool_nhwc,
)


def build_output_control_points(num_ctrl: int, margins=(0.05, 0.05)) -> np.ndarray:
    """Border control points (``tps_spatial_transformer.py:38-50``)."""
    margin_x, margin_y = margins
    per_side = num_ctrl // 2
    xs = np.linspace(margin_x, 1.0 - margin_x, per_side)
    top = np.stack([xs, np.full(per_side, margin_y)], axis=1)
    bottom = np.stack([xs, np.full(per_side, 1.0 - margin_y)], axis=1)
    return np.concatenate([top, bottom], axis=0).astype(np.float64)


def _partial_repr(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """phi(r) = r^2 log(r^2) / 2 with 0*log(0) -> 0
    (``tps_spatial_transformer.py:22-34``)."""
    diff = a[:, None, :] - b[None, :, :]
    dist = (diff**2).sum(-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        rep = 0.5 * dist * np.log(dist)
    rep[~np.isfinite(rep)] = 0.0
    return rep


@lru_cache(maxsize=None)
def tps_matrices(
    target_h: int, target_w: int, num_ctrl: int, margins: tuple[float, float]
) -> tuple[np.ndarray, np.ndarray]:
    """(inverse_kernel [N+3, N+3], target_coordinate_repr [HW, N+3])
    exactly as precomputed in ``tps_spatial_transformer.py:66-94``."""
    tcp = build_output_control_points(num_ctrl, margins)
    n = num_ctrl
    forward_kernel = np.zeros((n + 3, n + 3))
    forward_kernel[:n, :n] = _partial_repr(tcp, tcp)
    forward_kernel[:n, -3] = 1.0
    forward_kernel[-3, :n] = 1.0
    forward_kernel[:n, -2:] = tcp
    forward_kernel[-2:, :n] = tcp.T
    inverse_kernel = np.linalg.inv(forward_kernel)

    hw = target_h * target_w
    yx = np.array(
        [(y, x) for y in range(target_h) for x in range(target_w)], dtype=np.float64
    )
    coord = np.stack(
        [yx[:, 1] / (target_w - 1), yx[:, 0] / (target_h - 1)], axis=1
    )  # (x, y)
    repr_mat = np.concatenate(
        [_partial_repr(coord, tcp), np.ones((hw, 1)), coord], axis=1
    )
    return inverse_kernel.astype(np.float32), repr_mat.astype(np.float32)


def tps_transform(
    images: jnp.ndarray,
    source_ctrl: jnp.ndarray,
    output_size: tuple[int, int],
    margins: tuple[float, float] = (0.05, 0.05),
) -> jnp.ndarray:
    """Warp ``images`` [N,C,H,W] by TPS mapping control points
    (``tps_spatial_transformer.py:97-112``); ``source_ctrl`` [N, K, 2]."""
    n, _, _, _ = images.shape
    k = source_ctrl.shape[1]
    th, tw = output_size
    inv_k, coord_repr = tps_matrices(th, tw, k, tuple(margins))
    # The solve MUST run in f32 at full precision: inverse_kernel entries
    # reach ±87 and cancel down to grid coords in [0, 1], so the TPU's
    # default bf16-multiply einsum yields grid errors up to ~0.4 image
    # widths — enough to turn the warp into noise (round-4 soak collapse).
    f32 = jnp.float32
    padded = jnp.concatenate(
        [source_ctrl.astype(f32), jnp.zeros((n, 3, 2), f32)], axis=1
    )
    hi = jax.lax.Precision.HIGHEST
    mapping = jnp.einsum(
        "ab,nbc->nac", jnp.asarray(inv_k, f32), padded, precision=hi
    )
    source_coord = jnp.einsum(
        "ha,nac->nhc", jnp.asarray(coord_repr, f32), mapping, precision=hi
    )  # [N, HW, 2] in [0, 1]
    grid = source_coord.reshape(n, th, tw, 2)
    grid = jnp.clip(grid, 0.0, 1.0) * 2.0 - 1.0
    # The f32 stays confined to the solve: the WARP consumes the grid in
    # the compute dtype (a bf16 grid quantizes sampling positions by
    # <= 2^-9 of the [-1, 1] range ~ 0.03 LR px — three orders under the
    # solve's bf16 failure mode and under the warp's own bf16 tent
    # weights; bounded by test_tps_parity.test_bf16_grid_error_bound).
    # Without this cast the f32 grid drags f32 tent-weight tensors
    # through the warp's fwd+bwd (round-5 regression attribution).
    # auto -> the exact separable-einsum sampler on accelerators: 8x
    # faster than the 4-tap gather for this warp on v5e (1.5 vs 12.3 ms
    # fwd+bwd at batch 128), bitwise-equivalent to f32 rounding.
    return grid_sample(images, grid.astype(images.dtype))


class STNHead(nn.Module):
    """``model/stn_head.py:25-106``: conv tower -> fc -> 2K control points;
    final fc initialized so the predicted points start at the identity
    border grid, and its input scaled by 0.1.

    ``variant='generator'`` pools like the TATT generator's head (16x64
    input -> 1x2); ``variant='aster'`` like the ASTER recognizer's
    (``model/recognizer/stn_head.py:33-44``: five 2x2 pools, 32x64 input
    -> 1x2) — the two reference files differ only in this layout."""

    num_ctrlpoints: int = 20
    activation: str = "none"
    variant: str = "generator"
    bn_copies: int = 1  # per-copy BN stats for the fused-tssim 2B forward

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        chans = [32, 64, 128, 256, 256, 256]
        if self.variant == "aster":
            pools = [(2, 2), (2, 2), (2, 2), (2, 2), (2, 2), None]
        else:
            pools = [(2, 2), (2, 2), (2, 2), (2, 2), (1, 2), None]
        # NHWC conv tower (NCHW input); flattened back through NCHW order
        # so fc1's weight layout matches the torch checkpoint.
        x = x.transpose(0, 2, 3, 1)
        for i, (c, pool) in enumerate(zip(chans, pools)):
            x = Conv2d(
                c, (3, 3), padding=(1, 1), data_format="NHWC", name=f"conv{i}"
            )(x)
            x = BatchNorm2d(
                copies=self.bn_copies, data_format="NHWC", name=f"bn{i}"
            )(x, train)
            x = jnp.maximum(x, 0.0)
            if pool is not None:
                x = max_pool_nhwc(x, pool, pool)
        n = x.shape[0]
        x = x.transpose(0, 3, 1, 2).reshape(n, -1)
        x = Dense(512, name="fc1")(x)
        x = BatchNorm1d(copies=self.bn_copies, name="fc1_bn")(x, train)
        x = jnp.maximum(x, 0.0)

        ctrl_init = build_output_control_points(
            self.num_ctrlpoints, (0.01, 0.01)
        ).astype(np.float32)

        def zero_w(key, shape, dtype=jnp.float32):
            return jnp.zeros(shape, dtype)

        def bias_init(key, shape, dtype=jnp.float32):
            return jnp.asarray(ctrl_init.reshape(-1), dtype)

        w = self.param("fc2_kernel", zero_w, (512, 2 * self.num_ctrlpoints))
        b = self.param("fc2_bias", bias_init, (2 * self.num_ctrlpoints,))
        pts = (0.1 * x) @ w.astype(x.dtype) + b.astype(x.dtype)
        return pts.reshape(n, self.num_ctrlpoints, 2)
