"""Parity tests for image ops against torch CPU reference semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from tatt_tpu.kernels.grid_sample import (
    affine_grid,
    grid_sample_bilinear,
    rotate_batch,
)
from tatt_tpu.kernels.resize import resize_bicubic, rgb_to_luma

RNG = np.random.default_rng(0)


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((16, 64), (32, 100)), ((32, 128), (32, 100)), ((16, 64), (32, 128))],
)
def test_bicubic_matches_torch(in_hw, out_hw):
    x = RNG.standard_normal((2, 3, *in_hw)).astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(x), out_hw, mode="bicubic", align_corners=False
    ).numpy()
    got = np.asarray(resize_bicubic(x, *out_hw))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_affine_grid_matches_torch():
    theta = RNG.standard_normal((3, 2, 3)).astype(np.float32)
    size = (3, 4, 16, 64)
    want = F.affine_grid(torch.from_numpy(theta), size, align_corners=False).numpy()
    got = np.asarray(affine_grid(theta, size))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_grid_sample_matches_torch():
    x = RNG.standard_normal((2, 3, 16, 64)).astype(np.float32)
    # grid slightly beyond [-1, 1] to exercise zero padding
    grid = (RNG.random((2, 8, 32, 2)).astype(np.float32) * 2.4) - 1.2
    want = F.grid_sample(
        torch.from_numpy(x),
        torch.from_numpy(grid),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=False,
    ).numpy()
    got = np.asarray(grid_sample_bilinear(x, grid))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_rotate_batch_matches_reference_formula():
    """Mirror torch_rotate_img (super_resolution.py:126-157) step by step."""
    x = RNG.standard_normal((4, 4, 16, 64)).astype(np.float32)
    arc = (RNG.random(4).astype(np.float32) - 0.5) * 0.2
    offs = RNG.random(4).astype(np.float32)

    n, c, h, w = x.shape
    ratios = h / float(w)
    t_arc = torch.from_numpy(arc)
    t_offs = torch.from_numpy(offs)
    ratios_mul = ratios + (t_offs.unsqueeze(1) * 0.4) - 0.2
    a11, a12 = torch.cos(t_arc), torch.sin(t_arc)
    a21, a22 = -torch.sin(t_arc), torch.cos(t_arc)
    zeros = torch.zeros_like(t_arc)
    theta = torch.cat(
        [
            a11.unsqueeze(1),
            a12.unsqueeze(1) * ratios_mul,
            zeros.unsqueeze(1),
            a21.unsqueeze(1) / ratios_mul,
            a22.unsqueeze(1),
            zeros.unsqueeze(1),
        ],
        dim=1,
    ).reshape(n, 2, 3)
    grid = F.affine_grid(theta, x.shape, align_corners=False)
    want = F.grid_sample(torch.from_numpy(x), grid, align_corners=False).numpy()

    got = np.asarray(rotate_batch(x, arc, offs))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-3)


def test_rgb_to_luma():
    x = RNG.random((2, 3, 4, 4)).astype(np.float32)
    want = 0.299 * x[:, :1] + 0.587 * x[:, 1:2] + 0.114 * x[:, 2:3]
    np.testing.assert_allclose(np.asarray(rgb_to_luma(x)), want, atol=1e-6)


def test_rotate_shear_close_to_gather():
    """3-shear rotation approximates the bilinear gather rotation (extra
    smoothing from composing interpolations is expected but small)."""
    from tatt_tpu.kernels.grid_sample import rotate_batch_shear

    rng = np.random.default_rng(3)
    # smooth image so interpolation differences stay small
    base = rng.random((1, 1, 8, 8)).astype(np.float32)
    import jax.numpy as jnp
    from tatt_tpu.kernels.resize import resize_bilinear

    x = np.asarray(resize_bilinear(jnp.asarray(base), 32, 128)).repeat(4, 1)
    x = np.broadcast_to(x, (4, 4, 32, 128)).copy()
    arc = (rng.random(4).astype(np.float32) - 0.5) * 0.17  # ~±5°
    offs = rng.random(4).astype(np.float32)
    want = np.asarray(rotate_batch(x, arc, offs, method="gather"))
    got = np.asarray(rotate_batch_shear(x, arc, offs))
    # interiors agree closely; borders differ by padding handling
    diff = np.abs(got - want)[:, :, 4:-4, 8:-8]
    assert diff.mean() < 0.01, diff.mean()
    assert np.quantile(diff, 0.99) < 0.06


def test_grid_sample_mxu_matches_gather():
    """The separable-einsum sampler is EXACT bilinear: it must match the
    4-tap gather to f32 rounding for arbitrary grids, including
    out-of-bounds taps (zero padding) and both align_corners modes."""
    from tatt_tpu.kernels.grid_sample import (
        grid_sample_bilinear,
        grid_sample_bilinear_mxu,
    )

    rng = np.random.default_rng(11)
    x = rng.random((3, 4, 16, 64)).astype(np.float32)
    # grid spills past the image on purpose (|g| up to 1.3)
    grid = (rng.random((3, 10, 40, 2)).astype(np.float32) * 2.6) - 1.3
    for ac in (False, True):
        want = np.asarray(grid_sample_bilinear(x, grid, align_corners=ac))
        got = np.asarray(grid_sample_bilinear_mxu(x, grid, align_corners=ac))
        np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-5)


@pytest.mark.parametrize("shape,r", [((2, 64, 32, 128, 4, 9), 4), ((3, 16, 16, 64, 3, 9), 4), ((2, 8, 32, 32, 5, 9), 2)])
def test_lane_packed_conv_matches_direct(shape, r):
    """lane_packed_conv (space-to-depth reformulation of the TSRN final
    9x9 conv, ``model/tsrn.py:613-616``) is the SAME contraction as the
    direct conv — values and both gradients must match to fp rounding."""
    import jax
    import jax.numpy as jnp

    from tatt_tpu.models.common import lane_packed_conv

    b, c, h, w, o, k = shape
    pad = (k - 1) // 2
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, c, h, w).astype(np.float32))
    kern = jnp.asarray(rng.randn(o, c, k, k).astype(np.float32) * 0.1)

    def direct(x_, w_):
        return jax.lax.conv_general_dilated(
            x_, w_, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )

    ref = direct(x, kern)
    got = lane_packed_conv(x, kern, r, (pad, pad))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-5)

    gp = jax.grad(lambda a, b_: lane_packed_conv(a, b_, r, (pad, pad)).sum(), argnums=(0, 1))(x, kern)
    gd = jax.grad(lambda a, b_: direct(a, b_).sum(), argnums=(0, 1))(x, kern)
    for a, b_ in zip(gp, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4, rtol=2e-5)
