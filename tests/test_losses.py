"""Loss parity vs torch formulations of the reference losses."""

import numpy as np
import torch
import torch.nn.functional as F

from tatt_tpu.losses.distill import semantic_loss
from tatt_tpu.losses.image import image_loss
from tatt_tpu.losses.ssim import distorted_ssim, psnr, ssim, tri_ssim

RNG = np.random.default_rng(7)


def _torch_gradient_map(x):
    w_x, h_x = x.shape[-1], x.shape[-2]
    r = F.pad(x, (0, 1, 0, 0))[:, :, :, 1:]
    l = F.pad(x, (1, 0, 0, 0))[:, :, :, :w_x]
    t = F.pad(x, (0, 0, 1, 0))[:, :, :h_x, :]
    b = F.pad(x, (0, 0, 0, 1))[:, :, 1:, :]
    return torch.pow(
        torch.pow((r - l) * 0.5, 2) + torch.pow((t - b) * 0.5, 2) + 1e-6, 0.5
    )


def test_image_loss_matches_reference_formula():
    out = RNG.random((3, 4, 32, 128)).astype(np.float32)
    tgt = RNG.random((3, 4, 32, 128)).astype(np.float32)
    t_out, t_tgt = torch.from_numpy(out), torch.from_numpy(tgt)
    mse = F.mse_loss(t_out, t_tgt, reduction="none").mean((1, 2, 3))
    gp = (
        (_torch_gradient_map(t_out[:, :3]) - _torch_gradient_map(t_tgt[:, :3]))
        .abs()
        .mean((1, 2, 3))
    )
    want = (1.0 * mse + 1e-4 * gp).numpy()
    got = np.asarray(image_loss(out, tgt))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-5)


def _torch_ssim(img1, img2, window_size=11):
    from math import exp

    def gaussian(ws, sigma):
        g = torch.Tensor([exp(-((x - ws // 2) ** 2) / (2 * sigma**2)) for x in range(ws)])
        return g / g.sum()

    c = img1.shape[1]
    w1 = gaussian(window_size, 1.5).unsqueeze(1)
    window = w1.mm(w1.t()).unsqueeze(0).unsqueeze(0).expand(c, 1, window_size, window_size)
    mu1 = F.conv2d(img1, window, padding=window_size // 2, groups=c)
    mu2 = F.conv2d(img2, window, padding=window_size // 2, groups=c)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    s1 = F.conv2d(img1 * img1, window, padding=window_size // 2, groups=c) - mu1_sq
    s2 = F.conv2d(img2 * img2, window, padding=window_size // 2, groups=c) - mu2_sq
    s12 = F.conv2d(img1 * img2, window, padding=window_size // 2, groups=c) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    return (
        ((2 * mu1_mu2 + c1) * (2 * s12 + c2))
        / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    ).mean()


def test_ssim_matches_reference():
    a = RNG.random((2, 4, 32, 128)).astype(np.float32)
    b = (a + 0.05 * RNG.standard_normal(a.shape)).clip(0, 1).astype(np.float32)
    want = _torch_ssim(torch.from_numpy(a[:, :3]), torch.from_numpy(b[:, :3])).item()
    got = float(ssim(a, b))
    assert abs(got - want) < 1e-5


def test_tri_ssim_degenerates_to_values_in_range():
    a = RNG.random((2, 4, 16, 64)).astype(np.float32)
    v = float(tri_ssim(a, a, a))
    assert 0.99 < v <= 1.000001
    b = RNG.random((2, 4, 16, 64)).astype(np.float32)
    c = RNG.random((2, 4, 16, 64)).astype(np.float32)
    assert float(tri_ssim(a, b, c)) < v


def test_distorted_ssim_runs():
    a = RNG.random((2, 3, 32, 128)).astype(np.float32)
    v = float(distorted_ssim(a, a))
    assert v > 0.99


def test_semantic_loss_matches_torch():
    p = torch.softmax(torch.randn(26, 2, 37), dim=-1)
    g = torch.softmax(torch.randn(26, 2, 37), dim=-1)
    kl = torch.nn.KLDivLoss()(torch.log(p + 1e-20), g + 1e-20)
    want = ((g - p).abs().mean() + kl).item()
    got = float(semantic_loss(p.numpy(), g.numpy()))
    assert abs(got - want) < 1e-6


def test_psnr():
    a = RNG.random((2, 3, 8, 8)).astype(np.float32)
    b = (a + 0.1).clip(0, 1).astype(np.float32)
    mse = ((a * 255 - b * 255) ** 2).mean()
    want = 20 * np.log10(255 / np.sqrt(mse))
    assert abs(float(psnr(a, b)) - want) < 1e-3


def test_ssim_family_computes_in_f32():
    """The SSIM windows must run at full precision even under bf16
    compute: on TPU, bf16 (or default-precision f32) convs make the
    variance terms E[x^2]-E[x]^2 cancel catastrophically for
    near-saturated images, exploding the loss *gradients* by 4-6 orders
    (round-2 root cause of the rotate+tssim training stall)."""
    import jax
    import jax.numpy as jnp

    from tatt_tpu.losses.ssim import _depthwise_filter, _gaussian_window, tri_ssim

    x = jnp.full((2, 3, 16, 32), 0.999, jnp.bfloat16)
    out = _depthwise_filter(x, _gaussian_window(11, 11))
    assert out.dtype == jnp.float32

    # gradient stays modest for a flat near-saturated pair vs a textured HR
    rng = np.random.default_rng(0)
    hr = jnp.asarray(rng.random((2, 3, 16, 32), np.float32))
    sr = jnp.full((2, 3, 16, 32), 0.999, jnp.float32)

    def loss(a, b):
        return (1.0 - tri_ssim(a, b, hr)) * 10.0

    ga, gb = jax.grad(loss, argnums=(0, 1))(sr, sr + 1e-3)
    assert float(jnp.abs(ga).max()) < 1.0 and float(jnp.abs(gb).max()) < 1.0
