"""Numerical cross-validation of the LPIPS-VGG metric and GeneratorLoss
against torch-side computations with SHARED random VGG16 weights.

The reference consumes LPIPS via the ``lpips`` pip package
(``interfaces/super_resolution.py:41-43, 1409-1420``) and GeneratorLoss
via ``loss/percptual_loss.py:7-47`` — both backed by torchvision's VGG16.
Neither pretrained checkpoint can enter this environment, so parity is
established on the exact pipeline with shared random weights: a torch
``nn.Sequential`` in torchvision's ``.features`` layout is initialized
randomly, its state dict flows through ``import_vgg16_features``, and the
formulas (lpips: scale-shift -> taps -> unit-normalize -> lin-weighted
spatial mean; GeneratorLoss: MSE + 0.006*featureMSE(features[:31]) +
2e-8*TV) are computed independently on both sides.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from tatt_tpu.losses.perceptual import (  # noqa: E402
    LPIPS_TAPS,
    VGG16_PLAN,
    generator_loss,
    import_vgg16_features,
    lpips_vgg,
)

torch.set_num_threads(1)


def _torch_vgg16_features() -> tnn.Sequential:
    """torchvision ``vgg16().features`` layout: 13 convs interleaved with
    ReLUs and 5 maxpools, 31 modules, state-dict keys ``<idx>.weight``."""
    layers, in_ch = [], 3
    for spec in VGG16_PLAN:
        if spec == "M":
            layers.append(tnn.MaxPool2d(2, 2))
            continue
        layers.append(tnn.Conv2d(in_ch, spec, 3, padding=1))
        layers.append(tnn.ReLU(inplace=False))
        in_ch = spec
    return tnn.Sequential(*layers)


_SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
_SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)


def _torch_lpips(net, lins, img0, img1):
    """The lpips-package pipeline (lpips/lpips.py): in = 2*img-1, scaling
    layer, VGG taps at relu{1_2,2_2,3_3,4_3,5_3}, unit-normalize over
    channels (eps 1e-10), squared diff, 1x1 lin head, spatial mean, sum."""

    def taps(x):
        x = (2.0 * x - 1.0 - _SHIFT) / _SCALE
        out = []
        for i, layer in enumerate(net):
            x = layer(x)
            if i in LPIPS_TAPS:
                out.append(x)
        return out

    def unit(x):
        return x / (torch.sqrt((x**2).sum(1, keepdim=True)) + 1e-10)

    total = 0.0
    for f0, f1, w in zip(taps(img0), taps(img1), lins):
        d = (unit(f0) - unit(f1)) ** 2
        lin = (d * w.view(1, -1, 1, 1)).sum(1, keepdim=True)
        total = total + lin.mean(dim=(1, 2, 3))
    return total


def test_lpips_vgg_matches_torch_pipeline():
    torch.manual_seed(20)
    net = _torch_vgg16_features().eval()
    # weight magnitudes like real VGG (small): scale default init down so
    # 5 stages of random convs do not blow activations up
    with torch.no_grad():
        for m in net:
            if isinstance(m, tnn.Conv2d):
                m.weight *= 0.3
                m.bias *= 0.1
    lins = [
        torch.rand(c).abs() for c in (64, 128, 256, 512, 512)
    ]

    rng = np.random.default_rng(20)
    a = rng.random((2, 3, 32, 64), dtype=np.float32)
    b = np.clip(a + 0.1 * rng.standard_normal(a.shape).astype(np.float32), 0, 1)

    with torch.no_grad():
        want = _torch_lpips(
            net, lins, torch.from_numpy(a), torch.from_numpy(b)
        ).numpy()

    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    vgg_vars = import_vgg16_features(sd)
    got = np.asarray(
        lpips_vgg(vgg_vars, [w.numpy() for w in lins], a, b)
    )
    assert got.shape == want.shape == (2,)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_generator_loss_matches_reference_formula():
    """GeneratorLoss (``loss/percptual_loss.py:7-47``): the loss network is
    ``features[:31]`` — through pool5 inclusive."""
    torch.manual_seed(21)
    net = _torch_vgg16_features().eval()
    with torch.no_grad():
        for m in net:
            if isinstance(m, tnn.Conv2d):
                m.weight *= 0.3
                m.bias *= 0.1

    rng = np.random.default_rng(21)
    a = rng.random((2, 3, 32, 64), dtype=np.float32)
    b = rng.random((2, 3, 32, 64), dtype=np.float32)

    at, bt = torch.from_numpy(a), torch.from_numpy(b)
    mse = tnn.MSELoss()
    with torch.no_grad():
        loss_network = tnn.Sequential(*list(net)[:31])
        perception = mse(loss_network(at), loss_network(bt))
        image_term = mse(at, bt)
        h_tv = ((at[:, :, 1:] - at[:, :, :-1]) ** 2).sum()
        w_tv = ((at[:, :, :, 1:] - at[:, :, :, :-1]) ** 2).sum()
        count_h = at[:, :, 1:].numel() / 2
        count_w = at[:, :, :, 1:].numel() / 2
        tv = 2 * (h_tv / count_h + w_tv / count_w) / 2
        want = float(image_term + 0.006 * perception + 2e-8 * tv)

    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    vgg_vars = import_vgg16_features(sd)
    got = float(generator_loss(vgg_vars, a, b))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-5)
