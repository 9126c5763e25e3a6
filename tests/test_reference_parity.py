"""Parity against the ACTUAL reference modules imported from
``/root/reference`` (CPU torch) — not test-local reconstructions.

Round-1 parity tests compared against torch re-implementations living in
the test files themselves; a reconstruction could share a misreading with
the implementation.  Here the reference's own ``nn.Module``s are
instantiated, their random-init state dicts are pushed through our
``core/torch_import.py`` importers, and forward outputs are compared:

  - TATT generator: ``model/tsrn.py:576-692`` ``TSRN_TL_TRANS``
  - CRNN (TPG/judge): ``model/crnn/crnn.py:29-92``
  - ASTER encoder: ``model/recognizer/resnet_aster.py:64-135``
  - MORAN (MORN+ASRN, test mode): ``model/moran/moran.py:6-22``
  - TPS warp: ``model/tps_spatial_transformer.py:97-113``
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _install_reference():
    """Put /root/reference on sys.path with a torchvision stub (the env has
    no torchvision; the reference only binds ToTensor/models at import)."""
    if "torchvision" not in sys.modules:
        _tv = types.ModuleType("torchvision")
        _tr = types.ModuleType("torchvision.transforms")
        _tm = types.ModuleType("torchvision.models")
        _tr.ToTensor = object
        _tv.transforms = _tr
        _tv.models = _tm
        sys.modules["torchvision"] = _tv
        sys.modules["torchvision.transforms"] = _tr
        sys.modules["torchvision.models"] = _tm
    if REF not in sys.path:
        sys.path.insert(0, REF)


pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present"
)

_install_reference()
torch.set_num_threads(1)


def _sd(module) -> dict:
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def test_tatt_generator_vs_reference():
    from model.tsrn import TSRN_TL_TRANS

    from tatt_tpu.core.torch_import import import_tatt
    from tatt_tpu.models.tsrn import TATT

    torch.manual_seed(0)
    srb_nums = 2
    ref = TSRN_TL_TRANS(
        scale_factor=2, width=128, height=32, STN=True,
        srb_nums=srb_nums, mask=True, hidden_units=32,
    ).eval()

    rng = np.random.default_rng(0)
    x = rng.random((2, 4, 16, 64), dtype=np.float32)
    prior = rng.random((2, 37, 1, 26), dtype=np.float32)
    prior /= prior.sum(1, keepdims=True)

    with torch.no_grad():
        want, _pr_weights = ref(torch.from_numpy(x), torch.from_numpy(prior))
    want = want.numpy()

    variables = import_tatt(_sd(ref), srb_nums=srb_nums)
    model = TATT(
        srb_nums=srb_nums, hidden_units=32, out_text_channels=64,
        query_gru_mode="reference",
    )
    got, _aux = model.apply(variables, x, prior)
    got = np.asarray(got)
    assert got.shape == want.shape == (2, 4, 32, 128)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_crnn_vs_reference():
    from model.crnn.crnn import CRNN as RefCRNN

    from tatt_tpu.core.torch_import import import_crnn
    from tatt_tpu.models.recognizers.crnn import CRNN

    torch.manual_seed(1)
    ref = RefCRNN(32, 1, 37, 256).eval()
    x = np.random.default_rng(1).random((2, 1, 32, 100), dtype=np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()  # [T=26, B, 37]

    variables = import_crnn(_sd(ref))
    got = np.asarray(CRNN().apply(variables, x))
    assert got.shape == want.shape == (26, 2, 37)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_aster_vs_reference(monkeypatch):
    import torch.nn.functional as F
    from model.recognizer.recognizer_builder import RecognizerBuilder

    # the reference decoder hard-codes .cuda() on intermediates
    # (attention_recognition_head.py:213,259); run it on CPU
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)

    from tatt_tpu.core.torch_import import import_aster
    from tatt_tpu.models.recognizers.aster import AsterRecognizer

    torch.manual_seed(2)
    n_classes = 97
    ref = RecognizerBuilder(
        arch="ResNet_ASTER", rec_num_classes=n_classes, sDim=512,
        attDim=512, max_len_labels=100, eos=94, STN_ON=True,
    ).eval()

    x = (
        np.random.default_rng(2).random((2, 3, 64, 256), dtype=np.float32)
        * 2.0
        - 1.0
    )
    xt = torch.from_numpy(x)
    with torch.no_grad():
        # the builder's eval forward runs beam search; drive its own
        # submodules through the rectify+encode path it uses
        # (recognizer_builder.py:75-86)
        stn_input = F.interpolate(
            xt, (32, 64), mode="bilinear", align_corners=True
        )
        _, ctrl_points = ref.stn_head(stn_input)
        rectified, _ = ref.tps(xt, ctrl_points)
        want_feats = ref.encoder(rectified).numpy()
        want_ids, want_scores = ref.decoder.sample(
            [torch.from_numpy(want_feats), None, None]
        )

    variables = import_aster(_sd(ref))
    model = AsterRecognizer(num_classes=n_classes)
    got_feats = np.asarray(
        model.apply(variables, np.asarray(x), method=AsterRecognizer.encode)
    )
    assert got_feats.shape == want_feats.shape
    # TPS rectification bilinear-samples a high-frequency random image;
    # tiny grid-coordinate f32 differences amplify through 5 ResNet stages
    np.testing.assert_allclose(got_feats, want_feats, atol=5e-3, rtol=1e-2)

    got_ids, got_scores = model.apply(variables, np.asarray(x))
    np.testing.assert_array_equal(np.asarray(got_ids), want_ids.numpy())
    np.testing.assert_allclose(
        np.asarray(got_scores), want_scores.numpy(), atol=1e-3, rtol=1e-3
    )


def test_moran_vs_reference():
    from model.moran.moran import MORAN as RefMORAN

    from tatt_tpu.core.torch_import import import_moran
    from tatt_tpu.models.recognizers.moran import MORAN

    torch.manual_seed(3)
    ref = RefMORAN(
        1, 37, 256, 32, 100, BidirDecoder=True,
        inputDataType="torch.FloatTensor", CUDA=False,
    ).eval()

    x = np.random.default_rng(3).random((2, 1, 32, 100), dtype=np.float32)
    b = x.shape[0]
    max_iter = 20
    # parse_moran_data semantics (base.py:694-711): '0'*20 dummy text
    text = torch.zeros(b * max_iter, dtype=torch.long)
    length = torch.full((b,), max_iter, dtype=torch.int32)
    with torch.no_grad():
        want_l2r, want_r2l = ref(
            torch.from_numpy(x), length, text, text, test=True
        )
    want_l2r = want_l2r.numpy().reshape(b, max_iter, -1)
    want_r2l = want_r2l.numpy().reshape(b, max_iter, -1)

    import jax
    import jax.numpy as jnp

    # importers return numpy leaves; the attention decode fancy-indexes an
    # embedding table with a traced id vector, which needs jax arrays
    variables = jax.tree.map(jnp.asarray, import_moran(_sd(ref)))
    got_l2r, got_r2l = MORAN(num_classes=37, num_steps=max_iter).apply(
        variables, np.asarray(x)
    )
    np.testing.assert_allclose(
        np.asarray(got_l2r), want_l2r, atol=5e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(got_r2l), want_r2l, atol=5e-4, rtol=1e-3
    )


def test_tps_vs_reference():
    from model.tps_spatial_transformer import (
        TPSSpatialTransformer as RefTPS,
    )

    from tatt_tpu.models.stn import tps_transform

    torch.manual_seed(4)
    ref = RefTPS(
        output_image_size=(16, 64), num_control_points=20,
        margins=(0.05, 0.05),
    )
    rng = np.random.default_rng(4)
    x = rng.random((2, 4, 16, 64), dtype=np.float32)
    # control points near the identity layout, jittered
    base = ref.target_control_points.numpy()
    pts = np.tile(base[None], (2, 1, 1)).astype(np.float32)
    pts += rng.normal(scale=0.02, size=pts.shape).astype(np.float32)
    pts = np.clip(pts, 0.0, 1.0)

    with torch.no_grad():
        want, _grid = ref(torch.from_numpy(x), torch.from_numpy(pts))
    want = want.numpy()

    got = np.asarray(tps_transform(np.asarray(x), np.asarray(pts), (16, 64)))
    assert got.shape == want.shape
    # f32 kernel inversion vs the reference's f64 buffers: ~4e-4 worst-case
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=2e-3)
