"""Zoo torch-import parity against the ACTUAL reference modules
(same methodology as test_reference_parity.py): random torch init,
state-dict import through ``core/torch_import.py``, forward comparison.

Covers the four archs the round-3 review flagged as shape-tested only:

  - TBSRN_TL (FeatureEnhancer 2-D PE + hand-rolled MHA, ``model/tbsrn.py``)
  - HAN (LAM/CSAM holistic attention, ``model/han.py``)
  - RDN_TL (dense blocks + prior-fusion seam, ``model/rdn.py``)
  - RRDBNet_TL / esrgan_tl (RRDB + proj/BN prior seam, ``model/esrgan.py``)

Size quirks honored: TBSRN's FeatureEnhancer hard-codes its positional
encoding at 16x256 (``tbsrn.py:75``), so the reference forward only works
with 4096 spatial tokens — the test runs at LR 16x256.  RDN_TL resizes its
prior to a hard-coded (8, 32) (``rdn.py:188,196``), so its test input is
8x32.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present"
)

# reuse the torchvision stub + sys.path setup
from test_reference_parity import _install_reference, _sd  # noqa: E402

_install_reference()
torch.set_num_threads(1)


def test_tbsrn_block_vs_reference():
    """One RecurrentResidualBlock_TL (conv/bn/mish + FeatureEnhancer with
    the 2-D PE + hand-rolled MHA + conv_proj seam, ``tbsrn.py:380-416``).

    Block-level because the reference full forward is doubly broken off its
    shipped shape: the enhancer PE is hard-coded to 4096 tokens
    (``tbsrn.py:75``) and the prior-fed block list is hard-coded to
    [2..6] (``tbsrn.py:330``), which crashes any srb_nums != 5.  The
    surrounding stem/post/upsample wiring is the TSRN one, covered by
    test_reference_parity.py."""
    from model.tbsrn import RecurrentResidualBlock_TL as RefBlock

    from tatt_tpu.core.torch_import import tbsrn_block_variables
    from tatt_tpu.models.zoo.tbsrn import TBSRNBlock

    torch.manual_seed(10)
    ref = RefBlock(64, text_channels=32).eval()

    rng = np.random.default_rng(10)
    # 16x256: the only spatial size the reference enhancer PE accepts
    x = rng.random((1, 64, 16, 256), dtype=np.float32) - 0.5
    tp = rng.random((1, 32, 16, 256), dtype=np.float32)

    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(tp)).numpy()

    bp, bs = tbsrn_block_variables(_sd(ref))
    model = TBSRNBlock(64, text_channels=32)
    got = np.asarray(
        model.apply({"params": bp, "batch_stats": bs}, x, tp)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_tbsrn_infogen_vs_reference():
    """TBSRN's 128-wide InfoGen deconv stack (``tbsrn.py:230-263``)."""
    from model.tbsrn import InfoGen as RefInfoGen

    from tatt_tpu.core.torch_import import _infogen
    from tatt_tpu.models.zoo.tbsrn import InfoGenTBSRN

    torch.manual_seed(14)
    ref = RefInfoGen(37, 32).eval()
    prior = np.random.default_rng(14).random((2, 37, 1, 26), dtype=np.float32)
    with torch.no_grad():
        want, _z = ref(torch.from_numpy(prior))
    want = want.numpy()

    sd = {f"ig.{k}": v for k, v in _sd(ref).items()}
    p, s = _infogen(sd, "ig")
    got = np.asarray(
        InfoGenTBSRN(32).apply({"params": p, "batch_stats": s}, prior)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_han_vs_reference():
    from model.han import HAN as RefHAN

    from tatt_tpu.core.torch_import import import_han
    from tatt_tpu.models.zoo.han import HAN

    torch.manual_seed(11)
    # the reference ctor hard-codes 10 groups x 20 RCABs x 128 feats
    # (han.py:195-199); a tiny 8x8 input keeps the full model cheap
    ref = RefHAN().eval()
    x = np.random.default_rng(11).random((1, 3, 8, 8), dtype=np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    variables = import_han(_sd(ref))
    got = np.asarray(HAN().apply(variables, x))
    assert got.shape == want.shape == (1, 3, 16, 16)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_rdn_tl_vs_reference():
    from model.rdn import RDN_TL as RefRDN_TL

    from tatt_tpu.core.torch_import import import_rdn_tl
    from tatt_tpu.models.zoo.resnets import RDN_TL

    torch.manual_seed(12)
    ref = RefRDN_TL().eval()
    rng = np.random.default_rng(12)
    # 8x32: the reference interpolates its prior map to a hard-coded
    # (8, 32), so that is the only input size its concat accepts
    x = rng.random((2, 4, 8, 32), dtype=np.float32)
    prior = rng.random((2, 37, 1, 26), dtype=np.float32)
    prior /= prior.sum(1, keepdims=True)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(prior)).numpy()

    variables = import_rdn_tl(_sd(ref))
    got, _aux = RDN_TL().apply(variables, x, prior)
    got = np.asarray(got)
    assert got.shape == want.shape == (2, 4, 16, 64)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_esrgan_tl_vs_reference():
    from model.esrgan import RRDBNet_TL as RefRRDBNet_TL

    from tatt_tpu.core.torch_import import import_esrgan_tl
    from tatt_tpu.models.zoo.esrgan import RRDBNet_TL

    torch.manual_seed(13)
    nb = 2
    ref = RefRRDBNet_TL(
        scale_factor=2, in_nc=4, out_nc=4, nf=64, nb=nb, gc=32,
        text_emb=37, out_text_channels=32,
    ).eval()
    rng = np.random.default_rng(13)
    x = rng.random((2, 4, 16, 64), dtype=np.float32)
    prior = rng.random((2, 37, 1, 26), dtype=np.float32)
    prior /= prior.sum(1, keepdims=True)
    with torch.no_grad():
        want, _w = ref(torch.from_numpy(x), torch.from_numpy(prior))
    want = want.numpy()

    variables = import_esrgan_tl(_sd(ref), nb=nb)
    got, _aux = RRDBNet_TL(nb=nb).apply(variables, x, prior)
    got = np.asarray(got)
    assert got.shape == want.shape == (2, 4, 32, 128)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
