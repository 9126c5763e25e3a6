"""Cross-framework EVAL-PROTOCOL parity (VERDICT r2 Missing #1 / Next #1).

Round-2 proved module-level forward parity; this harness proves the
*reported numbers* match: the reference's own ``TextSR.eval()``
(``/root/reference/interfaces/super_resolution.py:1203-1700``, CPU torch)
and our ``Trainer.evaluate`` are run on the SAME weights and the SAME
fixture LMDB, and the metric dicts they return are compared —
PSNR within 0.01 dB, SSIM within 0.001, accuracies equal, decoded
strings identical on shared inputs.  This covers everything module
parity cannot: judge preprocessing (bicubic-to-32x100 luma, x2-1 ASTER
norm), CTC-collapse/EOS/'$'-cut decode edge cases, per-batch metric
aggregation order, and the eval-collate quirks.

The reference's import surface needs stand-ins for libraries absent
here (lmdb, imgaug, lpips, pyfasttext, thop, ptflops, editdistance).
The lmdb shim is backed by our own native LmdbEnv — so the reference
stack reading our fixture is itself another format cross-check.
"""

import os
import string
import sys
import types
from argparse import Namespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present"
)

torch.set_num_threads(1)


# ----------------------------------------------------------------------
# stubs for the reference's import surface
# ----------------------------------------------------------------------


class _AttrDict(dict):
    __getattr__ = dict.__getitem__

    def __setattr__(self, k, v):
        self[k] = v


def _wrap(obj):
    if isinstance(obj, dict):
        return _AttrDict({k: _wrap(v) for k, v in obj.items()})
    return obj


def _install_reference():
    if "torchvision.datasets" not in sys.modules:
        _tv = sys.modules.get("torchvision") or types.ModuleType("torchvision")
        _tr = types.ModuleType("torchvision.transforms")
        _tm = types.ModuleType("torchvision.models")
        _tmv = types.ModuleType("torchvision.models.vgg")
        _td = types.ModuleType("torchvision.datasets")
        _tu = types.ModuleType("torchvision.utils")
        class _ToTensor:
            """Faithful torchvision ToTensor: PIL -> [C,H,W] float / 255."""

            def __call__(self, pic):
                arr = np.array(pic, np.uint8)
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                return (
                    torch.from_numpy(arr.transpose(2, 0, 1).copy())
                    .float()
                    .div(255.0)
                )

        class _ToPILImage:
            """Faithful-enough ToPILImage for MORN's debug viz path."""

            def __call__(self, t):
                from PIL import Image as _Image

                arr = (t.detach().numpy() * 255.0).clip(0, 255).astype("uint8")
                if arr.ndim == 3:
                    arr = arr.transpose(1, 2, 0)
                    if arr.shape[2] == 1:
                        arr = arr[:, :, 0]
                return _Image.fromarray(arr)

        _tr.ToTensor = _ToTensor
        _tr.ToPILImage = _ToPILImage
        _tr.Compose = object
        _tu.make_grid = lambda *a, **k: None
        _tmv.vgg16 = lambda *a, **k: None
        _tm.vgg = _tmv
        _tv.transforms = _tr
        _tv.models = _tm
        _tv.datasets = _td
        _tv.utils = _tu
        # mark as packages so `import torchvision.X.Y` submodule imports work
        _tv.__path__ = []
        _tm.__path__ = []
        sys.modules["torchvision"] = _tv
        sys.modules["torchvision.transforms"] = _tr
        sys.modules["torchvision.models"] = _tm
        sys.modules["torchvision.models.vgg"] = _tmv
        sys.modules["torchvision.datasets"] = _td
        sys.modules["torchvision.utils"] = _tu

    if "lmdb" not in sys.modules:
        from tatt_tpu.data.lmdb_lite import LmdbEnv

        class _Txn:
            def __init__(self, env):
                self._env = env

            def get(self, key):
                return self._env.get(bytes(key))

            def __enter__(self):
                return self

            def __exit__(self, *exc):
                return False

        class _Env:
            def __init__(self, root):
                self._env = LmdbEnv(root)

            def begin(self, write=False):
                return _Txn(self._env)

        _lmdb = types.ModuleType("lmdb")
        _lmdb.open = lambda root, **kw: _Env(root)
        sys.modules["lmdb"] = _lmdb

    if "imgaug" not in sys.modules:
        _ia = types.ModuleType("imgaug")
        _iaa = types.ModuleType("imgaug.augmenters")

        class _Aug:
            def __init__(self, *a, **k):
                pass

            def __call__(self, images=None, **k):
                return images

        for name in [
            "GaussianBlur", "AverageBlur", "MedianBlur", "BilateralBlur",
            "MotionBlur", "MeanShiftBlur", "Superpixels", "Sometimes",
            "Sequential",
        ]:
            setattr(_iaa, name, _Aug)
        _ia.augmenters = _iaa
        sys.modules["imgaug"] = _ia
        sys.modules["imgaug.augmenters"] = _iaa

    if "pyfasttext" not in sys.modules:
        _pf = types.ModuleType("pyfasttext")
        _pf.FastText = object
        sys.modules["pyfasttext"] = _pf

    if "colour" not in sys.modules:
        # MORN's debug branch (morn.py:91-100) builds a color ramp for its
        # demo image; the ramp never touches the predictions
        _co = types.ModuleType("colour")

        class _Color:
            rgb = (0.0, 0.0, 0.0)

            def __init__(self, *a, **k):
                pass

            def range_to(self, other, n):
                return [_Color() for _ in range(n)]

        _co.Color = _Color
        sys.modules["colour"] = _co

    if "lpips" not in sys.modules:
        _lp = types.ModuleType("lpips")

        class _LPIPS:
            def __init__(self, *a, **k):
                pass

            def __call__(self, a, b):
                return torch.zeros(a.shape[0], 1, 1, 1)

        _lp.LPIPS = _LPIPS
        sys.modules["lpips"] = _lp

    if "thop" not in sys.modules:
        _th = types.ModuleType("thop")
        _th.profile = lambda *a, **k: (0, 0)
        sys.modules["thop"] = _th

    if "ptflops" not in sys.modules:
        _pt = types.ModuleType("ptflops")
        _pt.get_model_complexity_info = lambda *a, **k: ("0", "0")
        sys.modules["ptflops"] = _pt

    if "editdistance" not in sys.modules:
        from tatt_tpu.core.charset import levenshtein

        _ed = types.ModuleType("editdistance")
        _ed.eval = lambda a, b: levenshtein(a, b)
        sys.modules["editdistance"] = _ed

    # the reference targets py3.6: collections.Iterable moved to
    # collections.abc in 3.10 (used by utils_moran.encode)
    import collections
    import collections.abc

    for alias in ("Iterable", "Mapping", "Sequence"):
        if not hasattr(collections, alias):
            setattr(collections, alias, getattr(collections.abc, alias))

    # the reference's vendored KAIR utils use pre-1.x scipy aliases that
    # modern scipy removed (scipy.finfo at utils_deblur.py:494, hit at
    # dataset.py import time via the module-level fspecial kernel)
    import scipy

    for alias in ("finfo", "float64", "float32", "int32", "pi"):
        if not hasattr(scipy, alias):
            setattr(scipy, alias, getattr(np, alias))

    if REF not in sys.path:
        sys.path.insert(0, REF)


_install_reference()


# ----------------------------------------------------------------------
# fixture LMDB (written by OUR native writer; read by both stacks)
# ----------------------------------------------------------------------


def _build_fixture(root: str, n: int) -> None:
    import io

    from tatt_tpu.data.lmdb_lite import write_lmdb
    from tatt_tpu.data.synthetic import SyntheticTextDataset

    ds = SyntheticTextDataset(n=n, seed=11)
    recs = {b"num-samples": str(n).encode()}
    for i in range(n):
        hr, lr, label = ds[i]
        bh, bl = io.BytesIO(), io.BytesIO()
        hr.save(bh, format="PNG")  # lossless: both stacks see equal pixels
        lr.save(bl, format="PNG")
        recs[b"image_hr-%09d" % (i + 1)] = bh.getvalue()
        recs[b"image_lr-%09d" % (i + 1)] = bl.getvalue()
        recs[b"label-%09d" % (i + 1)] = label.encode()
    write_lmdb(root, recs)


# ----------------------------------------------------------------------
# reference-side construction
# ----------------------------------------------------------------------

SRB_NUMS = 2  # small generator keeps CPU runtime sane; still the full stack


def _ref_args(test_model: str) -> Namespace:
    return Namespace(
        arch="tatt", test_model=test_model, syn=False, mixed=False,
        y_domain=False, stu_iter=1, sr_share=True, tpg_share=False,
        for_cascading=False, CHNSR=False, tpg="CRNN", mask=True,
        resume="ckpt/parity/x", batch_size=16, rotate_train=0.0,
        go_test=True, use_label=False, use_distill=True, random_reso=False,
        vis_dir="parity", test_data_dir=None, badset=False,
        learning_STN=False, gradient=True, ssim_loss=False, tssim_loss=False,
        prob_insert=1.0, results_rotate=False, rec="crnn",
    )


def _make_ref_sr(test_model: str, tmp_path, monkeypatch):
    """A TextSR instance pointed at a CWD that holds al_chinese.txt."""
    import shutil

    import yaml

    # TextBase + collate + get_string_crnn open al_chinese.txt CWD-relative
    shutil.copy(
        os.path.join(REF, "al_chinese.txt"),
        os.path.join(tmp_path, "al_chinese.txt"),
    )
    monkeypatch.chdir(tmp_path)

    with open(os.path.join(REF, "config", "super_resolution.yaml")) as fh:
        config = _wrap(yaml.safe_load(fh))

    from interfaces.super_resolution import TextSR

    return TextSR(config, _ref_args(test_model), None)


def _ref_eval(sr_obj, fixture_root, gen_sd, crnn_sd, judge):
    """Run the reference's own eval() and return its metric_dict."""
    from dataset.dataset import alignCollate_realWTL, lmdbDataset_real
    from interfaces.base import AsterInfo
    from model.crnn.crnn import CRNN as RefCRNN
    from model.tsrn import TSRN_TL_TRANS

    ds = lmdbDataset_real(root=fixture_root, voc_type="all", test=True)
    loader = torch.utils.data.DataLoader(
        ds,
        batch_size=16,
        shuffle=False,
        num_workers=0,
        collate_fn=alignCollate_realWTL(
            imgH=32, imgW=128, down_sample_scale=2, mask=True, train=False
        ),
        drop_last=False,
    )

    gen = TSRN_TL_TRANS(
        scale_factor=2, width=128, height=32, STN=True,
        srb_nums=SRB_NUMS, mask=True, hidden_units=32,
    )
    gen.load_state_dict({k: torch.from_numpy(v) for k, v in gen_sd.items()})
    gen.eval()
    for p in gen.parameters():
        p.requires_grad = False

    student = RefCRNN(32, 1, 37, 256)
    student.load_state_dict({k: torch.from_numpy(v) for k, v in crnn_sd.items()})
    student.eval()

    aster_info = AsterInfo("all")
    with torch.no_grad():
        return sr_obj.eval(
            [gen], loader, None, 0, [judge, [student], student], aster_info,
            data_name="fixture",
        )


def _sd(module) -> dict:
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


# ----------------------------------------------------------------------
# our-side construction
# ----------------------------------------------------------------------


def _our_eval(
    fixture_root, gen_sd, crnn_sd, test_model, judge_vars=None, judge_crnn=None
):
    """Run OUR Trainer.evaluate on the identical weights + data."""
    import jax

    from tatt_tpu.core.config import Config
    from tatt_tpu.core.torch_import import import_crnn, import_tatt
    from tatt_tpu.data.lmdb_dataset import LmdbTextDataset
    from tatt_tpu.train.loop import Trainer

    cfg = Config()
    cfg.args.arch = "tatt"
    cfg.args.mask = True
    cfg.args.STN = True
    cfg.args.batch_size = 16
    cfg.TRAIN.batch_size = 16
    cfg.args.val_batch_size = 16
    cfg.TRAIN.voc_type = "all"
    cfg.args.log_dir = ""
    cfg.args.test_model = test_model
    cfg.TRAIN.VAL.valInterval = 0
    cfg.MODEL.srb_nums = SRB_NUMS
    cfg.args.srb = SRB_NUMS
    # bit-faithful query-GRU mode: required for reference checkpoints
    cfg.MODEL.query_gru_mode = "reference"

    ds = LmdbTextDataset(fixture_root, voc_type="all", test=True)
    trainer = Trainer(
        cfg,
        ds,
        teacher_variables=import_crnn(crnn_sd),
        judge_variables=judge_vars,
        judge_crnn=judge_crnn,
    )
    gen_vars = import_tatt(gen_sd, srb_nums=SRB_NUMS)
    trainer.state = trainer.state.replace(
        sr_params=(gen_vars["params"],),
        sr_batch_stats=(gen_vars.get("batch_stats", {}),),
    )
    return trainer, trainer.evaluate(ds, batch_size=16)


def _compare(ref_metrics, ours, n_samples):
    ref_psnr = float(ref_metrics["psnr_avg"])
    ref_ssim = float(ref_metrics["ssim_avg"])
    assert abs(ours["psnr_avg"] - ref_psnr) <= 0.01, (
        f"PSNR: ours {ours['psnr_avg']:.4f} vs ref {ref_psnr:.4f}"
    )
    assert abs(ours["ssim_avg"] - ref_ssim) <= 0.001, (
        f"SSIM: ours {ours['ssim_avg']:.5f} vs ref {ref_ssim:.5f}"
    )
    # LR-baseline aggregation parity
    ref_psnr_lr = float(sum(ref_metrics["psnr_lr"]) / len(ref_metrics["psnr_lr"]))
    ref_ssim_lr = float(sum(ref_metrics["ssim_lr"]) / len(ref_metrics["ssim_lr"]))
    assert abs(ours["psnr_avg_lr"] - ref_psnr_lr) <= 0.01
    assert abs(ours["ssim_avg_lr"] - ref_ssim_lr) <= 0.001
    # accuracy: identical decision per image (reference rounds to 4 places)
    assert abs(ours["accuracy"] - float(ref_metrics["accuracy"])) < 0.5 / n_samples


# ----------------------------------------------------------------------
# tests
# ----------------------------------------------------------------------

N_CRNN = 32


def test_eval_protocol_parity_crnn(tmp_path, monkeypatch):
    from utils.metrics import get_string_crnn

    fixture = str(tmp_path / "fixture")
    _build_fixture(fixture, N_CRNN)

    sr_obj = _make_ref_sr("CRNN", tmp_path, monkeypatch)

    from model.crnn.crnn import CRNN as RefCRNN

    torch.manual_seed(7)
    crnn = RefCRNN(32, 1, 37, 256).eval()
    crnn_sd = _sd(crnn)

    from model.tsrn import TSRN_TL_TRANS

    torch.manual_seed(8)
    gen_sd = _sd(
        TSRN_TL_TRANS(
            scale_factor=2, width=128, height=32, STN=True,
            srb_nums=SRB_NUMS, mask=True, hidden_units=32,
        )
    )

    judge = {
        "model": crnn,
        "data_in_fn": sr_obj.parse_crnn_data,
        "string_process": get_string_crnn,
    }
    ref_metrics = _ref_eval(sr_obj, fixture, gen_sd, crnn_sd, judge)
    trainer, ours = _our_eval(fixture, gen_sd, crnn_sd, "CRNN")
    _compare(ref_metrics, ours, N_CRNN)

    # decode-protocol parity on IDENTICAL inputs: judge both stacks on the
    # same HR batch; preprocessing + CTC collapse must agree string-for-string
    from tatt_tpu.data.collate import collate

    from tatt_tpu.data.lmdb_dataset import LmdbTextDataset

    ds = LmdbTextDataset(fixture, voc_type="all", test=True)
    batch = collate([ds[i] for i in range(16)])
    hr = batch.images_hr
    with torch.no_grad():
        ref_strings = get_string_crnn(
            crnn(sr_obj.parse_crnn_data(torch.from_numpy(hr[:, :3]))), False
        )
    our_strings = trainer._judge_fn(hr)
    assert our_strings == list(ref_strings), (
        f"decode mismatch: {our_strings} vs {list(ref_strings)}"
    )


N_HARD = 16  # ASTER/MORAN are heavier on CPU


def test_eval_protocol_parity_aster(tmp_path, monkeypatch):
    from model.recognizer.recognizer_builder import RecognizerBuilder
    from utils.metrics import get_string_aster

    # reference decoder hard-codes .cuda() on intermediates
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)

    fixture = str(tmp_path / "fixture")
    _build_fixture(fixture, N_HARD)

    sr_obj = _make_ref_sr("ASTER", tmp_path, monkeypatch)

    from interfaces.base import AsterInfo

    info = AsterInfo("all")
    torch.manual_seed(9)
    aster = RecognizerBuilder(
        arch="ResNet_ASTER", rec_num_classes=info.rec_num_classes,
        sDim=512, attDim=512, max_len_labels=info.max_len,
        eos=info.char2id[info.EOS], STN_ON=True,
    ).eval()
    aster_sd = _sd(aster)

    from model.crnn.crnn import CRNN as RefCRNN
    from model.tsrn import TSRN_TL_TRANS

    torch.manual_seed(10)
    crnn_sd = _sd(RefCRNN(32, 1, 37, 256))
    torch.manual_seed(11)
    gen_sd = _sd(
        TSRN_TL_TRANS(
            scale_factor=2, width=128, height=32, STN=True,
            srb_nums=SRB_NUMS, mask=True, hidden_units=32,
        )
    )

    judge = {
        "model": aster,
        "data_in_fn": sr_obj.parse_aster_data,
        "string_process": get_string_aster,
    }
    ref_metrics = _ref_eval(sr_obj, fixture, gen_sd, crnn_sd, judge)

    from tatt_tpu.core.torch_import import import_aster

    trainer, ours = _our_eval(
        fixture, gen_sd, crnn_sd, "ASTER", judge_vars=import_aster(aster_sd)
    )
    _compare(ref_metrics, ours, N_HARD)


def test_eval_protocol_parity_moran(tmp_path, monkeypatch):
    from model.moran.moran import MORAN as RefMORAN
    from utils.metrics import get_string_crnn

    fixture = str(tmp_path / "fixture")
    _build_fixture(fixture, N_HARD)

    sr_obj = _make_ref_sr("MORAN", tmp_path, monkeypatch)

    torch.manual_seed(12)
    moran = RefMORAN(
        1, 37, 256, 32, 100, BidirDecoder=True,
        inputDataType="torch.FloatTensor", CUDA=False,
    ).eval()
    moran_sd = _sd(moran)

    from model.crnn.crnn import CRNN as RefCRNN
    from model.tsrn import TSRN_TL_TRANS

    torch.manual_seed(13)
    crnn_sd = _sd(RefCRNN(32, 1, 37, 256))
    torch.manual_seed(14)
    gen_sd = _sd(
        TSRN_TL_TRANS(
            scale_factor=2, width=128, height=32, STN=True,
            srb_nums=SRB_NUMS, mask=True, hidden_units=32,
        )
    )

    judge = {
        "model": moran,
        "data_in_fn": sr_obj.parse_moran_data,
        "string_process": get_string_crnn,
    }
    ref_metrics = _ref_eval(sr_obj, fixture, gen_sd, crnn_sd, judge)

    import jax
    import jax.numpy as jnp

    from tatt_tpu.core.torch_import import import_moran

    moran_vars = jax.tree.map(jnp.asarray, import_moran(moran_sd))
    trainer, ours = _our_eval(
        fixture, gen_sd, crnn_sd, "MORAN", judge_vars=moran_vars
    )
    _compare(ref_metrics, ours, N_HARD)


# ----------------------------------------------------------------------
# trained-judge parity (VERDICT r3 Missing #1): the same protocol, but the
# judge is the in-repo-pretrained fixture CRNN — decode parity on
# MEANINGFUL strings, and the accuracy numbers both stacks report are
# nonzero and equal
# ----------------------------------------------------------------------

JUDGE_ASSET = os.path.join(os.path.dirname(__file__), "assets", "fixture_crnn.npz")


def _torch_compact_crnn(nh: int, nm, nclass: int = 37):
    """The reference CRNN conv plan (``model/crnn/crnn.py:29-92``) with
    parameterized channel widths, so the compact fixture judge trained on
    TPU can be materialized as a torch module via ``export_crnn``."""
    import torch.nn as nn

    from model.crnn.crnn import BidirectionalLSTM

    ks = [3, 3, 3, 3, 3, 3, 2]
    ps = [1, 1, 1, 1, 1, 1, 0]
    cnn = nn.Sequential()

    def convRelu(i, bn=False):
        n_in = 1 if i == 0 else nm[i - 1]
        cnn.add_module(f"conv{i}", nn.Conv2d(n_in, nm[i], ks[i], 1, ps[i]))
        if bn:
            cnn.add_module(f"batchnorm{i}", nn.BatchNorm2d(nm[i]))
        cnn.add_module(f"relu{i}", nn.ReLU(True))

    convRelu(0)
    cnn.add_module("pooling0", nn.MaxPool2d(2, 2))
    convRelu(1)
    cnn.add_module("pooling1", nn.MaxPool2d(2, 2))
    convRelu(2, True)
    convRelu(3)
    cnn.add_module("pooling2", nn.MaxPool2d((2, 2), (2, 1), (0, 1)))
    convRelu(4, True)
    convRelu(5)
    cnn.add_module("pooling3", nn.MaxPool2d((2, 2), (2, 1), (0, 1)))
    convRelu(6, True)

    class CompactCRNN(nn.Module):
        def __init__(self):
            super().__init__()
            self.cnn = cnn
            self.rnn = nn.Sequential(
                BidirectionalLSTM(nm[6], nh, nh),
                BidirectionalLSTM(nh, nh, nclass),
            )

        def forward(self, x):
            conv = self.cnn(x)
            b, c, h, w = conv.size()
            assert h == 1
            return self.rnn(conv.squeeze(2).permute(2, 0, 1))

    return CompactCRNN()


@pytest.mark.skipif(
    not os.path.exists(JUDGE_ASSET), reason="fixture judge asset not trained yet"
)
def test_eval_protocol_parity_trained_judge(tmp_path, monkeypatch):
    from utils.metrics import get_string_crnn

    from tatt_tpu.core.checkpoint import load_variables_npz
    from tatt_tpu.core.torch_export import export_crnn
    from tatt_tpu.models.recognizers.crnn import CRNN as OurCRNN

    variables, meta = load_variables_npz(JUDGE_ASSET)
    nh, nm = int(meta["nh"]), tuple(int(v) for v in meta["nm"])
    our_judge = OurCRNN(nh=nh, nm=nm)

    torch_judge = _torch_compact_crnn(nh, nm)
    torch_judge.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in export_crnn(variables).items()}
    )
    torch_judge.eval()

    # module-level forward parity through the exporter (layout check)
    x = np.random.default_rng(0).uniform(size=(4, 1, 32, 100)).astype(np.float32)
    with torch.no_grad():
        ref_logits = torch_judge(torch.from_numpy(x)).numpy()
    import jax.numpy as jnp

    our_logits = np.asarray(our_judge.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(our_logits, ref_logits, atol=2e-4)

    fixture = str(tmp_path / "fixture")
    _build_fixture(fixture, N_CRNN)
    sr_obj = _make_ref_sr("CRNN", tmp_path, monkeypatch)

    from model.crnn.crnn import CRNN as RefCRNN
    from model.tsrn import TSRN_TL_TRANS

    torch.manual_seed(7)
    crnn_sd = _sd(RefCRNN(32, 1, 37, 256))
    torch.manual_seed(8)
    gen_sd = _sd(
        TSRN_TL_TRANS(
            scale_factor=2, width=128, height=32, STN=True,
            srb_nums=SRB_NUMS, mask=True, hidden_units=32,
        )
    )

    judge = {
        "model": torch_judge,
        "data_in_fn": sr_obj.parse_crnn_data,
        "string_process": get_string_crnn,
    }
    ref_metrics = _ref_eval(sr_obj, fixture, gen_sd, crnn_sd, judge)
    trainer, ours = _our_eval(
        fixture, gen_sd, crnn_sd, "CRNN",
        judge_vars=variables, judge_crnn=our_judge,
    )
    _compare(ref_metrics, ours, N_CRNN)

    # decode parity on MEANINGFUL strings: both stacks read the clean HR
    # batch, string-for-string equal AND mostly equal to the ground truth
    from tatt_tpu.core.charset import str_filt
    from tatt_tpu.data.collate import collate
    from tatt_tpu.data.lmdb_dataset import LmdbTextDataset

    ds = LmdbTextDataset(fixture, voc_type="all", test=True)
    items = [ds[i] for i in range(16)]
    batch = collate(items)
    hr = batch.images_hr
    with torch.no_grad():
        ref_strings = get_string_crnn(
            torch_judge(sr_obj.parse_crnn_data(torch.from_numpy(hr[:, :3]))), False
        )
    our_strings = trainer._judge_fn(hr)
    assert our_strings == list(ref_strings)
    hits = sum(
        str_filt(p, "lower") == str_filt(lab, "lower")
        for p, lab in zip(our_strings, [it[2] for it in items])
    )
    assert hits >= 12, f"trained judge reads only {hits}/16 HR crops: {our_strings}"
