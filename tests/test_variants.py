"""Dataset-variant readers (tatt_tpu/data/variants.py) against synthetic
fixtures mirroring each corpus layout (reference dataset/dataset.py:62-1594)."""

import io
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from tatt_tpu.data import variants
from tatt_tpu.data.create_lmdb import create_dataset
from tatt_tpu.data.lmdb_lite import write_lmdb


def _img(w=64, h=32, color=(120, 40, 200)):
    return Image.new("RGB", (w, h), color)


def test_badset_folder(tmp_path):
    d = tmp_path / "bad"
    d.mkdir()
    _img().save(d / "0001_hello_x.png")
    _img(color=(10, 10, 10)).save(d / "0002_world_y.png")
    ds = variants.BadSetFolderDataset(str(d))
    assert len(ds) == 2
    hr, lr, label = ds[0]
    assert label == "hello"
    assert hr.size == lr.size


def test_ic15_textsr_pgm(tmp_path):
    root = tmp_path / "TRAIN" / "set"
    for sub in ("HR", "LR", "ANNOTATION"):
        (root / sub).mkdir(parents=True)

    def write_pgm(path, arr):
        with open(path, "wb") as fh:
            fh.write(b"P5\n%d %d\n255\n" % (arr.shape[1], arr.shape[0]))
            fh.write(arr.astype(np.uint8).tobytes())

    rng = np.random.default_rng(0)
    for i in range(3):
        write_pgm(root / "HR" / f"train-hr-{i+1:04d}.pgm", rng.integers(0, 255, (32, 128)))
        write_pgm(root / "LR" / f"train-lr-{i+1:04d}.pgm", rng.integers(0, 255, (16, 64)))
        (root / "ANNOTATION" / f"train-annot-{i+1:04d}.txt").write_text(f"word{i}\n")
    ds = variants.IC15TextSRDataset(str(root))
    assert len(ds) == 3
    hr, lr, label = ds[1]
    assert hr.size == (128, 32) and lr.size == (64, 16)
    assert label == "word1"


def test_svt_folder(tmp_path):
    root = tmp_path
    img_dir = root / "svt_test" / "IMG"
    lab_dir = root / "svt_test" / "label"
    img_dir.mkdir(parents=True)
    lab_dir.mkdir(parents=True)
    _img().save(img_dir / "a.jpg")
    (lab_dir / "a.txt").write_text("street\n")
    ds = variants.SVTFolderDataset(str(root), test=True)
    hr, lr, label = ds[0]
    assert label == "street"


def test_csvtr_list(tmp_path):
    (tmp_path / "filter_dir").mkdir()
    _img().save(tmp_path / "filter_dir" / "im1.jpg")
    (tmp_path / "filter_train_test.list").write_text(
        "0\t1\tim1.jpg\t中文\n"
    )
    ds = variants.CSVTRDataset(str(tmp_path))
    hr, lr, label = ds[0]
    assert label == "中文"  # Chinese labels pass through unfiltered


def test_cocotext(tmp_path):
    (tmp_path / "train_words").mkdir()
    _img().save(tmp_path / "train_words" / "img7.jpg")
    (tmp_path / "train_words_gt.txt").write_text("img7,caption\nbroken\n")
    ds = variants.COCOTextDataset(str(tmp_path))
    hr, lr, label = ds[0]
    assert label == "caption"
    # broken line skips forward (wraps to the valid record)
    hr2, _, label2 = ds[1]
    assert label2 == "caption"


def test_chn_syn_pkl(tmp_path):
    rng = np.random.default_rng(3)
    Image.fromarray(
        rng.integers(0, 255, (32, 64, 3), dtype=np.uint8)
    ).save(tmp_path / "k1.jpg")
    with open(tmp_path / "db.pkl", "wb") as fh:
        pickle.dump({"k1": "hanzi"}, fh)
    ds = variants.CHNSynPklDataset(str(tmp_path), voc_type="all")
    hr, lr, label = ds[0]
    assert label == "hanzi"
    # LR is a blurred copy, not identical
    assert not np.array_equal(np.asarray(hr), np.asarray(lr))


@pytest.fixture()
def textzoom_lmdb(tmp_path):
    root = str(tmp_path / "tz")
    samples = [
        (_img(128, 32, (30 * i, 80, 90)), _img(64, 16, (30 * i, 80, 90)), f"word{i}")
        for i in range(5)
    ]
    create_dataset(root, samples)
    return root


def test_distorted_subset(textzoom_lmdb, tmp_path):
    picked = tmp_path / "easy_distorted.txt"
    picked.write_text("2\n4\n")
    ds = variants.DistortedSubsetDataset(textzoom_lmdb, str(picked))
    assert len(ds) == 2
    hr, lr, label = ds[0]
    assert label == "word1"  # picked index 2 is the second (1-based) record


def test_masked_lmdb(textzoom_lmdb):
    ds = variants.MaskedLmdbDataset(textzoom_lmdb)
    hr, lr, label, wmask = ds[0]
    assert wmask.shape == (hr.height, hr.width)
    assert wmask.min() >= 0.4 - 1e-6 and wmask.max() <= 0.9 + 1e-6


def test_w2v_lmdb(textzoom_lmdb):
    ds = variants.W2VLmdbDataset(
        textzoom_lmdb, embed_fn=lambda w: np.full(300, len(w), np.float32)
    )
    hr, lr, label, vec = ds[0]
    assert vec.shape == (300,)
    with pytest.raises(ValueError, match="embed_fn"):
        variants.W2VLmdbDataset(textzoom_lmdb)


def test_ic15_recognition_sr(tmp_path):
    root = str(tmp_path / "ic15")
    records = {b"num-samples": b"2"}
    for i in (1, 2):
        buf = io.BytesIO()
        _img().save(buf, format="PNG")
        records[b"image-%09d" % i] = buf.getvalue()
        records[b"label-%09d" % i] = b"ictext"
    write_lmdb(root, records)
    ds = variants.IC15RecognitionSRDataset(root)
    hr, lr, label = ds[0]
    assert label == "ictext"
    assert hr.size == lr.size


def test_globalsr_synthtext(tmp_path):
    from scipy.io import savemat

    img_dir = tmp_path
    img = Image.new("RGB", (200, 100), (255, 255, 255))
    img.save(img_dir / "scene.jpg")
    # one word box covering (10,10)-(90,40)
    bb = np.array(
        [[[10.0], [90.0], [90.0], [10.0]], [[10.0], [10.0], [40.0], [40.0]]]
    )  # [2, 4, 1]
    gt = {
        "imnames": np.array([[np.array(["scene.jpg"])]], dtype=object),
        "wordBB": np.array([[bb]], dtype=object),
        "txt": np.array([[np.array(["hello"])]], dtype=object),
    }
    savemat(tmp_path / "gt.mat", gt)
    ds = variants.GlobalSRDataset(str(tmp_path))
    assert len(ds) == 1
    hr, lr, label = ds[0]
    assert label == "hello"
