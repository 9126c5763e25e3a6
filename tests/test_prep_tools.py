import numpy as np
from PIL import Image

from tatt_tpu.data.prep_tools import (
    VocFolderDataset,
    iter_synthtext_crops,
    synthtext_to_lmdb,
    word_rects,
)


def _fake_synthtext(tmp_path):
    from scipy.io import savemat

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.new("RGB", (200, 100), (120, 120, 120)).save(img_dir / "a.jpg")
    # two word boxes
    word_bb = np.zeros((2, 4, 2))
    word_bb[:, :, 0] = [[10, 60, 60, 10], [10, 10, 40, 40]]
    word_bb[:, :, 1] = [[80, 150, 150, 80], [20, 20, 60, 60]]
    gt = {
        "imnames": np.array([[np.array(["a.jpg"])]], dtype=object),
        "wordBB": np.array([[word_bb]], dtype=object),
        "txt": np.array([[np.array(["hello  world"])]], dtype=object),
    }
    savemat(tmp_path / "gt.mat", gt)
    return str(tmp_path / "gt.mat"), str(img_dir)


def test_word_rects():
    bb = np.zeros((2, 4))
    bb[0] = [1, 9, 9, 1]
    bb[1] = [2, 2, 8, 8]
    assert word_rects(bb) == [(1, 2, 9, 8)]


def test_synthtext_crops_and_lmdb(tmp_path):
    gt_path, img_root = _fake_synthtext(tmp_path)
    crops = list(iter_synthtext_crops(gt_path, img_root))
    assert [c[1] for c in crops] == ["hello", "world"]
    assert crops[0][0].size == (50, 30)

    n = synthtext_to_lmdb(gt_path, img_root, str(tmp_path / "out"))
    assert n == 2
    from tatt_tpu.data.lmdb_dataset import LmdbTextDataset

    ds = LmdbTextDataset(str(tmp_path / "out"))
    hr, lr, label = ds[0]
    assert label == "hello" and lr.size == (hr.width // 2, hr.height // 2)


def test_voc_folder(tmp_path):
    Image.new("RGB", (30, 10)).save(tmp_path / "word1.jpg")
    (tmp_path / "word1.txt").write_text("theword\n")
    ds = VocFolderDataset(str(tmp_path))
    img, label = ds[0]
    assert label == "theword" and img.size == (30, 10)
