"""Dataset-variant readers — the reference's long tail of corpora.

Rebuilds the reader classes in ``dataset/dataset.py`` beyond the TextZoom
default (``lmdbDataset_real``), normalized to the framework's sample
protocol: each ``__getitem__`` returns ``(img_hr, img_lr, label)`` PIL
triples consumable by :func:`tatt_tpu.data.collate.collate` (the reference
variants that additionally return YUV copies are covered because the
collate re-derives YUV deterministically under ``y_domain``).

| Class here                | Reference (dataset/dataset.py)       |
|---------------------------|--------------------------------------|
| BadSetFolderDataset       | lmdbDataset_realBadSet:62            |
| GlobalSRDataset           | lmdbDataset_GlobalSR:379 (+ get_Syn_800K_with_words:173) |
| DistortedSubsetDataset    | lmdbDataset_realDistorted:689        |
| CHNSynPklDataset          | lmdbDataset_realCHNSyn:821           |
| IC15TextSRDataset         | lmdbDataset_realIC15TextSR:877       |
| SVTFolderDataset          | lmdbDataset_realSVT:967              |
| IC15RecognitionSRDataset  | lmdbDataset_realIC15:1023            |
| CSVTRDataset              | lmdbDataset_CSVTR:1118               |
| COCOTextDataset           | lmdbDataset_realCOCOText:1160        |
| W2VLmdbDataset            | lmdbDatasetWithW2V_real:1209         |
| MaskedLmdbDataset         | lmdbDatasetWithMask_real:1538        |
"""

from __future__ import annotations

import os
import re
from typing import Callable, Optional

import numpy as np
from PIL import Image

from tatt_tpu.core.charset import str_filt
from tatt_tpu.data.lmdb_dataset import LmdbTextDataset, buf2pil
from tatt_tpu.data.lmdb_lite import LmdbEnv


class BadSetFolderDataset:
    """Folder of hard-case images, label parsed from the filename
    (``name_label_*.png``); LR = HR copy (``dataset.py:62-126``)."""

    def __init__(self, root: str, voc_type: str = "all", test: bool = False):
        self.root = root
        self.imlist = sorted(os.listdir(root))
        self.voc_type = voc_type
        self.test = test

    def __len__(self) -> int:
        return len(self.imlist)

    def __getitem__(self, index: int):
        imfile = self.imlist[index % len(self.imlist)]
        parts = imfile.split("_")
        word = parts[1] if len(parts) > 1 else ""
        try:
            img_hr = Image.open(os.path.join(self.root, imfile)).convert("RGB")
            if img_hr.width < 2 or img_hr.height < 2:
                return self[(index + 1) % len(self)]
        except (OSError, ValueError):
            return self[(index + 1) % len(self)]
        return img_hr, img_hr.copy(), str_filt(word, self.voc_type)


def read_pgm(filename: str) -> np.ndarray:
    """Raw PGM (P5) reader (``dataset.py:912-934``)."""
    with open(filename, "rb") as fh:
        buf = fh.read()
    m = re.search(
        rb"(^P5\s(?:\s*#.*[\r\n])*"
        rb"(\d+)\s(?:\s*#.*[\r\n])*"
        rb"(\d+)\s(?:\s*#.*[\r\n])*"
        rb"(\d+)\s(?:\s*#.*[\r\n]\s)*)",
        buf,
    )
    if m is None:
        raise ValueError(f"not a raw PGM file: {filename}")
    header, width, height, maxval = m.groups()
    dtype = "u1" if int(maxval) < 256 else "<u2"
    return np.frombuffer(
        buf, dtype=dtype, count=int(width) * int(height), offset=len(header)
    ).reshape((int(height), int(width)))


class IC15TextSRDataset:
    """IC15 TextSR pairs: HR/LR/ANNOTATION dirs of .pgm crops + txt labels
    (``dataset.py:877-964``); split inferred from the parent dir name."""

    def __init__(self, root: str, voc_type: str = "all", test: bool = False):
        mode = "train" if os.path.basename(os.path.dirname(root.rstrip("/"))) == "TRAIN" else "test"
        hr_dir = os.path.join(root, "HR")
        n = len(os.listdir(hr_dir))
        self.hr_paths = [
            os.path.join(hr_dir, f"{mode}-hr-{i+1:04d}.pgm") for i in range(n)
        ]
        self.lr_paths = [
            os.path.join(root, "LR", f"{mode}-lr-{i+1:04d}.pgm") for i in range(n)
        ]
        self.anno_paths = [
            os.path.join(root, "ANNOTATION", f"{mode}-annot-{i+1:04d}.txt")
            for i in range(n)
        ]
        self.voc_type = voc_type

    def __len__(self) -> int:
        return len(self.anno_paths)

    def __getitem__(self, index: int):
        idx = index % len(self)
        try:
            hr = read_pgm(self.hr_paths[idx]).astype(np.uint8)
            lr = read_pgm(self.lr_paths[idx]).astype(np.uint8)
            with open(self.anno_paths[idx]) as fh:
                label = fh.readlines()[0].strip()
        except (OSError, ValueError, IndexError):
            return self[(index + 1) % len(self)]
        img_hr = Image.fromarray(np.repeat(hr[..., None], 3, axis=-1))
        img_lr = Image.fromarray(np.repeat(lr[..., None], 3, axis=-1))
        return img_hr, img_lr, str_filt(label, self.voc_type)


class SVTFolderDataset:
    """SVT word crops: ``svt_{train,test}/IMG/*.jpg`` + ``label/*.txt``
    (``dataset.py:967-1020``); LR = HR."""

    def __init__(self, root: str, voc_type: str = "all", test: bool = False):
        split = "svt_test" if test else "svt_train"
        self.image_dir = os.path.join(root, split, "IMG")
        self.anno_dir = os.path.join(root, split, "label")
        self.anno_list = sorted(os.listdir(self.anno_dir))
        self.voc_type = voc_type

    def __len__(self) -> int:
        return len(self.anno_list)

    def __getitem__(self, index: int):
        anno = self.anno_list[index % len(self)]
        image_path = os.path.join(
            self.image_dir, anno.split(".")[0] + ".jpg"
        )
        try:
            with open(os.path.join(self.anno_dir, anno)) as fh:
                word = fh.readlines()[0].strip()
            img_hr = Image.open(image_path).convert("RGB")
        except (OSError, ValueError, IndexError):
            return self[(index + 1) % len(self)]
        return img_hr, img_hr.copy(), str_filt(word, self.voc_type)


class IC15RecognitionSRDataset:
    """Recognition LMDB (``image-%09d`` keys) used as an SR corpus with
    LR = HR (``lmdbDataset_realIC15``, ``dataset.py:1023-1115``); crops
    smaller than 4px are skipped."""

    def __init__(self, root: str, voc_type: str = "all", max_len: int = 100, test: bool = False):
        self.env = LmdbEnv(root)
        n = self.env.get(b"num-samples")
        if n is None:
            raise IOError(f"{root}: missing num-samples key")
        self.n_samples = int(n)
        self.voc_type = voc_type
        self.max_len = max_len

    def __len__(self) -> int:
        return self.n_samples

    def __getitem__(self, index: int):
        idx = (index % self.n_samples) + 1
        label_buf = self.env.get(b"label-%09d" % idx)
        word = label_buf.decode("utf-8", "ignore") if label_buf else " "
        try:
            img_hr = buf2pil(self.env.get(b"image-%09d" % idx))
            if img_hr.width < 4 or img_hr.height < 4:
                return self[(index + 1) % self.n_samples]
        except (TypeError, OSError):
            return self[(index + 1) % self.n_samples]
        return img_hr, img_hr.copy(), str_filt(word, self.voc_type)


class CSVTRDataset:
    """Chinese street-view text: ``filter_dir`` images +
    ``filter_train_test.list`` tab-separated index (``dataset.py:1118-1157``).
    Labels are NOT voc-filtered (Chinese path keeps raw text)."""

    def __init__(self, root: str, voc_type: str = "chinese", test: bool = False):
        self.imdir = os.path.join(root, "filter_dir")
        self.gt_pairs = []
        with open(os.path.join(root, "filter_train_test.list")) as fh:
            for line in fh:
                items = line.rstrip("\n").split("\t")
                if len(items) >= 4:
                    self.gt_pairs.append(
                        (os.path.join(self.imdir, items[2]), items[3])
                    )
        self.voc_type = voc_type

    def __len__(self) -> int:
        return len(self.gt_pairs)

    def __getitem__(self, index: int):
        path, word = self.gt_pairs[index % len(self)]
        try:
            img_hr = Image.open(path).convert("RGB")
        except OSError:
            return self[(index + 1) % len(self)]
        return img_hr, img_hr.copy(), word


class COCOTextDataset:
    """COCO-Text word crops: ``{train,val}_words/`` + comma-separated gt
    file; test split truncated to 3000 like the reference
    (``dataset.py:1160-1206``)."""

    def __init__(self, root: str, voc_type: str = "all", test: bool = False):
        gt_file = "val_words_gt.txt" if test else "train_words_gt.txt"
        im_dir = "val_words" if test else "train_words"
        self.image_dir = os.path.join(root, im_dir)
        with open(os.path.join(root, gt_file)) as fh:
            self.gtlist = [l.rstrip("\n") for l in fh]
        if test:
            self.gtlist = self.gtlist[:3000]
        self.voc_type = voc_type

    def __len__(self) -> int:
        return len(self.gtlist)

    def __getitem__(self, index: int):
        anno = self.gtlist[index % len(self)]
        parts = anno.split(",")
        if len(parts) < 2:
            return self[(index + 1) % len(self)]
        img_id, label = parts[:2]
        try:
            img_hr = Image.open(
                os.path.join(self.image_dir, img_id + ".jpg")
            ).convert("RGB")
        except OSError:
            return self[(index + 1) % len(self)]
        return img_hr, img_hr.copy(), str_filt(label, self.voc_type)


class CHNSynPklDataset:
    """Chinese synthetic corpus: pickled ``{key: word}`` dicts + key.jpg
    images; LR = 5x5 sigma-1 Gaussian blur of HR (``dataset.py:821-874``)."""

    def __init__(self, root: str, voc_type: str = "chinese", test: bool = False):
        import pickle

        self.root = root
        self.database: dict[str, str] = {}
        for f in sorted(os.listdir(root)):
            if f.endswith(".pkl"):
                with open(os.path.join(root, f), "rb") as fh:
                    self.database.update(pickle.load(fh))
        self.keys = sorted(self.database)
        self.voc_type = voc_type

    def __len__(self) -> int:
        return len(self.keys)

    def __getitem__(self, index: int):
        import cv2

        key = self.keys[index % len(self)]
        word = self.database[key]
        try:
            img_hr = Image.open(os.path.join(self.root, key + ".jpg")).convert("RGB")
        except OSError:
            return self[(index + 1) % len(self)]
        lr_np = cv2.GaussianBlur(np.asarray(img_hr), (5, 5), 1)
        return img_hr, Image.fromarray(lr_np), str_filt(word, self.voc_type)


class DistortedSubsetDataset:
    """TextZoom restricted to a picked-index file (one 1-based LMDB index
    per line), the ``*_distorted.txt`` protocol (``dataset.py:689-817``)."""

    def __init__(
        self,
        root: str,
        picked_index_file: str,
        voc_type: str = "all",
        cutblur: bool = False,
        manmade_degrade: bool = False,
        test: bool = False,
    ):
        self.base = LmdbTextDataset(
            root,
            voc_type=voc_type,
            cutblur=cutblur,
            manmade_degrade=manmade_degrade,
            test=test,
        )
        with open(picked_index_file) as fh:
            self.picked = [int(l) for l in fh if l.strip()]

    def __len__(self) -> int:
        return len(self.picked)

    def __getitem__(self, index: int):
        # picked indices are 1-based LMDB keys; base getitem is 0-based
        return self.base[self.picked[index % len(self)] - 1]


def canny_weight_mask(img: Image.Image) -> np.ndarray:
    """Edge-weighted mask 0.4 + canny*0.5 (``dataset.py:1563-1574``)."""
    import cv2

    gray = cv2.cvtColor(np.asarray(img), cv2.COLOR_RGB2GRAY)
    kernel = np.ones((5, 5), np.uint8)
    canny = cv2.Canny(gray, 20, 150)
    canny = cv2.dilate(canny, kernel, iterations=1)
    canny = cv2.GaussianBlur(canny, (5, 5), 1)
    return 0.4 + (canny / 255.0) * 0.5


class MaskedLmdbDataset:
    """TextZoom + per-sample canny weight mask as a 4th element
    (``lmdbDatasetWithMask_real``, ``dataset.py:1538-1594``)."""

    def __init__(self, root: str, voc_type: str = "all", test: bool = False):
        self.base = LmdbTextDataset(root, voc_type=voc_type, test=test)

    def __len__(self) -> int:
        return len(self.base)

    def __getitem__(self, index: int):
        img_hr, img_lr, label = self.base[index]
        return img_hr, img_lr, label, canny_weight_mask(img_hr)


class W2VLmdbDataset:
    """TextZoom + per-label word vector (``lmdbDatasetWithW2V_real``,
    ``dataset.py:1209-1330``).  The reference embeds via pyfasttext
    (``cc.en.300.bin``); that library is an external input here, so the
    embedding is injected as ``embed_fn(label) -> [D] vector``."""

    def __init__(
        self,
        root: str,
        embed_fn: Optional[Callable[[str], np.ndarray]] = None,
        voc_type: str = "all",
        test: bool = False,
    ):
        self.base = LmdbTextDataset(root, voc_type=voc_type, test=test)
        if embed_fn is None:
            raise ValueError(
                "W2VLmdbDataset needs embed_fn (e.g. a fasttext model's "
                "get_numpy_vector); the reference uses cc.en.300.bin"
            )
        self.embed_fn = embed_fn

    def __len__(self) -> int:
        return len(self.base)

    def __getitem__(self, index: int):
        img_hr, img_lr, label = self.base[index]
        return img_hr, img_lr, label, np.asarray(self.embed_fn(label), np.float32)


class GlobalSRDataset:
    """SynthText-800K word crops from ``gt.mat`` (``lmdbDataset_GlobalSR``
    + ``get_Syn_800K_with_words``, ``dataset.py:173-441``).  The reference
    returns whole images + boxes; here crops are materialized through
    :func:`tatt_tpu.data.prep_tools.iter_synthtext_crops` so the sample
    protocol matches the rest of the framework (LR = HR crop)."""

    def __init__(self, root: str, voc_type: str = "all", test: bool = False, limit: Optional[int] = None):
        from tatt_tpu.data.prep_tools import iter_synthtext_crops

        self.samples = []
        for img, label in iter_synthtext_crops(
            os.path.join(root, "gt.mat"), root
        ):
            self.samples.append((img, label))
            if limit is not None and len(self.samples) >= limit:
                break
        self.voc_type = voc_type

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, index: int):
        img, label = self.samples[index % len(self)]
        return img, img.copy(), str_filt(label, self.voc_type)
