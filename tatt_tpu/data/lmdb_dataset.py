"""TextZoom LMDB datasets.

Mirrors ``lmdbDataset_real`` (``dataset/dataset.py:565-686``): keys
``num-samples``, ``label-%09d``, ``image_hr-%09d`` (128x32),
``image_lr-%09d`` (64x16), indices 1-based; corrupt records skip to the
next index (``:683-684``); missing labels decode to a single space
(``:676-678``).  Backed by the native lmdb_lite reader.
"""

from __future__ import annotations

import bisect
import io
from PIL import Image

from tatt_tpu.data.lmdb_lite import LmdbEnv

try:  # libjpeg-turbo via one C call — ~2.2x faster than PIL's Python
    # parser on the small TextZoom crops, and bit-exact with PIL's output
    # (both link libjpeg-turbo; verified max|diff| == 0 on fixture JPEGs).
    import cv2 as _cv2

    _cv2.setNumThreads(1)  # 1-vCPU hosts: OpenCV's pool only adds contention
except Exception:  # pragma: no cover - cv2 is in the base image
    _cv2 = None


class NpImage:
    """A decoded RGB uint8 array with the thin PIL surface the pipeline
    touches.  ``np.asarray(·)`` is ZERO-copy (``__array_interface__``);
    ``.resize``/``.convert`` materialize a real PIL image so resampling
    and colorspace semantics stay PIL-bit-exact.  Avoids the
    fromarray->tobytes->asarray round-trip that cost ~35% of host batch
    time (cv2 decode hands us the array already)."""

    __slots__ = ("arr",)

    def __init__(self, arr) -> None:
        self.arr = arr

    @property
    def size(self) -> tuple[int, int]:
        return (self.arr.shape[1], self.arr.shape[0])

    @property
    def width(self) -> int:
        return self.arr.shape[1]

    @property
    def height(self) -> int:
        return self.arr.shape[0]

    @property
    def __array_interface__(self):
        return self.arr.__array_interface__

    def to_pil(self) -> Image.Image:
        return Image.fromarray(self.arr)

    def resize(self, size, resample=Image.BICUBIC) -> Image.Image:
        return self.to_pil().resize(size, resample)

    def convert(self, mode: str) -> Image.Image:
        return self.to_pil().convert(mode)

    def save(self, *a, **kw) -> None:
        self.to_pil().save(*a, **kw)


def buf2rgb(buf: bytes):
    """Decode to an HWC RGB uint8 ndarray (cv2 fast path, PIL fallback)."""
    import numpy as _np

    if _cv2 is not None and len(buf) > 3 and buf[:2] == b"\xff\xd8":
        arr = _cv2.imdecode(_np.frombuffer(buf, _np.uint8), _cv2.IMREAD_COLOR)
        if arr is not None:
            return _cv2.cvtColor(arr, _cv2.COLOR_BGR2RGB)
    return _np.asarray(Image.open(io.BytesIO(buf)).convert("RGB"))


def buf2pil(buf: bytes) -> Image.Image:
    if _cv2 is not None and len(buf) > 3 and buf[:2] == b"\xff\xd8":
        import numpy as _np

        arr = _cv2.imdecode(_np.frombuffer(buf, _np.uint8), _cv2.IMREAD_COLOR)
        if arr is not None:
            return Image.fromarray(arr[:, :, ::-1])
    return Image.open(io.BytesIO(buf)).convert("RGB")


class LmdbTextDataset:
    def __init__(
        self,
        root: str,
        voc_type: str = "all",
        max_len: int = 100,
        manmade_degrade: bool = False,
        cutblur: bool = False,
        test: bool = False,
        seed: int = 0,
    ):
        import random as _random

        self.env = LmdbEnv(root)
        self.root = root
        n = self.env.get(b"num-samples")
        if n is None:
            raise IOError(f"{root}: missing num-samples key")
        self.n_samples = int(n)
        self.voc_type = voc_type
        self.max_len = max_len
        self.manmade_degrade = manmade_degrade
        self.cutblur = cutblur
        self.test = test
        self.seed = seed
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Called by the DataLoader each epoch so per-sample RNGs reshuffle."""
        self._epoch = epoch

    def _sample_rng(self, index: int):
        # Per-sample RNG keyed on (seed, epoch, index): augmentation draws
        # are independent of thread scheduling under num_workers>1 (the
        # torch DataLoader seeds workers deterministically; a shared Random
        # here would make runs nondeterministic).
        import random as _random

        return _random.Random(
            (self.seed * 1_000_003 + self._epoch) * 1_000_003 + index
        )

    def __len__(self) -> int:
        return self.n_samples

    def _cutblur(self, img_hr, img_lr, rng):
        """CutBlur mix (``dataset.py:622-637``): with p=0.3 paste an
        HR-resolution slice into the LR crop."""
        import numpy as _np

        if rng.random() <= 0.7:
            return img_lr
        hr = _np.array(img_hr.resize(img_lr.size))
        lr = _np.array(img_lr)
        randx = int(lr.shape[1] * (0.2 + 0.8 * rng.random()))
        if rng.random() <= 0.5:
            lr[:, randx:] = hr[:, randx:]
        else:
            lr[:, :randx] = hr[:, :randx]
        from PIL import Image as _Image

        return _Image.fromarray(lr)

    def __getitem__(self, index: int):
        from tatt_tpu.core.charset import str_filt

        if index >= self.n_samples:
            index = self.n_samples - 1
        idx = index + 1  # keys are 1-based
        label_buf = self.env.get(b"label-%09d" % idx)
        label = label_buf.decode("utf-8", "ignore") if label_buf else " "
        hr_buf = self.env.get(b"image_hr-%09d" % idx)
        rng = self._sample_rng(index)
        try:
            img_hr = NpImage(buf2rgb(hr_buf))
            if self.manmade_degrade:
                from tatt_tpu.data.degradation import manmade_degradation

                img_lr = manmade_degradation(img_hr, rng)
            else:
                img_lr = NpImage(buf2rgb(self.env.get(b"image_lr-%09d" % idx)))
            if self.cutblur and not self.test:
                img_lr = self._cutblur(img_hr, img_lr, rng)
        except (TypeError, OSError):
            # corrupt record: skip forward like the reference
            return self[(index + 1) % self.n_samples]
        # labels are voc-filtered at load time (dataset.py:685)
        return img_hr, img_lr, str_filt(label, self.voc_type)


class LmdbRecognitionDataset:
    """Plain recognition LMDB (``lmdbDataset``, ``dataset.py:127-166``):
    keys ``label-%09d`` + ``image-%09d`` (or ``image_hr-%09d``); returns
    (img, label).  Used for recognition-only corpora (IC15/SVT/etc. share
    this layout)."""

    def __init__(self, root: str, voc_type: str = "all", max_len: int = 100):
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
        idx = index + 1
        label_buf = self.env.get(b"label-%09d" % idx)
        label = label_buf.decode("utf-8", "ignore") if label_buf else " "
        buf = self.env.get(b"image_hr-%09d" % idx) or self.env.get(
            b"image-%09d" % idx
        )
        try:
            img = buf2pil(buf)
        except (TypeError, OSError):
            return self[(index + 1) % self.n_samples]
        return img, label


class MixDataset:
    """Round-robin mix over paired datasets (``lmdbDataset_mix``,
    ``dataset.py:1488-1596`` — used by ``--mixed``: alternates real LR and
    synthetic-LR samples)."""

    def __init__(self, real_dataset, synth_prob: float = 0.5, seed: int = 0):
        self.real = real_dataset
        self.synth_prob = synth_prob
        self.seed = seed
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch
        if hasattr(self.real, "set_epoch"):
            self.real.set_epoch(epoch)

    def __len__(self) -> int:
        return len(self.real)

    def __getitem__(self, index: int):
        import random as _random

        from tatt_tpu.data.degradation import manmade_degradation

        rng = _random.Random(
            ((self.seed * 1_000_003 + self._epoch) * 1_000_003 + index)
            ^ 0x6D6978  # distinct stream from the wrapped dataset's
        )
        hr, lr, label = self.real[index]
        if rng.random() < self.synth_prob:
            lr = manmade_degradation(hr, rng).resize(lr.size)
        return hr, lr, label


class ConcatDataset:
    """Multi-LMDB concat (``dataset/dataset.py:2237-2276``)."""

    def __init__(self, datasets):
        assert datasets, "empty dataset list"
        self.datasets = list(datasets)
        self.cum = []
        total = 0
        for d in self.datasets:
            total += len(d)
            self.cum.append(total)

    def set_epoch(self, epoch: int) -> None:
        for d in self.datasets:
            if hasattr(d, "set_epoch"):
                d.set_epoch(epoch)

    def __len__(self) -> int:
        return self.cum[-1]

    def __getitem__(self, index: int):
        ds_idx = bisect.bisect_right(self.cum, index)
        prev = self.cum[ds_idx - 1] if ds_idx > 0 else 0
        return self.datasets[ds_idx][index - prev]
