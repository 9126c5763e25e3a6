"""Native LMDB-format reader/writer round-trip + TextZoom dataset layer."""

import io
import os

import numpy as np
import pytest

from tatt_tpu.data.lmdb_lite import LmdbEnv, write_lmdb


def test_roundtrip_small(tmp_path):
    records = {b"key-%03d" % i: b"value-%05d" % (i * 7) for i in range(500)}
    records[b"num-samples"] = b"500"
    root = str(tmp_path / "env")
    write_lmdb(root, records)
    env = LmdbEnv(root)
    assert env.entries() == 501
    for k, v in records.items():
        assert env.get(k) == v, k
    assert env.get(b"missing") is None
    env.close()


def test_roundtrip_large_values(tmp_path):
    rng = np.random.default_rng(0)
    records = {}
    for i in range(20):
        size = int(rng.integers(3000, 60000))  # spans overflow pages
        records[b"blob-%09d" % i] = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
    root = str(tmp_path / "env")
    write_lmdb(root, records)
    env = LmdbEnv(root)
    for k, v in records.items():
        got = env.get(k)
        assert got == v, f"{k}: {len(got) if got else None} vs {len(v)}"
    env.close()


def test_roundtrip_many_keys(tmp_path):
    # enough keys to force multiple branch levels
    records = {b"k%09d" % i: (b"v%d" % i) * 10 for i in range(20000)}
    root = str(tmp_path / "env")
    write_lmdb(root, records)
    env = LmdbEnv(root)
    assert env.entries() == 20000
    for i in (0, 1, 9999, 19998, 19999):
        assert env.get(b"k%09d" % i) == (b"v%d" % i) * 10
    env.close()


def test_textzoom_dataset(tmp_path):
    from PIL import Image

    from tatt_tpu.data.lmdb_dataset import ConcatDataset, LmdbTextDataset

    def png(w, h, color):
        img = Image.new("RGB", (w, h), color)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    records = {b"num-samples": b"3"}
    for i in range(1, 4):
        records[b"label-%09d" % i] = b"word%d" % i
        records[b"image_hr-%09d" % i] = png(128, 32, (i * 10, 0, 0))
        records[b"image_lr-%09d" % i] = png(64, 16, (0, i * 10, 0))
    root = str(tmp_path / "tz")
    write_lmdb(root, records)

    ds = LmdbTextDataset(root)
    assert len(ds) == 3
    hr, lr, label = ds[0]
    assert hr.size == (128, 32) and lr.size == (64, 16) and label == "word1"

    cat = ConcatDataset([ds, ds])
    assert len(cat) == 6
    assert cat[5][2] == "word3"


def test_recognition_and_mix_datasets(tmp_path):
    import io as _io

    from PIL import Image

    from tatt_tpu.data.lmdb_dataset import (
        LmdbRecognitionDataset,
        LmdbTextDataset,
        MixDataset,
    )

    def png(w, h, color):
        img = Image.new("RGB", (w, h), color)
        buf = _io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    records = {b"num-samples": b"2"}
    for i in (1, 2):
        records[b"label-%09d" % i] = b"w%d" % i
        records[b"image-%09d" % i] = png(64, 32, (i, i, i))
    root = str(tmp_path / "rec")
    write_lmdb(root, records)
    ds = LmdbRecognitionDataset(root)
    img, label = ds[0]
    assert img.size == (64, 32) and label == "w1"

    records = {b"num-samples": b"2"}
    for i in (1, 2):
        records[b"label-%09d" % i] = b"m%d" % i
        records[b"image_hr-%09d" % i] = png(128, 32, (0, i, 0))
        records[b"image_lr-%09d" % i] = png(64, 16, (i, 0, 0))
    root = str(tmp_path / "tz2")
    write_lmdb(root, records)
    mix = MixDataset(LmdbTextDataset(root), synth_prob=1.0)
    hr, lr, label = mix[0]
    assert lr.size == (64, 16) and label == "m1"
