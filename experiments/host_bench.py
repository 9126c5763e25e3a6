"""Host input-pipeline throughput on a real LMDB (VERDICT r1 item #7).

Builds a 10k-sample TextZoom-layout LMDB fixture (JPEG-encoded HR 128x32 /
LR 64x16 pairs via our from-scratch writer, ``native/lmdb_lite.cc``), then
measures the full host path the trainer uses — LMDB read -> JPEG decode ->
resize/normalize/mask -> label spreading -> 9-tuple collate — at batch 64
through ``tatt_tpu.data.loader.DataLoader`` for several worker counts.

Compare the printed samples/sec against the device rate in BENCH_r*.json.

Run: python experiments/host_bench.py [n_samples]
"""

import io
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tatt_tpu.data.lmdb_dataset import LmdbTextDataset  # noqa: E402
from tatt_tpu.data.lmdb_lite import write_lmdb  # noqa: E402
from tatt_tpu.data.loader import DataLoader  # noqa: E402

ROOT = "/tmp/host_bench_lmdb"
BATCH = 64

WORDS = ["super", "text", "zoom", "bench", "tpu", "host", "lmdb", "crnn"]


def build_fixture(n: int) -> str:
    if os.path.exists(os.path.join(ROOT, "data.mdb")):
        from tatt_tpu.data.lmdb_lite import LmdbEnv

        env = LmdbEnv(ROOT)
        ok = env.get(b"num-samples") == str(n).encode()
        env.close()
        if ok:
            return ROOT
    from PIL import Image

    rng = np.random.default_rng(0)
    records = {b"num-samples": str(n).encode()}
    t0 = time.time()
    for i in range(n):
        # noise-textured crops: JPEG entropy comparable to camera crops
        hr = rng.integers(0, 256, (32, 128, 3), dtype=np.uint8)
        lr = rng.integers(0, 256, (16, 64, 3), dtype=np.uint8)
        for key, arr, q in ((b"image_hr", hr, 90), (b"image_lr", lr, 80)):
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG", quality=q)
            records[b"%s-%09d" % (key, i + 1)] = buf.getvalue()
        records[b"label-%09d" % (i + 1)] = WORDS[i % len(WORDS)].encode()
    write_lmdb(ROOT, records)
    print(f"fixture: {n} samples written in {time.time()-t0:.1f}s")
    return ROOT


def decode_floor(n: int = 2000) -> None:
    """The irreducible per-sample host cost: cv2 JPEG decode of one HR+LR
    pair.  Everything else the float collate does (resize is a no-op at
    stored size, normalize, mask luma, label spread) sits on top of this."""
    import cv2

    from tatt_tpu.data.lmdb_lite import LmdbEnv

    env = LmdbEnv(ROOT)
    bufs = [
        (
            np.frombuffer(env.get(b"image_hr-%09d" % (i + 1)), np.uint8),
            np.frombuffer(env.get(b"image_lr-%09d" % (i + 1)), np.uint8),
        )
        for i in range(n)
    ]
    env.close()
    nbytes = sum(h.nbytes + l.nbytes for h, l in bufs)
    t0 = time.perf_counter()
    for h, l in bufs:
        cv2.imdecode(h, cv2.IMREAD_COLOR)
        cv2.imdecode(l, cv2.IMREAD_COLOR)
    dt = time.perf_counter() - t0
    print(
        f"decode floor: {n/dt:8.1f} samples/sec "
        f"({nbytes/dt/1e6:.0f} MB/s compressed, {dt:.2f}s)"
    )


def main(n: int = 10000) -> None:
    build_fixture(n)
    ds = LmdbTextDataset(ROOT)
    decode_floor()
    for raw in (False, True):
        kw = dict(width=128, height=32, down_sample_scale=2, mask=True, raw=raw)
        for workers in (1, 2, 4):
            loader = DataLoader(
                ds, BATCH, shuffle=True, drop_last=True,
                collate_kwargs=kw, num_workers=workers,
            )
            # warm one batch (thread pool spin-up, page cache)
            next(iter(loader))
            t0 = time.perf_counter()
            n_img = 0
            for batch in loader:
                n_img += batch.images_hr.shape[0]
            dt = time.perf_counter() - t0
            path = "raw-u8" if raw else "float "
            print(
                f"{path} workers={workers}: {n_img/dt:8.1f} samples/sec "
                f"({n_img} samples, {dt:.2f}s)"
            )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10000)
