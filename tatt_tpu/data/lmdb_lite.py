"""ctypes bindings for the native LMDB-format library (+ build-on-demand).

Mirrors the slice of the ``lmdb`` python API the reference uses
(``dataset/dataset.py:576-582``): open an environment directory holding
``data.mdb``, ``get(key)``, entry count; plus bulk creation used by the
``create_lmdb`` tool and test fixtures.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache
from typing import Mapping, Optional

_SRC = os.path.join(os.path.dirname(__file__), "..", "native", "lmdb_lite.cc")
_BUILD_DIR = os.path.join(os.path.dirname(__file__), "..", "native", "build")


@lru_cache(maxsize=1)
def _lib() -> ctypes.CDLL:
    so_path = os.path.join(_BUILD_DIR, "liblmdb_lite.so")
    src = os.path.abspath(_SRC)
    if not os.path.exists(so_path) or os.path.getmtime(so_path) < os.path.getmtime(
        src
    ):
        os.makedirs(_BUILD_DIR, exist_ok=True)
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", so_path],
            check=True,
        )
    lib = ctypes.CDLL(so_path)
    lib.ll_open.restype = ctypes.c_void_p
    lib.ll_open.argtypes = [ctypes.c_char_p]
    lib.ll_close.argtypes = [ctypes.c_void_p]
    lib.ll_entries.restype = ctypes.c_longlong
    lib.ll_entries.argtypes = [ctypes.c_void_p]
    lib.ll_get.restype = ctypes.c_longlong
    lib.ll_get.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_size_t),
    ]
    lib.ll_write.restype = ctypes.c_longlong
    lib.ll_write.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_size_t),
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_size_t),
        ctypes.c_size_t,
        ctypes.c_int,
    ]
    return lib


class LmdbEnv:
    """Read-only environment over ``<root>/data.mdb`` (or a bare file)."""

    def __init__(self, root: str):
        path = root
        if os.path.isdir(root):
            path = os.path.join(root, "data.mdb")
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        self._lib = _lib()
        self._h = self._lib.ll_open(path.encode())
        if not self._h:
            raise IOError(f"not a valid LMDB file: {path}")
        self.path = path

    def get(self, key: bytes) -> Optional[bytes]:
        out = ctypes.c_void_p()
        olen = ctypes.c_size_t()
        rc = self._lib.ll_get(
            self._h, key, len(key), ctypes.byref(out), ctypes.byref(olen)
        )
        if rc == -1:
            return None
        if rc != 0:
            raise IOError(f"lmdb_lite corruption reading {self.path} (rc={rc})")
        return ctypes.string_at(out.value, olen.value)

    def entries(self) -> int:
        return int(self._lib.ll_entries(self._h))

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.ll_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def write_lmdb(root: str, records: Mapping[bytes, bytes]) -> str:
    """Create ``<root>/data.mdb`` from a mapping (the ``createDataset``
    writer path, reference ``dataset/create_lmdb.py``)."""
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, "data.mdb")
    keys = list(records.keys())
    vals = [records[k] for k in keys]
    n = len(keys)
    KeyArr = ctypes.c_char_p * n
    LenArr = ctypes.c_size_t * n
    rc = _lib().ll_write(
        path.encode(),
        KeyArr(*keys),
        LenArr(*[len(k) for k in keys]),
        KeyArr(*vals),
        LenArr(*[len(v) for v in vals]),
        n,
        0,
    )
    if rc != 0:
        raise IOError(f"lmdb_lite write failed rc={rc}")
    return path
