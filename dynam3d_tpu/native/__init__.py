"""Native (C++) runtime components, loaded via ctypes.

Builds ``dynam3d_native.so`` on first import if missing (g++ is baked into
the image; no pybind11 — plain C ABI).  Provides:

  - :func:`dtw_native` — exact DTW (replaces the reference's fastdtw dep)
  - :class:`EpisodeStore` — mmap'd episode records with background page
    prefetch (the data-loader role of the reference's per-env processes /
    lmdb pipelines)
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "dynam3d_native.cpp")
_SO = os.path.join(_DIR, "dynam3d_native.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    subprocess.run(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
         "-pthread", _SRC, "-o", _SO],
        check=True,
        capture_output=True,
    )


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        _build()
    lib = ctypes.CDLL(_SO)
    lib.dynam3d_dtw.restype = ctypes.c_double
    lib.dynam3d_dtw.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
    ]
    lib.dynam3d_store_open.restype = ctypes.c_void_p
    lib.dynam3d_store_open.argtypes = [ctypes.c_char_p]
    for fn in ("dynam3d_store_n_steps", "dynam3d_store_step_bytes",
               "dynam3d_store_meta_bytes"):
        getattr(lib, fn).restype = ctypes.c_int64
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    lib.dynam3d_store_meta.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)]
    lib.dynam3d_store_read.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
    ]
    lib.dynam3d_store_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def dtw_native(pred: np.ndarray, gt: np.ndarray) -> float:
    lib = _load()
    p = np.ascontiguousarray(pred, np.float64)
    g = np.ascontiguousarray(gt, np.float64)
    assert p.ndim == 2 and g.ndim == 2 and p.shape[1] == g.shape[1]
    return lib.dynam3d_dtw(
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), p.shape[0],
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), g.shape[0],
        p.shape[1],
    )


_MAGIC = 0xD14A3D


def write_episode_store(path: str, steps: list, meta: dict) -> None:
    """Write an episode store file.

    ``steps``: list of equal-size bytes blobs (one per step, layout defined
    by ``meta`` — e.g. concatenated rgb u8 + depth f32 + pose f32).
    """
    step_bytes = len(steps[0]) if steps else 0
    assert all(len(s) == step_bytes for s in steps)
    meta_b = json.dumps(meta).encode()
    with open(path, "wb") as f:
        hdr = np.asarray([_MAGIC, len(steps), step_bytes, len(meta_b)], np.int64)
        f.write(hdr.tobytes())
        f.write(meta_b)
        for s in steps:
            f.write(s)


class EpisodeStore:
    """mmap'd episode reader with background page prefetch."""

    def __init__(self, path: str, prefetch_ahead: int = 4):
        self._lib = _load()
        self._h = self._lib.dynam3d_store_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open episode store: {path}")
        self.n_steps = self._lib.dynam3d_store_n_steps(self._h)
        self.step_bytes = self._lib.dynam3d_store_step_bytes(self._h)
        mb = self._lib.dynam3d_store_meta_bytes(self._h)
        buf = np.empty(mb, np.uint8)
        self._lib.dynam3d_store_meta(
            self._h, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        )
        self.meta = json.loads(bytes(buf).decode())
        self.prefetch_ahead = prefetch_ahead

    def read(self, t: int) -> bytes:
        out = np.empty(self.step_bytes, np.uint8)
        self._lib.dynam3d_store_read(
            self._h, t, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self.prefetch_ahead,
        )
        return out.tobytes()

    def close(self) -> None:
        if self._h:
            self._lib.dynam3d_store_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
