"""Native (C++) runtime components with ctypes bindings.

Builds lazily with g++ on first use; artifacts cached next to the sources.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIBS: dict[str, ctypes.CDLL | None] = {}


def _build(name: str, sources: list[str], out: str) -> bool:
    cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", *sources, "-o", out]
    try:
        subprocess.run(cmd, check=True, capture_output=True, cwd=_HERE)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def load_library(name: str, sources: list[str]) -> ctypes.CDLL | None:
    """Load (building if needed) a native library; None if unavailable."""
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        so_path = os.path.join(_HERE, f"lib{name}.so")
        srcs = [os.path.join(_HERE, s) for s in sources]
        if not os.path.exists(so_path) or any(
            os.path.getmtime(s) > os.path.getmtime(so_path) for s in srcs
        ):
            if not _build(name, srcs, so_path):
                _LIBS[name] = None
                return None
        try:
            _LIBS[name] = ctypes.CDLL(so_path)
        except OSError:
            _LIBS[name] = None
        return _LIBS[name]


class NativeBPE:
    """ctypes wrapper over native/bpe.cpp. Falls back to None when g++ or
    the build is unavailable; callers keep the pure-Python engine."""

    def __init__(self, mergeable_ranks: dict[bytes, int]):
        lib = load_library("mvbpe", ["bpe.cpp"])
        if lib is None:
            raise RuntimeError("native BPE unavailable")
        lib.mvbpe_create.restype = ctypes.c_void_p
        lib.mvbpe_create.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.mvbpe_destroy.argtypes = [ctypes.c_void_p]
        lib.mvbpe_encode_piece.restype = ctypes.c_int64
        lib.mvbpe_encode_piece.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_uint64,
        ]
        self._lib = lib

        blob = bytearray()
        blob += len(mergeable_ranks).to_bytes(4, "little")
        for token, rank in mergeable_ranks.items():
            blob += int(rank).to_bytes(4, "little")
            blob += len(token).to_bytes(4, "little")
            blob += token
        self._blob = bytes(blob)  # keep alive
        self._handle = lib.mvbpe_create(self._blob, len(self._blob))
        if not self._handle:
            raise RuntimeError("native BPE init failed")

    def encode_piece(self, piece: bytes) -> list[int] | None:
        cap = max(len(piece), 1)
        out = (ctypes.c_uint32 * cap)()
        n = self._lib.mvbpe_encode_piece(self._handle, piece, len(piece), out, cap)
        if n < 0:
            return None
        return list(out[:n])

    def __del__(self):
        if getattr(self, "_handle", None) and getattr(self, "_lib", None):
            self._lib.mvbpe_destroy(self._handle)
