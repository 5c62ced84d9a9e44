"""ctypes bindings for the native suffix-array DraftRetriever.

Python interface over native/draft_retriever.cpp (the C++ equivalent of
the reference's Rust pyo3 Writer/Reader, reference:
src/model/rest/DraftRetriever/src/lib.rs:56,161). The shared library is
built on demand with the repo Makefile (g++; no pybind11).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdraft_retriever.so")

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
        )
    lib = ctypes.CDLL(_LIB_PATH)
    lib.dr_writer_create.restype = ctypes.c_void_p
    lib.dr_writer_append.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
    ]
    lib.dr_writer_finalize_and_save.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.dr_writer_finalize_and_save.restype = ctypes.c_int
    lib.dr_writer_free.argtypes = [ctypes.c_void_p]
    lib.dr_reader_open.argtypes = [ctypes.c_char_p]
    lib.dr_reader_open.restype = ctypes.c_void_p
    lib.dr_reader_free.argtypes = [ctypes.c_void_p]
    lib.dr_reader_size.argtypes = [ctypes.c_void_p]
    lib.dr_reader_size.restype = ctypes.c_int64
    lib.dr_reader_search.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.dr_reader_search.restype = ctypes.c_int
    _lib = lib
    return lib


def _as_i32_ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


class DraftWriter:
    """Append token sequences, then finalize into a searchable datastore."""

    def __init__(self):
        self._lib = _load_lib()
        self._h = self._lib.dr_writer_create()

    def append(self, tokens) -> None:
        arr = np.ascontiguousarray(np.asarray(tokens, dtype=np.int32))
        self._lib.dr_writer_append(self._h, _as_i32_ptr(arr), arr.size)

    def finalize(self, path: str) -> None:
        rc = self._lib.dr_writer_finalize_and_save(self._h, path.encode())
        if rc != 0:
            raise IOError(f"failed to save datastore to {path}")

    def close(self) -> None:
        if self._h:
            self._lib.dr_writer_free(self._h)
            self._h = None


class DraftReader:
    """Longest-suffix-match retrieval of ranked continuation drafts."""

    def __init__(self, path: str):
        self._lib = _load_lib()
        self._h = self._lib.dr_reader_open(path.encode())
        if not self._h:
            raise IOError(f"failed to open datastore {path}")

    @property
    def size(self) -> int:
        return int(self._lib.dr_reader_size(self._h))

    def search(
        self,
        query,
        max_suffix: int = 16,
        draft_len: int = 8,
        top_n: int = 8,
    ) -> Tuple[List[np.ndarray], List[int], int]:
        """Returns (continuations, frequencies, match_len)."""
        q = np.ascontiguousarray(np.asarray(query, dtype=np.int32)).ravel()
        out_tokens = np.zeros((top_n, draft_len), np.int32)
        out_lens = np.zeros((top_n,), np.int32)
        out_freqs = np.zeros((top_n,), np.int64)
        match_len = ctypes.c_int32(0)
        n = self._lib.dr_reader_search(
            self._h,
            _as_i32_ptr(q),
            q.size,
            max_suffix,
            draft_len,
            top_n,
            _as_i32_ptr(out_tokens),
            _as_i32_ptr(out_lens),
            out_freqs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.byref(match_len),
        )
        conts = [out_tokens[i, : out_lens[i]].copy() for i in range(n)]
        return conts, [int(f) for f in out_freqs[:n]], int(match_len.value)

    def close(self) -> None:
        if self._h:
            self._lib.dr_reader_free(self._h)
            self._h = None
