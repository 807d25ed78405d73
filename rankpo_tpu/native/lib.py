"""ctypes bindings for the C++ host runtime (native/rankpo_native.cpp).

Auto-builds the shared library with g++ on first use (no pybind11 needed);
every entry point has a pure-python fallback so the framework works without a
toolchain. Callers should check NATIVE_AVAILABLE / catch RuntimeError.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "rankpo_native.cpp")
_SO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "librankpo_native.so")

_lib = None
_lock = threading.Lock()
NATIVE_AVAILABLE: Optional[bool] = None  # resolved lazily


def ensure_built(force: bool = False) -> bool:
    """Build (if needed) and load the native library. Returns availability."""
    global _lib, NATIVE_AVAILABLE
    with _lock:
        if _lib is not None and not force:
            return True
        if NATIVE_AVAILABLE is False and not force:
            return False
        try:
            if force or not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
            ):
                cmd = [
                    "g++", "-O3", "-march=native", "-std=c++17", "-shared",
                    "-fPIC", "-pthread", _SRC, "-o", _SO,
                ]
                logger.info("building native library: %s", " ".join(cmd))
                subprocess.run(cmd, check=True, capture_output=True)
            lib = ctypes.CDLL(_SO)
        except (OSError, subprocess.CalledProcessError, FileNotFoundError) as e:
            logger.warning("native library unavailable: %s", e)
            NATIVE_AVAILABLE = False
            return False

        lib.topk_ip.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.pad_batch_int32.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.scan_jsonl_offsets.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ]
        lib.scan_jsonl_offsets.restype = ctypes.c_int64
        _lib = lib
        NATIVE_AVAILABLE = True
        return True


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _i64ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def native_topk_ip(
    corpus: np.ndarray, queries: np.ndarray, k: int, n_threads: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact multithreaded inner-product top-k (FAISS-flat CPU class)."""
    if not ensure_built():
        raise RuntimeError("native library unavailable")
    corpus = np.ascontiguousarray(corpus, np.float32)
    queries = np.ascontiguousarray(queries, np.float32)
    n, d = corpus.shape
    nq = queries.shape[0]
    k = min(k, n)
    out_s = np.empty((nq, k), np.float32)
    out_i = np.empty((nq, k), np.int32)
    _lib.topk_ip(
        _fptr(corpus), n, d, _fptr(queries), nq, k, n_threads,
        _fptr(out_s), _i32ptr(out_i),
    )
    return out_s, out_i


def native_pad_batch(
    seqs, target: int, pad_id: int
) -> Tuple[np.ndarray, np.ndarray]:
    """List of int sequences -> ([n, target] ids, [n, target] mask)."""
    if not ensure_built():
        raise RuntimeError("native library unavailable")
    n = len(seqs)
    offsets = np.zeros(n + 1, np.int64)
    for i, s in enumerate(seqs):
        offsets[i + 1] = offsets[i] + len(s)
    flat = np.fromiter(
        (t for s in seqs for t in s), np.int32, count=int(offsets[-1])
    )
    out_ids = np.empty((n, target), np.int32)
    out_mask = np.empty((n, target), np.int32)
    _lib.pad_batch_int32(
        _i32ptr(flat), _i64ptr(offsets), n, target, pad_id,
        _i32ptr(out_ids), _i32ptr(out_mask),
    )
    return out_ids, out_mask


def is_available() -> bool:
    """Whether the C++ helper library is (or can be) built. Prefer this over
    importing NATIVE_AVAILABLE: a from-import snapshots the pre-build value
    (None) and never sees ensure_built()'s rebind."""
    return bool(ensure_built())


def native_scan_jsonl(path: str, max_lines: int = 1 << 26) -> np.ndarray:
    """Line-start offsets of a jsonl file (mmap scan); offsets[-1] = file size."""
    if not ensure_built():
        raise RuntimeError("native library unavailable")
    offsets = np.zeros(max_lines + 1, np.int64)
    count = _lib.scan_jsonl_offsets(path.encode(), _i64ptr(offsets), max_lines)
    if count < 0:
        raise IOError(f"failed to scan {path}")
    if count >= max_lines:
        # silently truncating would shorten the dataset AND leave the last
        # row's byte range spanning to EOF (json decode error mid-training)
        raise ValueError(
            f"{path} has more than {max_lines} lines; raise max_lines"
        )
    # copy: the slice is otherwise a view pinning the full scan buffer
    return offsets[: count + 1].copy()
