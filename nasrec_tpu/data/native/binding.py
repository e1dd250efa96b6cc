"""Build + bind the native parser (fast_parse.cpp) via ctypes.

The .so is compiled on first use with g++ into this package directory and
loaded with ctypes (no pybind11 dependency).  All entry points degrade
gracefully: `native_available()` is False when no compiler is present and
callers fall back to the NumPy transforms.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fast_parse.cpp")
_SO = os.path.join(_DIR, "libfastparse.so")

_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", _SO, _SRC, "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None
        lib.parse_ctr_buffer.restype = ctypes.c_int64
        lib.parse_ctr_buffer.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        lib.count_rows.restype = ctypes.c_int64
        lib.count_rows.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def parse_ctr_buffer(
    buf: bytes,
    num_dense: int,
    num_sparse: int,
    vocab_sizes: np.ndarray,
    zero_dense: bool,
    num_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parse a bytes buffer of complete TSV lines -> (dense, cat, label)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native parser unavailable (g++ build failed)")
    if num_threads <= 0:
        num_threads = min(4, os.cpu_count() or 1)
    n = lib.count_rows(buf, len(buf))
    labels = np.empty((n, 1), np.float32)
    dense = np.empty((n, num_dense), np.float32)
    cats = np.empty((n, num_sparse), np.int32)
    vocab = np.ascontiguousarray(vocab_sizes, dtype=np.int64)
    written = lib.parse_ctr_buffer(
        buf, len(buf), num_dense, num_sparse, int(zero_dense),
        vocab.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dense.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cats.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        num_threads,
    )
    assert written == n, (written, n)
    return dense, cats, labels


def read_batches_native(
    path: str,
    batch_size: int,
    num_dense: int,
    num_sparse: int,
    vocab_sizes: np.ndarray,
    zero_dense: bool,
    chunk_bytes: int = 32 << 20,
) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Stream a TSV shard in large chunks through the native parser, emitting
    fixed-size batches (the final short batch is emitted too; callers drop it
    if needed)."""
    pend: list = []
    pend_rows = 0
    with open(path, "rb") as f:
        tail = b""
        while True:
            chunk = f.read(chunk_bytes)
            if not chunk:
                break
            chunk = tail + chunk
            nl = chunk.rfind(b"\n")
            if nl < 0:
                tail = chunk
                continue
            tail = chunk[nl + 1 :]
            dense, cats, labels = parse_ctr_buffer(
                chunk[: nl + 1], num_dense, num_sparse, vocab_sizes, zero_dense
            )
            pend.append((dense, cats, labels))
            pend_rows += len(labels)
            while pend_rows >= batch_size:
                need = batch_size
                parts_d, parts_c, parts_l = [], [], []
                while need > 0:
                    d, c, l = pend[0]
                    if len(l) <= need:
                        parts_d.append(d); parts_c.append(c); parts_l.append(l)
                        need -= len(l)
                        pend.pop(0)
                    else:
                        parts_d.append(d[:need]); parts_c.append(c[:need])
                        parts_l.append(l[:need])
                        pend[0] = (d[need:], c[need:], l[need:])
                        need = 0
                pend_rows -= batch_size
                yield (
                    np.concatenate(parts_d) if len(parts_d) > 1 else parts_d[0],
                    np.concatenate(parts_c) if len(parts_c) > 1 else parts_c[0],
                    np.concatenate(parts_l) if len(parts_l) > 1 else parts_l[0],
                )
        if tail:
            dense, cats, labels = parse_ctr_buffer(
                tail + b"\n", num_dense, num_sparse, vocab_sizes, zero_dense
            )
            pend.append((dense, cats, labels))
            pend_rows += len(labels)
    while pend_rows > 0:
        take = min(batch_size, pend_rows)
        parts_d, parts_c, parts_l = [], [], []
        need = take
        while need > 0:
            d, c, l = pend[0]
            if len(l) <= need:
                parts_d.append(d); parts_c.append(c); parts_l.append(l)
                need -= len(l)
                pend.pop(0)
            else:
                parts_d.append(d[:need]); parts_c.append(c[:need]); parts_l.append(l[:need])
                pend[0] = (d[need:], c[need:], l[need:])
                need = 0
        pend_rows -= take
        yield (
            np.concatenate(parts_d) if len(parts_d) > 1 else parts_d[0],
            np.concatenate(parts_c) if len(parts_c) > 1 else parts_c[0],
            np.concatenate(parts_l) if len(parts_l) > 1 else parts_l[0],
        )
