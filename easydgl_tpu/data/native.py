"""ctypes bindings for the native (C++) batch-assembly library.

The reference's input pipeline runs in TF's C++ tf.data runtime; this is the
TPU build's native equivalent (native/batcher.cpp): row gather, per-row
distinct mask sampling, and mark-table gather off the GIL. Falls back to
the NumPy implementations in data/masking.py when the library isn't built
(``make -C native``).
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native",
        "libeasydgl_data.so")


def load_library() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    i64, i32p, i64p, f32p, i8p, u64 = (
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int8), ctypes.c_uint64)
    lib.gather_rows_i32.argtypes = [i32p, i64p, i64, i64, i32p]
    lib.gather_rows_f32.argtypes = [f32p, i64p, i64, i64, f32p]
    lib.masked_batch.argtypes = [i32p, i64, i64, i64, ctypes.c_int32, i64,
                                 u64, u64, u64, i32p, i32p, i32p]
    lib.mark_gather.argtypes = [i8p, i64, i64, i32p, i64, f32p]
    lib.abi_version.restype = ctypes.c_int
    assert lib.abi_version() == 1
    _LIB = lib
    return lib


def available() -> bool:
    return load_library() is not None


def _p(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def gather_rows(src: np.ndarray, indices: np.ndarray) -> np.ndarray:
    lib = load_library()
    idx = np.ascontiguousarray(indices, np.int64)
    src = np.ascontiguousarray(src)
    out = np.empty((len(idx),) + src.shape[1:], src.dtype)
    flat = int(np.prod(src.shape[1:]))
    if src.dtype == np.int32:
        lib.gather_rows_i32(_p(src, ctypes.c_int32), _p(idx, ctypes.c_int64),
                            len(idx), flat, _p(out, ctypes.c_int32))
    elif src.dtype == np.float32:
        lib.gather_rows_f32(_p(src, ctypes.c_float), _p(idx, ctypes.c_int64),
                            len(idx), flat, _p(out, ctypes.c_float))
    else:
        return src[idx]
    return out


def masked_batch(tokens: np.ndarray, masklen: int, mask_id: int,
                 ignore_head: int, seed: int, epoch: int, batch_idx: int
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Native equivalent of masking.masked_protocol's train path."""
    lib = load_library()
    tokens = np.ascontiguousarray(tokens, np.int32)
    n, seqslen = tokens.shape
    masked = np.empty_like(tokens)
    positions = np.empty((n, masklen), np.int32)
    labels = np.empty((n, masklen), np.int32)
    lib.masked_batch(_p(tokens, ctypes.c_int32), n, seqslen, masklen,
                     mask_id, ignore_head, seed, epoch, batch_idx,
                     _p(masked, ctypes.c_int32),
                     _p(positions, ctypes.c_int32),
                     _p(labels, ctypes.c_int32))
    return masked, positions, labels


def mark_gather(table: np.ndarray, ids: np.ndarray) -> np.ndarray:
    lib = load_library()
    table = np.ascontiguousarray(table, np.int8)
    ids = np.ascontiguousarray(ids, np.int32)
    out = np.empty(ids.shape + (table.shape[1],), np.float32)
    lib.mark_gather(_p(table, ctypes.c_int8), table.shape[0],
                    table.shape[1], _p(ids, ctypes.c_int32),
                    int(ids.size), _p(out, ctypes.c_float))
    return out
