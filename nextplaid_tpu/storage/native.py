"""ctypes bindings to the native host runtime (native/nextplaid_host.cpp).

The C++ library accelerates the IO-bound host path (chunk merge into
device-upload buffers, residual pack/unpack, bucketize, f16 widening); every
entry point has a pure-numpy fallback so the package works without the .so.
Build with `make -C native` (done automatically on first use if g++ exists).
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libnextplaid_host.so"
_lib = None
_lib_lock = threading.Lock()
_build_attempted = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not _LIB_PATH.exists() and not _build_attempted:
            _build_attempted = True
            try:
                subprocess.run(
                    ["make", "-C", str(_NATIVE_DIR)],
                    capture_output=True,
                    timeout=120,
                    check=True,
                )
            except (OSError, subprocess.SubprocessError):
                return None
        if not _LIB_PATH.exists():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None
        lib.np_chunks_total_bytes.restype = ctypes.c_int64
        lib.np_merge_chunks_into.restype = ctypes.c_int64
        lib.np_pack_residuals.restype = ctypes.c_int
        lib.np_unpack_residuals.restype = ctypes.c_int
        lib.np_bucketize.restype = ctypes.c_int
        lib.np_f16_to_f32.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _paths_array(paths: Sequence[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [str(p).encode() for p in paths]
    return arr


def merge_chunk_payloads(
    paths: Sequence[str], dtype: np.dtype, trailing: Tuple[int, ...] = ()
) -> Optional[np.ndarray]:
    """Concatenate the payloads of same-dtype NPY chunk files into one array
    via the native mmap+memcpy pass; None if the library is unavailable."""
    lib = _load()
    if lib is None or not paths:
        return None
    arr = _paths_array(paths)
    rows = ctypes.c_int64(0)
    total = lib.np_chunks_total_bytes(arr, len(paths), ctypes.byref(rows))
    if total < 0:
        return None
    itemsize = np.dtype(dtype).itemsize * int(np.prod(trailing or (1,)))
    out = np.empty(total // np.dtype(dtype).itemsize, dtype=dtype)
    got = lib.np_merge_chunks_into(
        arr, len(paths), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(out.nbytes),
    )
    if got < 0:
        return None
    n_rows = int(rows.value)
    if trailing:
        return out.reshape(n_rows, *trailing)
    del itemsize
    return out


def pack_residuals(buckets: np.ndarray, nbits: int) -> np.ndarray:
    """[n, dim] int32 buckets -> [n, dim*nbits/8] u8 (native or numpy)."""
    buckets = np.ascontiguousarray(buckets, np.int32)
    n, dim = buckets.shape
    out = np.empty((n, dim * nbits // 8), np.uint8)
    lib = _load()
    if lib is not None:
        rc = lib.np_pack_residuals(
            buckets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int64(n), ctypes.c_int64(dim), ctypes.c_int(nbits),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if rc == 0:
            return out
    # numpy fallback (same layout as ops/codec.py pack_buckets)
    vpb = 8 // nbits
    rev = _bit_reverse_table(nbits)
    rv = rev[buckets].astype(np.uint8).reshape(n, dim // vpb, vpb)
    shifts = np.array([8 - nbits * (k + 1) for k in range(vpb)], np.uint8)
    return np.bitwise_or.reduce(rv << shifts, axis=-1).astype(np.uint8)


def unpack_residuals(packed: np.ndarray, nbits: int) -> np.ndarray:
    """[n, dim*nbits/8] u8 -> [n, dim] int32."""
    packed = np.ascontiguousarray(packed, np.uint8)
    n, packed_dim = packed.shape
    vpb = 8 // nbits
    dim = packed_dim * vpb
    out = np.empty((n, dim), np.int32)
    lib = _load()
    if lib is not None:
        rc = lib.np_unpack_residuals(
            packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(n), ctypes.c_int64(dim), ctypes.c_int(nbits),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc == 0:
            return out
    mask = (1 << nbits) - 1
    rev = _bit_reverse_table(nbits).astype(np.int32)
    shifts = np.array([8 - nbits * (k + 1) for k in range(vpb)], np.uint8)
    segs = (packed[..., None] >> shifts) & mask
    return rev[segs].reshape(n, dim)


def bucketize(values: np.ndarray, cutoffs: np.ndarray) -> np.ndarray:
    values = np.ascontiguousarray(values, np.float32)
    cutoffs = np.ascontiguousarray(cutoffs, np.float32)
    lib = _load()
    if lib is not None:
        out = np.empty(values.size, np.int32)
        rc = lib.np_bucketize(
            values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(values.size),
            cutoffs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int(cutoffs.size),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc == 0:
            return out.reshape(values.shape)
    return np.searchsorted(cutoffs, values, side="left").astype(np.int32)


def f16_to_f32(arr: np.ndarray) -> np.ndarray:
    arr = np.ascontiguousarray(arr)
    lib = _load()
    if lib is not None and arr.dtype == np.float16:
        out = np.empty(arr.size, np.float32)
        rc = lib.np_f16_to_f32(
            arr.view(np.uint16).ctypes.data_as(
                ctypes.POINTER(ctypes.c_uint16)
            ),
            ctypes.c_int64(arr.size),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc == 0:
            return out.reshape(arr.shape)
    return arr.astype(np.float32)


def _bit_reverse_table(nbits: int) -> np.ndarray:
    size = 1 << nbits
    table = np.zeros(size, np.uint8)
    for v in range(size):
        r = 0
        for b in range(nbits):
            if v & (1 << b):
                r |= 1 << (nbits - 1 - b)
        table[v] = r
    return table
