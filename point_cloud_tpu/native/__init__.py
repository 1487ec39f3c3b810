"""ctypes binding for the native C++ runtime (native/pc_native.cpp).

The library builds on demand with g++ (cached by source mtime); if no
toolchain is available everything degrades to a pure-Python thread pool so
the framework stays importable anywhere.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path

log = logging.getLogger(__name__)

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "pc_native.cpp"
_BUILD_DIR = Path(__file__).resolve().parent / "_build"
_LIB = _BUILD_DIR / "libpcnative.so"

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    _BUILD_DIR.mkdir(exist_ok=True)
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
        str(_SRC), "-o", str(_LIB),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as err:
        log.warning("native build failed, using Python fallback: %s", err)
        return False


def load_native():
    """The loaded CDLL, or None if unavailable."""
    global _lib, _build_failed
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not _SRC.exists():
            _build_failed = True
            return None
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(str(_LIB))
        lib.pc_pool_create.restype = ctypes.c_void_p
        lib.pc_pool_create.argtypes = [ctypes.c_int]
        lib.pc_pool_submit_write.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64,
        ]
        lib.pc_pool_pending.restype = ctypes.c_int64
        lib.pc_pool_pending.argtypes = [ctypes.c_void_p]
        lib.pc_pool_error_count.restype = ctypes.c_int64
        lib.pc_pool_error_count.argtypes = [ctypes.c_void_p]
        lib.pc_pool_flush.argtypes = [ctypes.c_void_p]
        lib.pc_pool_destroy.argtypes = [ctypes.c_void_p]
        lib.pc_read_file.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.pc_read_file.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ]
        lib.pc_free.argtypes = [ctypes.c_void_p]
        lib.pc_hex_keys.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ]
        lib.pc_staging_sort.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.pc_lsm_probe.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def _ptr(arr):
    import numpy as np

    return arr.ctypes.data_as(ctypes.c_void_p)


def hex_keys_native(positions, cell_size, sub_cell_radius, next_cell_size,
                    n_threads: int = 8):
    """C++ hex quantization pass; returns (cell_idx, sub_idx, dist,
    next_idx) bit-identical to the NumPy path, or None if unavailable."""
    lib = load_native()
    if lib is None:
        return None
    import numpy as np

    positions = np.ascontiguousarray(positions, np.float32)
    n = len(positions)
    cell_idx = np.empty((n, 3), np.int32)
    sub_idx = np.empty((n, 3), np.int32)
    dist = np.empty(n, np.float32)
    next_idx = np.empty((n, 3), np.int32)
    lib.pc_hex_keys(
        _ptr(positions), n, ctypes.c_float(cell_size),
        ctypes.c_float(sub_cell_radius), ctypes.c_float(next_cell_size),
        _ptr(cell_idx), _ptr(sub_idx), _ptr(dist), _ptr(next_idx), n_threads,
    )
    return cell_idx, sub_idx, dist, next_idx


def lsm_probe_native(seg_keys, seg_valid, seg_dist, seg_offsets, queries,
                     n_threads: int = 8):
    """C++ multi-segment incumbent probe (core/cell.py merge_winners);
    returns (inc_dist, inc_seg, inc_loc) or None if unavailable."""
    lib = load_native()
    if lib is None:
        return None
    import numpy as np

    n = len(queries)
    seg_keys = np.ascontiguousarray(seg_keys, np.int64)
    seg_valid = np.ascontiguousarray(seg_valid, np.uint8)
    seg_dist = np.ascontiguousarray(seg_dist, np.float32)
    seg_offsets = np.ascontiguousarray(seg_offsets, np.int64)
    queries = np.ascontiguousarray(queries, np.int64)
    inc_dist = np.empty(n, np.float32)
    inc_seg = np.empty(n, np.int32)
    inc_loc = np.empty(n, np.int64)
    lib.pc_lsm_probe(
        _ptr(seg_keys), _ptr(seg_valid), _ptr(seg_dist), _ptr(seg_offsets),
        len(seg_offsets) - 1, _ptr(queries), n,
        _ptr(inc_dist), _ptr(inc_seg), _ptr(inc_loc), n_threads,
    )
    return inc_dist, inc_seg, inc_loc


def staging_sort_native(cell_key, next_key, pos_bits, color_key):
    """C++ comparison sort of the overflow-staging order; None if
    unavailable."""
    lib = load_native()
    if lib is None:
        return None
    import numpy as np

    n = len(cell_key)
    cell_key = np.ascontiguousarray(cell_key, np.int64)
    next_key = np.ascontiguousarray(next_key, np.int64)
    pos_bits = np.ascontiguousarray(pos_bits, np.int32)
    color_key = np.ascontiguousarray(color_key, np.uint32)
    order = np.empty(n, np.int64)
    lib.pc_staging_sort(
        _ptr(cell_key), _ptr(next_key), _ptr(pos_bits), _ptr(color_key),
        n, _ptr(order),
    )
    return order


class AsyncStoreWriter:
    """Fire-and-forget store writes on native worker threads.

    Writes are atomic (tmp + rename) so a crash never leaves a truncated
    cell; ``flush()`` is the write barrier the converter calls before
    reading a cell back or finishing. Falls back to a Python thread pool
    when the native library is unavailable.
    """

    def __init__(self, n_threads: int = 4):
        self._lib = load_native()
        self._errors_base = 0
        if self._lib is not None:
            self._pool = self._lib.pc_pool_create(n_threads)
            self._executor = None
        else:
            import concurrent.futures

            self._pool = None
            self._executor = concurrent.futures.ThreadPoolExecutor(n_threads)
            self._futures = []
            self._py_errors = 0

    @property
    def native(self) -> bool:
        return self._pool is not None

    def submit(self, path, data: bytes) -> None:
        if self._pool is not None:
            self._lib.pc_pool_submit_write(
                self._pool, str(path).encode(), data, len(data)
            )
        else:
            def write(p=str(path), d=data):
                tmp = p + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(d)
                os.replace(tmp, p)

            self._futures.append(self._executor.submit(write))

    def pending(self) -> int:
        if self._pool is not None:
            return int(self._lib.pc_pool_pending(self._pool))
        return sum(1 for f in self._futures if not f.done())

    def flush(self) -> int:
        """Block until all queued writes finish; returns error count."""
        if self._pool is not None:
            self._lib.pc_pool_flush(self._pool)
            return int(self._lib.pc_pool_error_count(self._pool))
        errors = 0
        for f in self._futures:
            try:
                f.result()
            except OSError:
                errors += 1
        self._futures.clear()
        self._py_errors += errors
        return self._py_errors

    def close(self) -> None:
        if self._pool is not None:
            self._lib.pc_pool_destroy(self._pool)
            self._pool = None
        elif self._executor is not None:
            self.flush()
            self._executor.shutdown()
            self._executor = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def read_file_native(path) -> bytes | None:
    """Read a whole file through the native helper (None on failure)."""
    lib = load_native()
    if lib is None:
        return None
    length = ctypes.c_int64()
    buf = lib.pc_read_file(str(path).encode(), ctypes.byref(length))
    if not buf or length.value < 0:
        return None
    try:
        return ctypes.string_at(buf, length.value)
    finally:
        lib.pc_free(buf)
