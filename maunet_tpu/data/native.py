"""ctypes bindings for the native C++ .npz decoder (native/npz_loader.cpp).

The shared library is built on first use with g++ (pybind11 is unavailable
in this image; the C ABI + ctypes keeps the binding dependency-free).  All
entry points degrade gracefully: ``available()`` is False when no compiler
or zlib is present, and callers fall back to numpy's zipfile path.

The batch API decodes many .npz files on a C++ thread pool with the GIL
released — the host-side input pipeline's answer to the reference's
single-threaded loader (src/dataset.py:54).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from maunet_tpu.utils.logging import get_logger

log = get_logger(__name__)

_LIB_PATH = os.path.join(os.path.dirname(__file__), "_npz_native.so")
_SRC_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                         "npz_loader.cpp")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    src = os.path.abspath(_SRC_PATH)
    if not os.path.exists(src):
        return False
    cmd = ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-o", _LIB_PATH,
           src, "-lz", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        log.warning(f"native npz loader build failed: {e}")
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            log.warning(f"native npz loader load failed: {e}")
            return None
        lib.npz_open.restype = ctypes.c_void_p
        lib.npz_open.argtypes = [ctypes.c_char_p]
        lib.npz_close.argtypes = [ctypes.c_void_p]
        lib.npz_last_error.restype = ctypes.c_char_p
        lib.npz_num_entries.argtypes = [ctypes.c_void_p]
        lib.npz_entry_name.restype = ctypes.c_char_p
        lib.npz_entry_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.npz_entry_info.restype = ctypes.c_longlong
        lib.npz_entry_info.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_longlong), ctypes.POINTER(ctypes.c_int)]
        lib.npz_read.restype = ctypes.c_int
        lib.npz_read.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                 ctypes.c_void_p, ctypes.c_longlong]
        lib.npz_read_batch.restype = ctypes.c_int
        lib.npz_read_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_longlong), ctypes.c_int, ctypes.c_int]
        lib.npz_entry_usize.restype = ctypes.c_longlong
        lib.npz_entry_usize.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.npz_read_full.restype = ctypes.c_longlong
        lib.npz_read_full.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_longlong), ctypes.POINTER(ctypes.c_int),
            ctypes.c_void_p, ctypes.c_longlong]
        _lib = lib
        log.info("native npz loader ready")
        return _lib


def available() -> bool:
    return _load() is not None


def load_npz(path: str, names: list[str] | None = None) -> dict[str, np.ndarray]:
    """Decode one .npz file natively → {name: array}."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native npz loader unavailable")
    handle = lib.npz_open(path.encode())
    if not handle:
        raise IOError(f"npz_open({path}): {lib.npz_last_error().decode()}")
    try:
        if names is None:
            names = [lib.npz_entry_name(handle, i).decode().removesuffix(".npy")
                     for i in range(lib.npz_num_entries(handle))]
        out = {}
        for name in names:
            cap = lib.npz_entry_usize(handle, name.encode())
            if cap < 0:
                raise IOError(f"{path}:{name}: {lib.npz_last_error().decode()}")
            buf = np.empty(cap, np.uint8)
            dtype_buf = ctypes.create_string_buffer(16)
            shape_buf = (ctypes.c_longlong * 8)()
            ndim = ctypes.c_int()
            # single-pass: one inflate per entry (metadata + payload together)
            nbytes = lib.npz_read_full(
                handle, name.encode(), dtype_buf, shape_buf,
                ctypes.byref(ndim), buf.ctypes.data_as(ctypes.c_void_p),
                ctypes.c_longlong(cap))
            if nbytes < 0:
                raise IOError(f"{path}:{name}: {lib.npz_last_error().decode()}")
            shape = tuple(shape_buf[i] for i in range(ndim.value))
            dtype = np.dtype(dtype_buf.value.decode())
            out[name] = buf[:nbytes].view(dtype).reshape(shape)
        return out
    finally:
        lib.npz_close(handle)


def load_batch(paths: list[str], name: str, shape: tuple[int, ...],
               dtype=np.float32, threads: int | None = None) -> np.ndarray:
    """Decode entry ``name`` (common fixed shape) from many files on a C++
    thread pool → (len(paths), *shape) array."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native npz loader unavailable")
    n = len(paths)
    out = np.empty((n, *shape), dtype=dtype)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_outs = (ctypes.c_void_p * n)(
        *[out[i].ctypes.data for i in range(n)])
    per = int(np.prod(shape)) * out.itemsize
    c_sizes = (ctypes.c_longlong * n)(*([per] * n))
    threads = threads or min(os.cpu_count() or 4, n)
    failures = lib.npz_read_batch(c_paths, name.encode(), c_outs, c_sizes,
                                  n, threads)
    if failures:
        raise IOError(f"native batch decode: {failures}/{n} files failed "
                      f"({lib.npz_last_error().decode()})")
    return out
