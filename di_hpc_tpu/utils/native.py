"""Lazy build/load of the native C++ host core (csrc/) via g++ + ctypes.

The reference ships its host control-plane code (bucketing DP, marshalling) as
compiled C++ inside CUDA extensions (src/rl_utils/padding.cu:8-108).  Here the
equivalent host core is a small C++ shared library compiled on first use and
loaded through ctypes; every entry point has a pure-Python fallback so the
framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent
_CSRC = _REPO_ROOT / "csrc"
_BUILD_DIR = _REPO_ROOT / "build"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    src = _CSRC / "bucketing.cpp"
    if not src.exists():
        return None
    _BUILD_DIR.mkdir(exist_ok=True)
    so = _BUILD_DIR / "libdihpc_host.so"
    if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
        cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
               str(src), "-o", str(so)]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    lib.oracle_split_group.restype = ctypes.c_int64
    lib.oracle_split_group.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.pack_padded_f32.restype = None
    lib.pack_padded_f32.argtypes = [
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    return lib


def get_native_lib() -> Optional[ctypes.CDLL]:
    """Returns the loaded host library, building it on first call; None if the
    toolchain is unavailable (callers fall back to Python)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if not _tried:
            _lib = _build_and_load()
            _tried = True
    return _lib


_ext = None
_ext_tried = False


def _build_and_import_ext():
    """Compile and import the CPython extension (csrc/hostcore.c).

    A C extension rather than ctypes because the pack's fixed cost is the
    per-array Python marshalling, not the copies: pushing the 64-array
    pointer walk into PySequence_Fast + PyObject_GetBuffer cuts ~65-165us of
    per-call overhead (measured r5), which is the whole budget at the 1D
    bench config.  Linked against nothing (buffer protocol only); symbols
    resolve from the host interpreter at import.
    """
    import importlib.machinery
    import importlib.util
    import sysconfig

    src = _CSRC / "hostcore.c"
    if not src.exists():
        return None
    _BUILD_DIR.mkdir(exist_ok=True)
    so = _BUILD_DIR / "_dihpc_hostcore.so"
    if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
        inc = sysconfig.get_paths()["include"]
        cmd = ["gcc", "-O2", "-shared", "-fPIC", f"-I{inc}",
               str(src), "-o", str(so)]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        loader = importlib.machinery.ExtensionFileLoader(
            "_dihpc_hostcore", str(so))
        spec = importlib.util.spec_from_loader("_dihpc_hostcore", loader)
        mod = importlib.util.module_from_spec(spec)
        loader.exec_module(mod)
        return mod
    except Exception:
        return None


def get_native_ext():
    """Returns the imported hostcore extension module, building on first
    call; None if the toolchain is unavailable (callers fall back)."""
    global _ext, _ext_tried
    if _ext is not None or _ext_tried:
        return _ext
    with _lock:
        if not _ext_tried:
            _ext = _build_and_import_ext()
            _ext_tried = True
    return _ext


def native_pack_padded_f32(srcs, max_shape, value: float = 0.0):
    """Native ragged pack of a list of float32 arrays (same ndim) into a
    padded batch + mask; returns (out, mask) float32 numpy arrays or None
    when no native path applies (callers then use the numpy oracle, which
    preserves non-f32 dtypes — this function must never silently convert).

    Prefers the zero-marshalling CPython extension (csrc/hostcore.c), which
    rejects non-f32/non-contiguous buffers itself; the ctypes fallback
    (csrc/bucketing.cpp) gets an explicit f32 dtype gate for the same
    reason."""
    import numpy as np

    ext = get_native_ext()
    if ext is not None and srcs:
        n = len(srcs)
        # np.empty, not np.full: the pack writes every element exactly once.
        out = np.empty((n, *max_shape), dtype=np.float32)
        mask = np.empty((n, *max_shape), dtype=np.float32)
        try:
            ext.pack_padded(srcs, out, mask, float(value))
            return out, mask
        except (AttributeError, ValueError, TypeError, BufferError):
            return None  # non-f32 / non-contiguous input: oracle's job

    lib = get_native_lib()
    if lib is None or not srcs:
        return None
    if any(np.asarray(a).dtype != np.float32 for a in srcs):
        return None  # ascontiguousarray below would silently convert
    ndim = srcs[0].ndim
    arrs = []
    for a in srcs:
        a = np.ascontiguousarray(a, dtype=np.float32)
        if a.ndim != ndim:
            return None
        arrs.append(a)
    n = len(arrs)
    # np.empty, not np.full: the C++ pack writes every element exactly once
    # (valid data + pad fill + mask), so a Python-side prefill would be a
    # wasted extra pass over both arrays (the r4 regression).
    out = np.empty((n, *max_shape), dtype=np.float32)
    mask = np.empty((n, *max_shape), dtype=np.float32)
    ptrs = (ctypes.POINTER(ctypes.c_float) * n)(
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for a in arrs])
    shapes = (ctypes.c_int64 * (n * ndim))(
        *[d for a in arrs for d in a.shape])
    maxs = (ctypes.c_int64 * ndim)(*max_shape)
    lib.pack_padded_f32(
        ptrs, shapes, n, ndim, maxs, ctypes.c_float(value),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out, mask


def native_oracle_split_group(numels, group: int):
    """C++ oracle bucketing DP; returns (positions list of len group+1, cost)
    or None if native lib is unavailable."""
    lib = get_native_lib()
    if lib is None:
        return None
    n = len(numels)
    arr = (ctypes.c_int64 * n)(*numels)
    out = (ctypes.c_int64 * (group + 1))()
    cost = lib.oracle_split_group(arr, n, group, out)
    if cost < 0:
        return None
    return list(out), int(cost)
