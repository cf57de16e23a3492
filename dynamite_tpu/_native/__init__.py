"""
ctypes bindings for the native host-side kernels (BFS subspace discovery,
batch combinatorial ranking). Builds the shared library on first import if
a compiler is available; every entry point has a pure-numpy fallback, so
the package works without the native build.
"""

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, 'libdnm_native.so')

_lib = None
_build_attempted = False


def _load():
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build_attempted:
        _build_attempted = True
        try:
            subprocess.run(['make', '-C', _HERE], check=True,
                           stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL, timeout=120)
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)

    lib.bfs_sector.restype = ctypes.c_int64
    lib.bfs_sector.argtypes = [i64p, i64p, ctypes.c_int64, i64p, f64p, f64p,
                               ctypes.c_int64, i64p, ctypes.c_int64]
    lib.spinconserve_s2i.restype = None
    lib.spinconserve_s2i.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64,
                                     ctypes.c_int64, i64p, ctypes.c_int64,
                                     i64p, i64p, i64p]
    lib.spinconserve_i2s.restype = None
    lib.spinconserve_i2s.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64,
                                     ctypes.c_int64, i64p, ctypes.c_int64,
                                     i64p, i64p, i64p, i64p, i64p,
                                     ctypes.c_int64, i64p]
    lib.parity_and.restype = None
    lib.parity_and.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64, u8p]

    _lib = lib
    return _lib


def available():
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def bfs_sector(group_masks, group_offsets, signs, coeffs, seed,
               capacity=None):
    """BFS over the operator hopping graph; returns states in discovery
    order, or None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None

    group_masks = np.ascontiguousarray(group_masks, dtype=np.int64)
    group_offsets = np.ascontiguousarray(group_offsets, dtype=np.int64)
    signs = np.ascontiguousarray(signs, dtype=np.int64)
    coeffs = np.ascontiguousarray(coeffs, dtype=np.complex128)
    cre = np.ascontiguousarray(coeffs.real)
    cim = np.ascontiguousarray(coeffs.imag)

    if capacity is None:
        capacity = 1 << 20
    while True:
        out = np.empty(capacity, dtype=np.int64)
        n = lib.bfs_sector(
            _ptr(group_masks, ctypes.c_int64),
            _ptr(group_offsets, ctypes.c_int64),
            len(group_masks),
            _ptr(signs, ctypes.c_int64),
            _ptr(cre, ctypes.c_double),
            _ptr(cim, ctypes.c_double),
            int(seed),
            _ptr(out, ctypes.c_int64),
            capacity)
        if n >= 0:
            return out[:n].copy()
        capacity *= 4


def spinconserve_s2i(states, L, k, nchoosek, La, off_tk, na_tk):
    """Batch sector-major rank (see ops/sectors.py for the layout)."""
    lib = _load()
    if lib is None:
        return None
    states = np.ascontiguousarray(states, dtype=np.int64)
    nchoosek = np.ascontiguousarray(nchoosek, dtype=np.int64)
    off_tk = np.ascontiguousarray(off_tk, dtype=np.int64)
    na_tk = np.ascontiguousarray(na_tk, dtype=np.int64)
    out = np.empty(len(states), dtype=np.int64)
    lib.spinconserve_s2i(_ptr(states, ctypes.c_int64), len(states),
                         int(L), int(k),
                         _ptr(nchoosek, ctypes.c_int64), int(La),
                         _ptr(off_tk, ctypes.c_int64),
                         _ptr(na_tk, ctypes.c_int64),
                         _ptr(out, ctypes.c_int64))
    return out


def parity_and(states, mask):
    """Batch parity(state & mask) on the host — the native sign-evaluation
    primitive (used by the numpy oracles for large batches); returns a
    uint8 array, or None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    states = np.ascontiguousarray(states, dtype=np.int64)
    out = np.empty(len(states), dtype=np.uint8)
    lib.parity_and(_ptr(states, ctypes.c_int64), len(states),
                   int(mask), _ptr(out, ctypes.c_uint8))
    return out


def spinconserve_i2s(idxs, L, k, nchoosek, La, sec_off, sec_t, sec_kr,
                     sec_ka, sec_na):
    """Batch sector-major unrank (see ops/sectors.py for the layout)."""
    lib = _load()
    if lib is None:
        return None
    idxs = np.ascontiguousarray(idxs, dtype=np.int64)
    nchoosek = np.ascontiguousarray(nchoosek, dtype=np.int64)
    sec_off = np.ascontiguousarray(sec_off, dtype=np.int64)
    sec_t = np.ascontiguousarray(sec_t, dtype=np.int64)
    sec_kr = np.ascontiguousarray(sec_kr, dtype=np.int64)
    sec_ka = np.ascontiguousarray(sec_ka, dtype=np.int64)
    sec_na = np.ascontiguousarray(sec_na, dtype=np.int64)
    out = np.empty(len(idxs), dtype=np.int64)
    lib.spinconserve_i2s(_ptr(idxs, ctypes.c_int64), len(idxs),
                         int(L), int(k),
                         _ptr(nchoosek, ctypes.c_int64), int(La),
                         _ptr(sec_off, ctypes.c_int64),
                         _ptr(sec_t, ctypes.c_int64),
                         _ptr(sec_kr, ctypes.c_int64),
                         _ptr(sec_ka, ctypes.c_int64),
                         _ptr(sec_na, ctypes.c_int64),
                         len(sec_off),
                         _ptr(out, ctypes.c_int64))
    return out
