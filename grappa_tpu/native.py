"""ctypes bindings for the native (C++) graph-preprocessing library.

Loads native/libgraph_preproc.so, building it with g++ on first use (cached
next to the source). Every entry point has a pure-Python fallback — the
native path is an accelerator for protein-sized molecules, not a dependency.
Set GRAPPA_TPU_NO_NATIVE=1 to force the Python implementations.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_SRC_DIR = Path(__file__).resolve().parent.parent / 'native'
_LIB_PATH = _SRC_DIR / 'libgraph_preproc.so'
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = _SRC_DIR / 'graph_preproc.cpp'
    if not src.exists():
        return False
    cmd = ['g++', '-O3', '-std=c++17', '-shared', '-fPIC', str(src),
           '-o', str(_LIB_PATH)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get('GRAPPA_TPU_NO_NATIVE') == '1':
        return None
    if not _LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None

    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)

    lib.enumerate_tuples.argtypes = [i32p, ctypes.c_int64, i64p, i64p,
                                     i32p, i32p]
    lib.enumerate_tuples.restype = None
    lib.neighbor_list.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64,
                                  ctypes.c_int64, i32p, u8p]
    lib.neighbor_list.restype = ctypes.c_int32
    lib.ring_encoding.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64, f32p]
    lib.ring_encoding.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _as_i32(arr, n_atoms: Optional[int] = None) -> np.ndarray:
    bonds = np.ascontiguousarray(
        np.asarray(arr, dtype=np.int32)).reshape(-1, 2)
    # the C++ side indexes vectors without bounds checks — malformed input
    # must raise here (matching the pure-python fallback's IndexError), not
    # corrupt the heap
    if bonds.size:
        if bonds.min() < 0:
            raise IndexError(f"negative bond index: {bonds.min()}")
        if n_atoms is not None and bonds.max() >= n_atoms:
            raise IndexError(
                f"bond index {bonds.max()} >= n_atoms ({n_atoms})")
    return bonds


def enumerate_tuples(bonds) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(angles (A,3), propers (P,4)) as int32 index arrays, or None if the
    native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    bonds = _as_i32(bonds)
    n_bonds = ctypes.c_int64(len(bonds))
    na, np_ = ctypes.c_int64(0), ctypes.c_int64(0)
    bptr = bonds.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    null = ctypes.cast(None, ctypes.POINTER(ctypes.c_int32))
    lib.enumerate_tuples(bptr, n_bonds, ctypes.byref(na), ctypes.byref(np_),
                         null, null)
    angles = np.zeros((na.value, 3), np.int32)
    propers = np.zeros((np_.value, 4), np.int32)
    lib.enumerate_tuples(
        bptr, n_bonds, ctypes.byref(na), ctypes.byref(np_),
        angles.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        propers.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return angles, propers


def neighbor_list(bonds, n_atoms: int, max_neighbors: int
                  ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = get_lib()
    if lib is None:
        return None
    bonds = _as_i32(bonds, n_atoms)
    neighbors = np.zeros((n_atoms, max_neighbors), np.int32)
    mask = np.zeros((n_atoms, max_neighbors), np.uint8)
    rc = lib.neighbor_list(
        bonds.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(len(bonds)), ctypes.c_int64(n_atoms),
        ctypes.c_int64(max_neighbors),
        neighbors.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise ValueError(
            f"atom degree exceeds MAX_NEIGHBORS={max_neighbors}")
    return neighbors, mask.astype(bool)


def ring_encoding(bonds, n_atoms: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    bonds = _as_i32(bonds, n_atoms)
    out = np.zeros((n_atoms, 7), np.float32)
    lib.ring_encoding(
        bonds.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(len(bonds)), ctypes.c_int64(n_atoms),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
