"""Native (C++) graph-packing core with compile-on-first-use + ctypes.

Loads ``graphcore.so`` next to this module, compiling it from
``graphcore.cpp`` with g++ if missing.  All entry points fall back to the
numpy implementations when the toolchain or binary is unavailable, and the
``GNN_RECSYS_TPU_NATIVE=0`` environment variable disables the native path
entirely (useful for A/B semantics testing).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "graphcore.cpp")
_SO = os.path.join(_DIR, "graphcore.so")

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("GNN_RECSYS_TPU_NATIVE", "1") == "0":
        return None
    if not os.path.exists(_SO) or (
        os.path.exists(_SRC)
        and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
    ):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except (OSError, subprocess.SubprocessError):
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.csc_pack.argtypes = [
        i32p, i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        i32p, i32p, u8p, i32p,
    ]
    lib.csc_pack.restype = None
    lib.csc_max_degree.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64]
    lib.csc_max_degree.restype = ctypes.c_int32
    u32 = ctypes.c_uint32
    lib.cuckoo_build.argtypes = [
        i32p, i32p, ctypes.c_int64, ctypes.c_int64,
        u32, u32, u32, u32, i32p, i32p,
    ]
    lib.cuckoo_build.restype = ctypes.c_int64
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def csc_pack(
    src: np.ndarray, dst: np.ndarray, num_dst: int, k: int
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """Native COO -> padded CSC pack; None if the native lib is unavailable.

    Returns (nbr, nbr_eid, nbr_mask, deg) with the exact semantics of
    ``gnn_recsys_tpu.graph.hetero.coo_to_padded_csc`` for the given k.
    """
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, dtype=np.int32)
    dst = np.ascontiguousarray(dst, dtype=np.int32)
    # The C++ packer indexes its output rows by dst unchecked — validate
    # here so a bad id raises instead of segfaulting the process.
    if dst.size and (dst.min() < 0 or dst.max() >= num_dst):
        raise ValueError(
            f"dst ids out of range [0, {num_dst}): "
            f"min={dst.min()}, max={dst.max()}"
        )
    e = src.shape[0]
    nbr = np.empty((num_dst, k), dtype=np.int32)
    nbr_eid = np.empty((num_dst, k), dtype=np.int32)
    nbr_mask = np.empty((num_dst, k), dtype=np.uint8)
    deg = np.empty((num_dst,), dtype=np.int32)
    lib.csc_pack(
        _ptr(src, ctypes.c_int32),
        _ptr(dst, ctypes.c_int32),
        ctypes.c_int64(e),
        ctypes.c_int64(num_dst),
        ctypes.c_int64(k),
        _ptr(nbr, ctypes.c_int32),
        _ptr(nbr_eid, ctypes.c_int32),
        _ptr(nbr_mask, ctypes.c_uint8),
        _ptr(deg, ctypes.c_int32),
    )
    return nbr, nbr_eid, nbr_mask.astype(bool), deg


def cuckoo_build(
    src: np.ndarray,
    dst: np.ndarray,
    capacity: int,
    mix_a1: int,
    mix_b1: int,
    mix_a2: int,
    mix_b2: int,
) -> Optional[Tuple[np.ndarray, np.ndarray, int]]:
    """Native cuckoo insert of (src, dst) pairs into two [capacity] tables.

    Returns ``(slot_u, slot_v, n_inserted)`` with shapes ``[2, capacity]``,
    ``n_inserted`` the distinct-pair count (duplicates skipped in-stream),
    or None when the native lib is unavailable OR an insertion chain
    exceeded the kick budget (caller re-seeds/grows, matching the numpy
    builder's protocol in :mod:`gnn_recsys_tpu.ops.edge_hash`).
    """
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, dtype=np.int32)
    dst = np.ascontiguousarray(dst, dtype=np.int32)
    slot_u = np.empty((2, capacity), dtype=np.int32)
    slot_v = np.empty((2, capacity), dtype=np.int32)
    n = lib.cuckoo_build(
        _ptr(src, ctypes.c_int32),
        _ptr(dst, ctypes.c_int32),
        ctypes.c_int64(src.shape[0]),
        ctypes.c_int64(capacity),
        ctypes.c_uint32(mix_a1),
        ctypes.c_uint32(mix_b1),
        ctypes.c_uint32(mix_a2),
        ctypes.c_uint32(mix_b2),
        _ptr(slot_u, ctypes.c_int32),
        _ptr(slot_v, ctypes.c_int32),
    )
    if n < 0:
        return None
    return slot_u, slot_v, int(n)


def csc_max_degree(dst: np.ndarray, num_dst: int) -> Optional[int]:
    lib = _load()
    if lib is None:
        return None
    dst = np.ascontiguousarray(dst, dtype=np.int32)
    return int(
        lib.csc_max_degree(
            _ptr(dst, ctypes.c_int32),
            ctypes.c_int64(dst.shape[0]),
            ctypes.c_int64(num_dst),
        )
    )
