"""ctypes loader for the native event assembler (ops/native/assemble.cpp).

Built on demand with g++ into the shared native cache dir (same scheme
as codec/compressed._build_library). Callers fall back to the numpy
path when the toolchain is unavailable or ADDER_TPU_NATIVE_ASSEMBLE=0.
"""

from __future__ import annotations

import ctypes
import threading
from typing import Optional, Tuple

import numpy as np

from .native_build import load as _load_native

_lib = None
_lib_ready = False
_lib_lock = threading.Lock()


def _get_lib():
    global _lib, _lib_ready
    if _lib_ready:
        return _lib
    with _lib_lock:
        if _lib_ready:
            return _lib
        lib = _load_native("assemble", "ADDER_TPU_NATIVE_ASSEMBLE")
        if lib is not None:
            u8p = ctypes.POINTER(ctypes.c_uint8)
            u32p = ctypes.POINTER(ctypes.c_uint32)
            i32p = ctypes.POINTER(ctypes.c_int32)
            lib.adder_assemble_events.restype = ctypes.c_long
            lib.adder_assemble_events.argtypes = [
                u32p, u32p, u8p, u8p, ctypes.c_long,
                i32p, ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ]
        _lib = lib
        _lib_ready = True
        return _lib


def assemble_native(
    pixd: np.ndarray, t: Optional[np.ndarray], counts: np.ndarray
) -> Optional[Tuple[np.ndarray, Optional[np.ndarray]]]:
    """Native segment-memcpy assembly. Returns None when the native lib
    is unavailable or the dtypes fall outside the fast path (callers then
    use the numpy reference implementation)."""
    lib = _get_lib()
    if lib is None:
        return None
    pixd = np.ascontiguousarray(pixd)
    if pixd.dtype != np.uint32:
        return None
    counts = np.ascontiguousarray(counts, dtype=np.int32)
    if counts.ndim != 2:
        return None
    total = int(pixd.shape[0])
    out_p = np.empty_like(pixd)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    if t is not None:
        t = np.ascontiguousarray(t)
        if t.dtype.itemsize not in (4, 8) or t.shape[0] != total:
            return None
        out_t = np.empty_like(t)
        t_ptr = t.ctypes.data_as(u8p)
        out_t_ptr = out_t.ctypes.data_as(u8p)
        t_elem = t.dtype.itemsize
    else:
        out_t = None
        t_ptr = ctypes.cast(None, u8p)
        out_t_ptr = ctypes.cast(None, u8p)
        t_elem = 0
    rc = lib.adder_assemble_events(
        pixd.ctypes.data_as(u32p), out_p.ctypes.data_as(u32p),
        t_ptr, out_t_ptr, ctypes.c_long(t_elem),
        counts.ctypes.data_as(i32p),
        ctypes.c_long(counts.shape[0]), ctypes.c_long(counts.shape[1]),
        ctypes.c_long(total),
    )
    if rc < 0:
        raise ValueError(
            "adder_assemble_events: inconsistent counts (sum != len(pixd))"
        )
    return out_p, out_t
