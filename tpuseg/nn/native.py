"""ctypes loader for the native C++ library (``native/*.cpp``).

Builds on demand when a toolchain is available; every caller has a pure
python/jnp fallback, so absence of the library is never fatal.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_NATIVE_DIR = os.path.join(_HERE, os.pardir, os.pardir, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtpuseg_native.so")

_lib = None
_load_attempted = False

_i64 = ctypes.c_int64
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")


def load(build_if_missing: bool = True):
    """Returns the ctypes library or None."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if not os.path.isfile(_LIB_PATH) and build_if_missing:
        try:
            import importlib.util

            spec = importlib.util.spec_from_file_location(
                "tpuseg_native_build", os.path.join(_NATIVE_DIR, "build.py")
            )
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            mod.build(verbose=False)
        except Exception:
            return None
    if not os.path.isfile(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.tpuseg_sru_forward.argtypes = [
            _f32p, _f32p, _f32p, _f32p, ctypes.c_void_p, ctypes.c_void_p,
            _i64, _i64, _i64, _i64, _i64, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, _f32p, _f32p,
        ]
        lib.tpuseg_sru_bi_forward.argtypes = lib.tpuseg_sru_forward.argtypes
        lib.tpuseg_gather_blobs.argtypes = [
            ctypes.c_void_p, _i64p, _i64p, _i64p, _i64, _u8p, ctypes.c_int,
        ]
        lib.tpuseg_expand_instances.argtypes = [
            _u8p, _i64, _i64, _i64, _i64, _f32p,
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def sru_forward_cpu(
    u: np.ndarray, x: np.ndarray, weight_c: np.ndarray, bias: np.ndarray,
    c0: Optional[np.ndarray], d: int, activation: int = 0,
    has_skip_term: bool = True, scale_x: float = 1.0,
    bidirectional: bool = False, mask_pad: Optional[np.ndarray] = None,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """C++ SRU inference forward. Returns None when the lib is unavailable.

    u: (L, B, bidir*d*k); x: (L, B, n_in).
    """
    lib = load()
    if lib is None:
        return None
    bidir = 2 if bidirectional else 1
    length, batch = u.shape[0], u.shape[1]
    k = u.shape[-1] // d // bidir
    n_in = x.shape[-1]
    u = np.ascontiguousarray(u, np.float32)
    x = np.ascontiguousarray(x, np.float32)
    weight_c = np.ascontiguousarray(weight_c, np.float32)
    bias = np.ascontiguousarray(bias, np.float32)
    h = np.empty((length, batch, bidir * d), np.float32)
    cf = np.empty((batch, bidir * d), np.float32)
    c0p = (
        None
        if c0 is None
        else np.ascontiguousarray(c0, np.float32).ctypes.data_as(ctypes.c_void_p)
    )
    mpp = (
        None
        if mask_pad is None
        else np.ascontiguousarray(mask_pad, np.float32).ctypes.data_as(
            ctypes.c_void_p
        )
    )
    fn = lib.tpuseg_sru_bi_forward if bidirectional else lib.tpuseg_sru_forward
    fn(
        u, x, weight_c, bias, c0p, mpp, length, batch, d, k, n_in,
        activation, int(has_skip_term), float(scale_x), h, cf,
    )
    return h, cf


def gather_blobs(
    base: memoryview | bytes,
    offsets: np.ndarray,
    lengths: np.ndarray,
    n_threads: int = 4,
) -> Optional[np.ndarray]:
    """Gather blobs into one contiguous uint8 buffer (returns None if the
    native lib is unavailable)."""
    lib = load()
    if lib is None:
        return None
    offsets = np.ascontiguousarray(offsets, np.int64)
    lengths = np.ascontiguousarray(lengths, np.int64)
    out_offsets = np.zeros_like(offsets)
    np.cumsum(lengths[:-1], out=out_offsets[1:])
    total = int(lengths.sum())
    out = np.empty(total, np.uint8)
    buf = (ctypes.c_char * len(base)).from_buffer_copy(base)
    lib.tpuseg_gather_blobs(
        ctypes.cast(buf, ctypes.c_void_p), offsets, lengths, out_offsets,
        len(offsets), out, n_threads,
    )
    return out
