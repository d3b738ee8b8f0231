"""ctypes bindings for the native C++ weight-gen / CSV engine.

The shared library is built from native/aainterp_native.cpp (``make -C
native``); if it is missing we try to build it once with the local
toolchain, and otherwise fall back to the pure-numpy paths — the native
engine is a host-side accelerator (multithreaded weight generation for very
large grids, ~10-50x over vectorised numpy) and an independent third
implementation for cross-checks, not a correctness dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "_aainterp_native.so")
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_lib = None
_load_failed = False


def _try_build() -> bool:
    makefile = os.path.join(_NATIVE_DIR, "Makefile")
    if not os.path.exists(makefile):
        return False
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _try_build():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _load_failed = True
        return None
    try:
        _bind(lib)
    except AttributeError:
        # stale .so from an earlier round missing newer symbols (the
        # library is a gitignored build artifact): rebuild once and retry;
        # on any failure fall back to the pure-numpy paths as promised.
        # dlclose first — dlopen caches by path, so reloading the rebuilt
        # file needs the stale image evicted.
        try:
            import _ctypes

            _ctypes.dlclose(lib._handle)
        except Exception:
            pass
        try:
            os.remove(_LIB_PATH)
        except OSError:
            pass
        if not _try_build():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            _bind(lib)
        except (OSError, AttributeError):
            _load_failed = True
            return None
    _lib = lib
    return _lib


def _bind(lib) -> None:
    c_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    c_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.aai_ell_weights.argtypes = (
        [ctypes.c_int] * 5
        + [ctypes.c_double] * 10
        + [ctypes.c_int] * 3
        + [c_i32p, c_f64p, c_f64p]
    )
    lib.aai_ell_weights.restype = None
    c_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.aai_compat_cell_areas.argtypes = [
        ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        c_f64p, c_f64p, c_i64p, c_i64p, ctypes.c_int, c_f64p,
    ]
    lib.aai_compat_cell_areas.restype = None
    lib.aai_csv_read.argtypes = [
        ctypes.c_char_p, c_f64p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.aai_csv_read.restype = ctypes.c_int
    lib.aai_csv_write.argtypes = [
        ctypes.c_char_p, c_f64p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.aai_csv_write.restype = ctypes.c_int


def available() -> bool:
    return get_lib() is not None


def ell_weights_native(spec, mode: str = "exact", normalise: bool = True,
                       n_threads: int = 0):
    """Native multithreaded counterpart of ops.weights.ell_weights (full
    grid).  Returns (base (Hd,Wd,2) i32, w (Hd,Wd,K,K) f64, sums (Hd,Wd))."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    Hd, Wd = spec.dst_shape
    K = spec.window_cells
    qH, qW = spec.qrot_shape
    p00, ex, ey = spec.linear_map
    base = np.empty((Hd, Wd, 2), dtype=np.int32)
    w = np.empty((Hd, Wd, K, K), dtype=np.float64)
    sums = np.empty((Hd, Wd), dtype=np.float64)
    lib.aai_ell_weights(
        Hd, Wd, K, qH, qW,
        p00[0], p00[1], ex[0], ex[1], ey[0], ey[1],
        spec.dst_side, spec.cos, spec.sin, float(spec.scale),
        0 if mode == "exact" else 1,
        1 if normalise else 0,
        int(n_threads),
        base, w, sums,
    )
    return base, w, sums


def compat_cell_areas_native(qvx, qvy, mx0, my0, Km: int, modH: int,
                             modW: int, n_threads: int = 0) -> np.ndarray:
    """Native counterpart of the compat per-cell state machine.

    qvx/qvy: (..., 4) reference-constructed dst quad corners; mx0/my0:
    (...,) clamped mod-window bases.  Returns areas (..., Km, Km), zero
    outside [0, modW-1] x [0, modH-1].  Bit-exact vs ops/compat.py
    (tests/test_native.py) — the C++ build disables fp contraction.
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    shape = np.asarray(mx0).shape
    n_pix = int(np.prod(shape)) if shape else 1
    qvx = np.ascontiguousarray(np.asarray(qvx, np.float64).reshape(n_pix, 4))
    qvy = np.ascontiguousarray(np.asarray(qvy, np.float64).reshape(n_pix, 4))
    mx0 = np.ascontiguousarray(np.asarray(mx0, np.int64).reshape(n_pix))
    my0 = np.ascontiguousarray(np.asarray(my0, np.int64).reshape(n_pix))
    areas = np.empty((n_pix, Km, Km), dtype=np.float64)
    lib.aai_compat_cell_areas(n_pix, Km, modH, modW, qvx, qvy, mx0, my0,
                              int(n_threads), areas)
    return areas.reshape(shape + (Km, Km))


def csv_read_native(path: str, cap_rows: int = 32768,
                    cap_cols: int = 32768) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    # probe with a small buffer first to learn the size cheaply? single-shot
    # with the caller's capacity; resize loop on overflow.
    buf = np.zeros((cap_rows, min(cap_cols, 4096)), dtype=np.float64)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.aai_csv_read(path.encode(), buf, buf.shape[0], buf.shape[1],
                          ctypes.byref(h), ctypes.byref(w))
    if rc == 1:  # buffer too small: retry exact-size
        buf = np.zeros((h.value, w.value), dtype=np.float64)
        rc = lib.aai_csv_read(path.encode(), buf, h.value, w.value,
                              ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise IOError(f"aai_csv_read failed rc={rc} for {path}")
    return np.ascontiguousarray(buf[: h.value, : w.value])


def csv_write_native(path: str, data: np.ndarray, sig_digits: int = 0) -> None:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    arr = np.ascontiguousarray(np.asarray(data, dtype=np.float64))
    rc = lib.aai_csv_write(path.encode(), arr, arr.shape[0], arr.shape[1],
                           int(sig_digits))
    if rc != 0:
        raise IOError(f"aai_csv_write failed rc={rc} for {path}")
